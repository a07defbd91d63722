"""Weight/checkpoint interop.

Two serialization surfaces, mirroring the reference's
(SURVEY.md section 5.4):

1. **bp5 CSV format** — the dependency-free deployment export the reference
   ships trained controllers in (CustomerLstmNN.save_model, :203-224; files
   lstm_w{x,h}{0,1}.csv, lstm_b{0,1}.csv, pi_{w,b}.csv). :func:`load_bp5_csv`
   loads them into :class:`~..models.lstm.PolicyParams` (the value tower is
   optional in that format and is zero-initialized when absent).

2. **native checkpoints** — full training state (params + optimizer state +
   PRNG key + step counter) via orbax, replacing PPO2's cloudpickle .pkl
   (ppo2.py:452-476) and fixing its gap: the reference never saved optimizer
   state.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.models.lstm import (
    LSTMWeights, PolicyParams, init,
)


def load_bp5_csv(path: str, n_lstm: Sequence[int] = (48, 48),
                 act_dim: int = 12, obs_dim: int = 35) -> PolicyParams:
    """Load a reference CSV export (e.g. IRRL/script/model/bp5_155/)."""
    def ld(name):
        return jnp.asarray(np.loadtxt(os.path.join(path, name + ".csv"), delimiter=","),
                           dtype=jnp.float32)

    pi_stack = tuple(
        LSTMWeights(wx=ld(f"lstm_wx{i}"), wh=ld(f"lstm_wh{i}"), b=ld(f"lstm_b{i}"))
        for i in range(len(n_lstm)))
    # value tower / logstd are not part of the deployment export
    blank = init(jax.random.PRNGKey(0), obs_dim, act_dim, n_lstm)
    has_v = os.path.exists(os.path.join(path, "v_lstm_wx0.csv"))
    if has_v:
        v_stack = tuple(
            LSTMWeights(wx=ld(f"v_lstm_wx{i}"), wh=ld(f"v_lstm_wh{i}"), b=ld(f"v_lstm_b{i}"))
            for i in range(len(n_lstm)))
        # savetxt writes the (h, 1) head as one column; restore the 2-d shape
        vf_w, vf_b = ld("v_w").reshape(-1, 1), jnp.atleast_1d(ld("v_b"))
    else:
        v_stack, vf_w, vf_b = blank.v_lstm, blank.vf_w, blank.vf_b
    # logstd is not part of the reference's deployment export
    # (CustomerLstmNN.py:203-224) but we save it so training warm-starts
    # from CSV keep their exploration noise; fresh init when absent
    if os.path.exists(os.path.join(path, "logstd.csv")):
        logstd = jnp.atleast_1d(ld("logstd"))
    else:
        logstd = blank.logstd
    return PolicyParams(
        pi_lstm=pi_stack, v_lstm=v_stack,
        pi_w=ld("pi_w"), pi_b=ld("pi_b"), logstd=logstd,
        vf_w=vf_w, vf_b=vf_b)


def save_bp5_csv(params: PolicyParams, path: str, include_value: bool = True) -> None:
    """Export in the reference CSV format (save_model parity, fmt %.6f)."""
    os.makedirs(path, exist_ok=True)

    def sv(name, arr):
        np.savetxt(os.path.join(path, name + ".csv"), np.asarray(arr),
                   delimiter=",", fmt="%.6f")

    for i, w in enumerate(params.pi_lstm):
        sv(f"lstm_wx{i}", w.wx); sv(f"lstm_wh{i}", w.wh); sv(f"lstm_b{i}", w.b)
    sv("pi_w", params.pi_w); sv("pi_b", params.pi_b)
    if include_value:
        for i, w in enumerate(params.v_lstm):
            sv(f"v_lstm_wx{i}", w.wx); sv(f"v_lstm_wh{i}", w.wh); sv(f"v_lstm_b{i}", w.b)
        sv("v_w", params.vf_w); sv("v_b", params.vf_b)
        sv("logstd", params.logstd)


def save_checkpoint(path: str, tree, step: Optional[int] = None) -> None:
    """Pickle-based full-state checkpoint (host arrays)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        pickle.dump({"step": step, "tree": host}, f)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return jax.tree.map(jnp.asarray, blob["tree"]), blob["step"]
