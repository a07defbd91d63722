"""Reward-landscape study over the policy-parameter simplex.

The reference's hyperplane analysis (readme.md:3) is backed by
Exp_Raw_Data/total_reward.txt: 5152 rows sweeping barycentric weights
(w0, w1, w2=1-w0-w1) over three trained controllers and recording the
accumulated per-term rewards of each *parameter-interpolated* policy
(rendered as ternary contour panels in Figure2.py:362-460).

Here the whole sweep is one batched device computation: the simplex grid of
blended parameter pytrees rides a single ``vmap`` (every lane is a different
policy), rolled out in lockstep by one ``lax.scan`` — 5k+ policies x 750
steps in one launch instead of 5k sequential sim runs.

Column mapping to the reference file (Figure2.py:388-392): our env's term
vector [EE, BodyPos, BodyAtti, J, Jdot, Vel, Torque, Contact]
(envs/blackpanther.py:316) aggregates exactly the composites the figure
uses — mimic = 0.25 mimic_q + 0.75 mimic_dq is our J+Jdot pair, velocity =
0.5 lin + 0.5 ang is our Vel, torque = 0.5 tau + 0.5 dtau is our Torque,
balance = 0.5 height + 0.5 attitude is our BodyPos+BodyAtti pair — so the
five panels (r^f composite, r^v, r^m, r^b, r^t) are computed exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm

TERM_NAMES = ("ee", "body_pos", "body_atti", "mimic_q", "mimic_dq",
              "cmd_vel", "torque", "contact")


def simplex_grid(step: float = 0.02) -> np.ndarray:
    """(N, 3) barycentric weights covering the simplex (w0+w1+w2=1)."""
    n = int(round(1.0 / step))
    pts = [(i * step, j * step, 1.0 - (i + j) * step)
           for i in range(n + 1) for j in range(n + 1 - i)]
    return np.asarray(pts, dtype=np.float32)


def blend_params(params_list, w: jnp.ndarray) -> lstm.PolicyParams:
    """Parameter-space interpolation sum_k w_k theta_k (the hyperplane)."""
    return jax.tree.map(
        lambda *leaves: sum(wk * leaf for wk, leaf in zip(w, leaves)),
        *params_list)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"))
def _landscape_batch(cfg: EnvConfig, stacked_params, command, key,
                     n_steps: int = 750):
    """Accumulated reward terms for a batch of policies in lockstep.

    stacked_params: PolicyParams with a leading blend axis B.
    Returns (terms (B, 8), alive_len (B,)). Accumulation stops at each
    policy's first termination (the episode the reference sweep scores)."""
    B = stacked_params.pi_b.shape[0]
    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    keys = jax.random.split(key, B)
    state = jax.vmap(lambda k: bp.env_init(cfg, k))(keys)
    state = state._replace(command=jnp.tile(command, (B, 1)),
                           command_filtered=jnp.tile(command, (B, 1)))
    obs = jax.vmap(lambda s: bp.observe(cfg, s))(state)
    # wh leaves carry the blend axis in front: (B, h, 4h) -> hidden = shape[-2]
    s_size = lstm.state_size([w.wh.shape[-2] for w in stacked_params.pi_lstm])
    cmd_n = (command - bp.obs_mean(cfg)[:3]) / bp.obs_std(cfg)[:3]

    fwd = jax.vmap(lstm.deterministic_action)

    def scan_fn(carry, _):
        state, lstm_state, obs, alive, acc, alen = carry
        o = obs.at[:, :3].set(cmd_n)
        action, lstm_state = fwd(stacked_params, o[:, None],
                                 lstm_state[:, None], jnp.zeros((B, 1)))
        st = state._replace(command=jnp.tile(command, (B, 1)),
                            command_filtered=jnp.tile(command, (B, 1)))
        out = jax.vmap(lambda s, a: bp.step(cfg, s, a))(st, action[:, 0])
        terms = out.info["reward_terms"]                    # (B, 8)
        acc = acc + terms * alive[:, None]
        alen = alen + alive
        alive = alive * (1.0 - out.done.astype(jnp.float32))
        return (out.state, lstm_state[:, 0], out.obs, alive, acc, alen), None

    init = (state, jnp.zeros((B, s_size)), obs, jnp.ones(B),
            jnp.zeros((B, 8)), jnp.zeros(B))
    (_, _, _, alive, acc, alen), _ = jax.lax.scan(scan_fn, init, None,
                                                  length=n_steps)
    return acc, alen


def reward_landscape(cfg: EnvConfig, params_a, params_b, params_c,
                     command=jnp.array([2.0, 0.0, 0.0]), step: float = 0.02,
                     n_steps: int = 750, key=None, chunk: int = 512):
    """The full sweep: blend grid x rollout x per-term accumulation.

    params_{a,b,c}: the three anchor controllers (e.g. imitation-trained,
    relaxation-trained, reference bp5_155 — the Theta^m / Theta^v / Theta^f
    vertices of Figure2's ternary panels).
    Returns dict with 'w' (N,3), 'terms' (N,8), 'alive_len' (N,).
    """
    key = jax.random.PRNGKey(0) if key is None else key
    w = simplex_grid(step)
    plist = [params_a, params_b, params_c]
    terms_out, alen_out = [], []
    for i in range(0, len(w), chunk):
        wc = jnp.asarray(w[i:i + chunk])
        stacked = jax.vmap(lambda ww: blend_params(plist, ww))(wc)
        t, al = _landscape_batch(cfg, stacked, command, key, n_steps)
        terms_out.append(np.asarray(t))
        alen_out.append(np.asarray(al))
    return {"w": w, "terms": np.concatenate(terms_out),
            "alive_len": np.concatenate(alen_out)}


def composites(cfg: EnvConfig, terms: np.ndarray) -> dict:
    """The five Figure-2 panel quantities from the 8-term accumulators,
    divided by the run's reward coefficients so the panels are
    coefficient-free like the reference's raw columns (Figure2.py:388-396)."""
    def safe(c):
        return c if abs(c) > 1e-12 else 1.0
    r_v = terms[:, 5] / safe(cfg.vel_keep_coeff)
    r_m = (terms[:, 3] + terms[:, 4]) / safe(cfg.joint_mimic_coeff)
    r_b = (0.5 * terms[:, 1] / safe(cfg.body_pos_coeff)
           + 0.5 * terms[:, 2] / safe(cfg.body_atti_coeff))
    r_t = terms[:, 6] / safe(cfg.torque_coeff)
    ratio = np.array([0.3, 0.1, 0.3, 0.3])   # Figure2.py:396
    r_f = np.stack([r_v, r_m, r_b, r_t], axis=1) @ ratio
    return {"r_f": r_f, "r_v": r_v, "r_m": r_m, "r_b": r_b, "r_t": r_t}


def save_total_reward(path: str, cfg: EnvConfig, res: dict) -> None:
    """Write the sweep in the reference's total_reward.txt layout
    (space-separated, w0 w1 + term columns; Exp_Raw_Data/total_reward.txt)."""
    terms = res["terms"]
    def safe(c):
        return c if abs(c) > 1e-12 else 1.0
    # Our env aggregates sub-term pairs with the reference's own intra-pair
    # weights (0.25/0.75 mimic, 0.5/0.5 velocity and torque). The raw file's
    # consumers recombine pairs with exactly those weights (Figure2.py:388-392),
    # so writing each pair's *composite* into both columns reproduces the
    # figure quantities exactly (the independent sub-splits are not observable
    # from the aggregated terms).
    mimic = (terms[:, 3] + terms[:, 4]) / safe(cfg.joint_mimic_coeff)
    vel = terms[:, 5] / safe(cfg.vel_keep_coeff)
    tau = terms[:, 6] / safe(cfg.torque_coeff)
    cols = {
        "w0": res["w"][:, 0], "w1": res["w"][:, 1],
        "height_keep": terms[:, 1] / safe(cfg.body_pos_coeff),
        "balance_keep": terms[:, 2] / safe(cfg.body_atti_coeff),
        "mimic_q": mimic, "mimic_dq": mimic,
        "cmd_linear": vel, "cmd_angular": vel,
        "torque": tau, "torque_d": tau,
        "contact": terms[:, 7],
        "terminal": (res["alive_len"] < res["alive_len"].max()).astype(float),
    }
    header = " ".join(cols.keys())
    data = np.stack(list(cols.values()), axis=1)
    np.savetxt(path, data, header=header, comments="", fmt="%.6g")
