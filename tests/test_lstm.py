import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm

BP5 = "/root/reference/IRRL/script/model/bp5_155"


def numpy_lstm_reference(wx, wh, b, pi_w, pi_b, obs_seq):
    """Independent NumPy oracle for the bp5 deployment math: 2-layer LSTM,
    gate order [i,f,o,c], deterministic pi head clipped to +-1
    (semantics of CustomerLstmNN.predict, CustomerLstmNN.py:112-134)."""
    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    n0, n1 = wh[0].shape[0], wh[1].shape[0]
    c = [np.zeros(n0), np.zeros(n1)]
    h = [np.zeros(n0), np.zeros(n1)]
    outs = []
    for obs in obs_seq:
        x = obs
        for i, n in enumerate((n0, n1)):
            g = x @ wx[i] + h[i] @ wh[i] + b[i]
            ig, fg, og, cg = g[:n], g[n:2 * n], g[2 * n:3 * n], np.tanh(g[3 * n:])
            c[i] = sig(fg) * c[i] + sig(ig) * cg
            h[i] = sig(og) * np.tanh(c[i])
            x = h[i]
        outs.append(np.clip(x @ pi_w + pi_b, -1.0, 1.0))
    return np.stack(outs)


@pytest.fixture(scope="module")
def bp5():
    if not os.path.isdir(BP5):
        pytest.skip("reference weights not available")
    return mio.load_bp5_csv(BP5)


def test_bp5_shapes(bp5):
    assert bp5.pi_lstm[0].wx.shape == (35, 192)
    assert bp5.pi_lstm[0].wh.shape == (48, 192)
    assert bp5.pi_lstm[1].wx.shape == (48, 192)
    assert bp5.pi_w.shape == (48, 12)
    assert lstm.state_size([48, 48]) == 384


def test_bp5_golden_vs_numpy_oracle(bp5, rng):
    """Our JAX forward must reproduce the deployment LSTM bit-for-bit (f32)."""
    T = 40
    t = np.arange(T) * 0.002
    obs_seq = np.zeros((T, 35), np.float32)
    obs_seq[:, 0] = 1.0
    obs_seq[:, 3] = np.sin(2 * np.pi * t / 0.2)
    obs_seq[:, 4] = np.cos(2 * np.pi * t / 0.2)
    obs_seq[:, 5:] = rng.normal(scale=0.3, size=(T, 30)).astype(np.float32)

    wx = [np.asarray(w.wx) for w in bp5.pi_lstm]
    wh = [np.asarray(w.wh) for w in bp5.pi_lstm]
    b = [np.asarray(w.b) for w in bp5.pi_lstm]
    want = numpy_lstm_reference(wx, wh, b, np.asarray(bp5.pi_w), np.asarray(bp5.pi_b), obs_seq)

    state = jnp.zeros((1, lstm.state_size([48, 48])))
    done = jnp.zeros((1,))
    got = []
    for i in range(T):
        act, state = lstm.deterministic_action(bp5, jnp.asarray(obs_seq[i:i + 1]), state, done)
        got.append(np.asarray(act[0]))
    got = np.stack(got)
    # f32 JAX vs f64 numpy oracle: recurrent accumulation leaves ~3e-5
    np.testing.assert_allclose(got, want, atol=2e-4)
    # the controller must produce meaningful output (not saturated/zero)
    assert np.abs(want).max() > 0.05


def test_sequence_matches_stepwise(bp5, rng):
    """scan-based BPTT forward == step-by-step forward, incl. done resets."""
    T, B = 12, 3
    obs = jnp.asarray(rng.normal(scale=0.5, size=(T, B, 35)).astype(np.float32))
    dones = jnp.asarray((rng.random((T, B)) < 0.2).astype(np.float32))
    s0 = jnp.asarray(rng.normal(scale=0.1, size=(B, lstm.state_size([48, 48]))).astype(np.float32))

    seq = lstm.sequence(bp5, obs, dones, s0)
    state = s0
    means, values = [], []
    for tt in range(T):
        out = lstm.forward(bp5, obs[tt], state, dones[tt])
        state = out.state
        means.append(out.mean)
        values.append(out.value)
    np.testing.assert_allclose(np.asarray(seq.mean), np.stack(means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq.value), np.stack(values), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq.state), np.asarray(state), atol=1e-5)


def test_done_resets_state(bp5):
    obs = jnp.zeros((1, 35))
    s0 = jnp.zeros((1, lstm.state_size([48, 48])))
    out1 = lstm.forward(bp5, obs, s0, jnp.zeros(1))
    # run a step, then a done step: the done step must equal a fresh-state step
    out2 = lstm.forward(bp5, obs, out1.state, jnp.ones(1))
    np.testing.assert_allclose(np.asarray(out2.mean), np.asarray(out1.mean), atol=1e-6)


def test_csv_roundtrip(tmp_path):
    params = lstm.init(jax.random.PRNGKey(0))
    mio.save_bp5_csv(params, str(tmp_path))
    loaded = mio.load_bp5_csv(str(tmp_path))
    np.testing.assert_allclose(np.asarray(loaded.pi_w), np.asarray(params.pi_w), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.v_lstm[0].wx),
                               np.asarray(params.v_lstm[0].wx), atol=1e-6)


def test_distribution_ops():
    mean = jnp.zeros((4, 12))
    logstd = jnp.zeros(12)
    a = jnp.zeros((4, 12))
    nlp = lstm.neglogp(mean, logstd, a)
    np.testing.assert_allclose(np.asarray(nlp), 0.5 * np.log(2 * np.pi) * 12, rtol=1e-6)
    ent = lstm.entropy(logstd)
    np.testing.assert_allclose(float(ent), 12 * 0.5 * (np.log(2 * np.pi) + 1.0), rtol=1e-6)
