"""Fast tests of the analysis-layer math (no env compiles):
recovery-rate fits, landscape grid/blending/format, figure rendering."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import (
    figures, landscape, robustness,
)
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm


def test_fit_kappa_recovers_exponential_rate():
    """|v - v_ss| ~ A exp(kappa t) with kappa = -3 must fit to -3."""
    dt, kick = 0.002, 750
    t = np.arange(750) * dt
    v = np.concatenate([np.full(kick, 2.0), 2.0 + 0.8 * np.exp(-3.0 * t)])
    fit = robustness.fit_kappa(v, dt, kick)
    assert abs(fit["kappa"] + 3.0) < 0.05
    assert fit["r2"] > 0.99
    assert abs(fit["v_ss"] - 2.0) < 1e-6


def test_fit_kappa_on_noisy_signal():
    rng = np.random.default_rng(0)
    dt, kick = 0.002, 500
    t = np.arange(1000) * dt
    v = np.concatenate([np.full(kick, 1.0),
                        1.0 + 0.5 * np.exp(-5.0 * t[:1000])])
    v += rng.normal(scale=1e-3, size=v.shape)
    fit = robustness.fit_kappa(v, dt, kick, window=300)
    assert -7.0 < fit["kappa"] < -3.0


def test_ensemble_entropy_quantized_cells():
    """The reference's estimator (Figure4.py:160-167): uniform over k cells
    -> log k nats; a concentrated ensemble -> 0."""
    one_cell = np.tile(np.array([[0.28, 0.0, 0.0, 0.0, 0.0, 0.0]]), (100, 1))
    assert robustness.ensemble_entropy(one_cell) == 0.0
    # 4 equally-populated roll cells, 0.02 rad apart (= the roll precision)
    rolls = np.repeat(np.arange(4) * 0.02, 25)
    x = np.zeros((100, 6))
    x[:, 1] = rolls + 0.01  # cell centers
    np.testing.assert_allclose(robustness.ensemble_entropy(x), np.log(4),
                               rtol=1e-6)
    # dispersion increases entropy monotonically
    rng = np.random.default_rng(0)
    tight = rng.normal(scale=0.01, size=(500, 6))
    wide = rng.normal(scale=0.2, size=(500, 6))
    assert (robustness.ensemble_entropy(wide)
            > robustness.ensemble_entropy(tight))


def test_fit_entropy_kappa_piecewise():
    """Known flat-linear-flat decay: the fitted slope is kappa."""
    t = np.arange(0, 1.0, 0.01)
    y = robustness.piecewise_flat_linear_flat(t, 0.1, 6.0, 0.6, -8.0)
    fit = robustness.fit_entropy_kappa(t, y + 1e-3 * np.sin(40 * t))
    assert abs(fit["kappa"] + 8.0) < 0.3
    assert fit["kappa_err"] < 0.3


@pytest.mark.slow
def test_entropy_kappa_end_to_end():
    """Figure-4 reproduction on a small ensemble: entropy plateaus at log N
    (distinct noise-spread states), then contracts as the closed loop
    re-converges; the piecewise fit yields a negative recovery rate."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio

    bp5 = "/root/reference/IRRL/script/model/bp5_155"
    if not os.path.isdir(bp5):
        pytest.skip("bp5_155 weights unavailable")
    cfg = config.test_default().replace(terrain=False, crucial=False)
    params = mio.load_bp5_csv(bp5)
    fit = robustness.entropy_kappa(cfg, params, jnp.array([2.0, 0.0, 0.0]),
                                   jax.random.PRNGKey(0),
                                   n_episodes=64, n_steps=600, skip=5)
    assert abs(fit["entropy"][0] - np.log(64)) < 0.3
    assert fit["entropy"][-1] < fit["entropy"][0] - 0.5
    assert fit["kappa"] < -1.0
    assert fit["survival"] > 0.9


def test_simplex_grid_covers_simplex():
    w = landscape.simplex_grid(0.02)
    assert w.shape[1] == 3
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    assert (w >= -1e-6).all()
    # the reference sweep has 5151 interior+boundary points at step 0.01
    # (total_reward.txt: 5152 rows incl. header); step 0.02 gives 1326
    assert len(w) == 51 * 52 // 2
    assert len(landscape.simplex_grid(0.01)) == 101 * 102 // 2


def test_blend_params_is_affine():
    k = jax.random.PRNGKey(0)
    ps = [lstm.init(jax.random.fold_in(k, i), 35, 12, (8, 8)) for i in range(3)]
    w = jnp.array([0.2, 0.3, 0.5])
    b = landscape.blend_params(ps, w)
    ref = 0.2 * ps[0].pi_w + 0.3 * ps[1].pi_w + 0.5 * ps[2].pi_w
    np.testing.assert_allclose(np.asarray(b.pi_w), np.asarray(ref), rtol=1e-6)
    # vertex blend returns the vertex
    b0 = landscape.blend_params(ps, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(b0.pi_w), np.asarray(ps[0].pi_w))


def test_total_reward_format_matches_reference(tmp_path):
    cfg = config.train_default()
    w = landscape.simplex_grid(0.2)
    terms = np.abs(np.random.default_rng(0).normal(size=(len(w), 8)))
    res = {"w": w, "terms": terms, "alive_len": np.full(len(w), 750.0)}
    p = tmp_path / "total_reward.txt"
    landscape.save_total_reward(str(p), cfg, res)
    header = p.read_text().splitlines()[0].split()
    # exactly the reference's column names (Exp_Raw_Data/total_reward.txt)
    assert header == ["w0", "w1", "height_keep", "balance_keep", "mimic_q",
                      "mimic_dq", "cmd_linear", "cmd_angular", "torque",
                      "torque_d", "contact", "terminal"]
    data = np.loadtxt(str(p), skiprows=1)
    assert data.shape == (len(w), 12)


def test_figures_render(tmp_path):
    cfg = config.train_default()
    w = landscape.simplex_grid(0.1)
    terms = np.abs(np.random.default_rng(1).normal(size=(len(w), 8)))
    comps = landscape.composites(cfg, terms)
    res = {"w": w, "terms": terms, "alive_len": np.full(len(w), 750.0)}
    figures.ternary_landscape_figure(res, comps, str(tmp_path / "t.png"))
    rows = [{"latency_ms": m, "v_mean": 5 - m / 5, "kappa": -3 + m / 5,
             "survived": m < 8} for m in (0, 2, 4, 8)]
    figures.recovery_figure(rows, str(tmp_path / "r.png"))
    res2 = {"a": [{"tcot": 0.3, "v_mean": 1.0}, {"tcot": 0.4, "v_mean": 2.0}],
            "b": [{"tcot": 0.2, "v_mean": 1.0}]}
    figures.tcot_grouped_figure(res2, str(tmp_path / "c.png"))
    for f in ("t.png", "r.png", "c.png"):
        assert (tmp_path / f).stat().st_size > 1000


def _fake_log(T=300, params=None):
    """Synthesize a RolloutLog-shaped namedtuple (no env compile)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis.eval import RolloutLog
    rng = np.random.default_rng(1)
    S = lstm.state_size([8, 8]) * 2 if params is None else (
        sum(2 * w.wh.shape[0] for w in params.pi_lstm) +
        sum(2 * w.wh.shape[0] for w in params.v_lstm))
    gc = np.zeros((T, 19), np.float32)
    gc[:, 2] = 0.3
    gc[:, 3] = 1.0
    gc[:, 7:19] = np.tile([0.0, 0.8, -1.6] * 4, (T, 1)) + \
        0.1 * np.sin(np.arange(T) * 0.2)[:, None]
    return RolloutLog(
        gc=jnp.asarray(gc), gv=jnp.asarray(rng.normal(size=(T, 18)).astype(np.float32)),
        torque=jnp.zeros((T, 12)), action=jnp.zeros((T, 12)),
        obs=jnp.zeros((T, 35)), reward=jnp.zeros(T), done=jnp.zeros(T),
        contact=jnp.zeros((T, 4)), command=jnp.zeros((T, 3)),
        lstm_state=jnp.asarray(rng.normal(size=(T, S)).astype(np.float32)),
        joint_ref=jnp.asarray(gc[:, 7:19] + 0.05))


def test_value_pca_shapes_and_explained(tmp_path):
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
    params = lstm.init(jax.random.PRNGKey(0), 35, 12, (8, 8))
    log = _fake_log(params=params)
    res = ev.value_pca(params, log)
    assert res["coords"].shape == (300, 2)
    assert res["value"].shape == (300,)
    assert 0 < res["explained"].sum() <= 1.0 + 1e-6
    figures.pca_value_figure(res, str(tmp_path / "pca.png"))
    assert os.path.getsize(tmp_path / "pca.png") > 5000


def test_spectrogram_finds_tone(tmp_path):
    """A pure 12.5 Hz tone must peak at 12.5 Hz in every STFT column."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
    dt = 0.002
    t = np.arange(2000) * dt
    spec = ev.spectrogram(np.sin(2 * np.pi * 12.5 * t), dt)
    peak = spec["freqs"][np.argmax(spec["db"], axis=0)]
    np.testing.assert_allclose(peak, 12.5, atol=2.0)
    figures.spectrogram_figure(spec, str(tmp_path / "s.png"))
    assert os.path.getsize(tmp_path / "s.png") > 5000


def test_trace_figures_render(tmp_path):
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
    log = _fake_log()
    figures.joint_traces_figure(log, 0.002, str(tmp_path / "j.png"))
    toes = ev.toe_trajectories(log)
    assert toes.shape == (300, 4, 3)
    # stand pose puts toes below the hips
    assert (toes[:, :, 2] < 0).all()
    figures.ee_traj_figure(toes, str(tmp_path / "ee.png"), skip=10)
    assert os.path.getsize(tmp_path / "j.png") > 10000
    assert os.path.getsize(tmp_path / "ee.png") > 5000
