import os
import shutil

import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import native


def test_load_table_csv(tmp_path, rng):
    want = rng.normal(size=(37, 5)).astype(np.float32)
    p = tmp_path / "t.csv"
    np.savetxt(p, want, delimiter=",", fmt="%.6f")
    got = native.load_table(str(p))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_load_table_whitespace(tmp_path, rng):
    want = rng.normal(size=(11, 28)).astype(np.float32)
    p = tmp_path / "t.txt"
    np.savetxt(p, want, delimiter=" ", fmt="%.6f")
    got = native.load_table(str(p))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_load_reference_trot_table():
    ref = "/root/reference/Exp_Raw_Data/trot_ref_.csv"
    if not os.path.exists(ref):
        pytest.skip("reference data not present")
    t = native.load_table(ref)
    assert t.shape == (10000, 28)  # 10001 lines = header + 10000 frames x 28 cols
    assert abs(float(t[0, 1]) - 0.28) < 1e-6  # z column


def test_resample_linear():
    table = np.arange(10, dtype=np.float32)[:, None]
    out = native.resample(table, dt_in=1.0, n_out=19, dt_out=0.5)
    np.testing.assert_allclose(out[:, 0], np.arange(19) * 0.5, atol=1e-5)


def test_telemetry_ring_roundtrip(rng):
    ring = native.TelemetryRing(capacity=16, record_size=4)
    recs = rng.normal(size=(10, 4)).astype(np.float32)
    for r in recs:
        assert ring.push(r)
    got = ring.pop()
    np.testing.assert_allclose(got, recs, atol=1e-6)
    assert ring.dropped == 0


def test_telemetry_ring_overflow(rng):
    ring = native.TelemetryRing(capacity=4, record_size=2)
    for i in range(6):
        ring.push(np.full(2, i, np.float32))
    assert ring.dropped == 2
    got = ring.pop()
    assert got.shape == (4, 2)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no toolchain")
def test_native_library_builds():
    assert native.native_available(), "native runtime failed to build"


@pytest.mark.skipif(not native.native_available(), reason="native runtime not built")
def test_state_server_roundtrip(rng):
    srv = native.StateServer(port=0)
    try:
        cli = native.StateClient(srv.port)
        assert cli.meta() == 0  # nothing published yet
        snap1 = rng.normal(size=41).astype(np.float32)
        srv.update(snap1)
        seq, got = cli.state()
        assert seq == 1
        np.testing.assert_allclose(got, snap1, atol=1e-6)
        snap2 = rng.normal(size=41).astype(np.float32)
        srv.update(snap2)
        seq2, got2 = cli.state()
        assert seq2 == 2
        np.testing.assert_allclose(got2, snap2, atol=1e-6)
        assert cli.meta() == 41
        assert srv.clients == 1
        cli.close()
    finally:
        srv.close()


@pytest.mark.skipif(not native.native_available(), reason="native runtime not built")
def test_state_server_multiple_clients(rng):
    srv = native.StateServer(port=0)
    try:
        srv.update(np.arange(8, dtype=np.float32))
        clients = [native.StateClient(srv.port) for _ in range(3)]
        for c in clients:
            _, got = c.state()
            np.testing.assert_allclose(got, np.arange(8), atol=1e-6)
        for c in clients:
            c.close()
    finally:
        srv.close()


BP5_DIR = "/root/reference/IRRL/script/model/bp5_155"


@pytest.mark.skipif(not native.native_available(), reason="native runtime not built")
def test_native_policy_matches_jax(tmp_path, rng):
    """The C deployment runtime (irrl_policy_*) must reproduce
    models/lstm.deterministic_action step-for-step on the same CSV export
    (both sides load the identical quantized weights, so the only slack is
    float op ordering)."""
    import jax.numpy as jnp
    import jax.random as jr

    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm

    params = lstm.init(jr.PRNGKey(3), obs_dim=35, act_dim=12, n_lstm=(48, 48))
    mio.save_bp5_csv(params, str(tmp_path), include_value=False)
    params = mio.load_bp5_csv(str(tmp_path))  # same quantized weights as C

    pol = native.NativePolicy(str(tmp_path))
    assert (pol.obs_dim, pol.act_dim) == (35, 12)
    assert pol.state().shape == (2 * (48 + 48),)
    assert np.all(pol.state() == 0.0)

    state = jnp.zeros((1, lstm.state_size([48, 48])))
    done = jnp.zeros((1,))
    obs = rng.normal(scale=0.5, size=(60, 35)).astype(np.float32)
    for t in range(60):
        want, state = lstm.deterministic_action(
            params, jnp.asarray(obs[t: t + 1]), state, done)
        got = pol.act(obs[t])
        np.testing.assert_allclose(got, np.asarray(want[0]), atol=2e-5)
    assert np.any(pol.state() != 0.0)
    pol.reset()
    assert np.all(pol.state() == 0.0)
    pol.close()


@pytest.mark.skipif(not native.native_available(), reason="native runtime not built")
@pytest.mark.skipif(not os.path.isdir(BP5_DIR), reason="bp5_155 not present")
def test_native_policy_bp5_155(rng):
    """The shipped reference controller loads and acts through the C runtime;
    sanity-check determinism and the [-1, 1] clip contract."""
    pol = native.NativePolicy(BP5_DIR)
    assert (pol.obs_dim, pol.act_dim) == (35, 12)
    obs = rng.normal(scale=0.3, size=(50, 35)).astype(np.float32)
    obs[:, 0] = 1.0
    a1 = np.stack([pol.act(o) for o in obs])
    pol.reset()
    a2 = np.stack([pol.act(o) for o in obs])
    np.testing.assert_array_equal(a1, a2)
    assert np.all(np.abs(a1) <= 1.0)
    assert np.std(a1) > 1e-3  # actually computing something
    pol.close()
