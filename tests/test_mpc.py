import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import cost as mcost
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import ilqr, trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl

pytestmark = pytest.mark.slow  # heavy-compile suite (see pyproject addopts)


def test_ilqr_solves_lqr_exactly():
    """On a linear-quadratic problem iLQR must converge in one iteration to
    the analytic LQR solution (double integrator to the origin)."""
    dt = 0.1
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.0], [dt]])
    Q = jnp.eye(2)
    Rm = jnp.eye(1) * 0.1

    def dynamics(x, u, t):
        return A @ x + B @ u

    def cost_fn(x, u, t):
        return x @ Q @ x + u @ Rm @ u

    def term_fn(x):
        return 10.0 * x @ x

    x0 = jnp.array([1.0, 0.0])
    T = 20
    res = ilqr.solve(dynamics, cost_fn, term_fn, x0, jnp.zeros((T, 1)), n_iter=3)
    # exact finite-horizon LQR optimum via backward Riccati (numpy oracle)
    A_, B_, Q_, R_ = map(np.asarray, (A, B, Q, Rm))
    P = 10.0 * np.eye(2)
    for _ in range(T):
        K = np.linalg.solve(R_ + B_.T @ P @ B_, B_.T @ P @ A_)
        P = Q_ + A_.T @ P @ (A_ - B_ @ K)
    opt = float(np.array([1.0, 0.0]) @ P @ np.array([1.0, 0.0]))
    assert float(res.cost_trace[0]) <= float(_initial_cost(dynamics, cost_fn, term_fn, x0, T))
    np.testing.assert_allclose(float(res.cost), opt, rtol=1e-2)
    # iteration 2+ changes (almost) nothing: LQR is solved in one pass
    assert abs(float(res.cost_trace[1]) - float(res.cost_trace[-1])) < 1e-4 * opt


def _initial_cost(dynamics, cost_fn, term_fn, x0, T):
    xs = [x0]
    for t in range(T):
        xs.append(dynamics(xs[-1], jnp.zeros(1), t))
    c = sum(float(cost_fn(x, jnp.zeros(1), t)) for t, x in enumerate(xs[:-1]))
    return c + float(term_fn(xs[-1]))


def test_ilqr_pendulum_swing_stabilize():
    """Nonlinear sanity: damped pendulum driven to upright."""
    dt = 0.05

    def dynamics(x, u, t):
        th, w = x
        wdot = -9.81 * jnp.sin(th) - 0.2 * w + u[0]
        return jnp.array([th + dt * (w + dt * wdot), w + dt * wdot])

    def cost_fn(x, u, t):
        return 5.0 * (x[0] - jnp.pi) ** 2 + 0.1 * x[1] ** 2 + 0.01 * u[0] ** 2

    def term_fn(x):
        return 50.0 * (x[0] - jnp.pi) ** 2 + 1.0 * x[1] ** 2

    x0 = jnp.array([2.6, 0.0])  # start near upright basin
    res = ilqr.solve(dynamics, cost_fn, term_fn, x0, jnp.zeros((40, 1)), n_iter=15)
    assert abs(float(res.xs[-1, 0]) - np.pi) < 0.1
    # monotone non-increasing cost trace
    tr_ = np.asarray(res.cost_trace)
    assert np.all(np.diff(tr_) <= 1e-5)


@pytest.fixture(scope="module")
def trot_setup():
    cfg = config.test_default().replace(obs_noise=0.0)
    mpc_cfg = trot.MPCConfig(horizon=10, n_iter=3, model_substeps=1)
    params = mdl.nominal_params(cfg)
    return cfg, mpc_cfg, params


def test_trot_mpc_reduces_cost(trot_setup):
    cfg, mpc_cfg, params = trot_setup
    prob = trot.make_problem(cfg, trot.standing_x0(cfg)[:19], jnp.zeros(18),
                             jnp.array([1.0, 0.0, 0.0]), jnp.asarray(0.0),
                             mpc_cfg.horizon)
    res = jax.jit(lambda p: trot.solve(cfg, mpc_cfg, params, p))(prob)
    tr_ = np.asarray(res.cost_trace)
    assert np.all(np.isfinite(tr_))
    assert tr_[-1] <= tr_[0] + 1e-6
    assert np.all(np.isfinite(np.asarray(res.us)))


def test_trot_mpc_batched(trot_setup):
    cfg, mpc_cfg, params = trot_setup
    B = 3
    cmds = jnp.stack([jnp.array([v, 0.0, 0.0]) for v in (0.5, 1.0, 2.0)])
    probs = jax.vmap(lambda c: trot.make_problem(
        cfg, trot.standing_x0(cfg)[:19], jnp.zeros(18), c, jnp.asarray(0.0),
        mpc_cfg.horizon))(cmds)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    res = jax.jit(lambda pr: trot.batched_solve(cfg, mpc_cfg, pb, pr))(probs)
    assert res.us.shape == (B, mpc_cfg.horizon, 12)
    assert np.all(np.isfinite(np.asarray(res.cost)))


def test_ilqr_relin_and_alpha_options():
    """Jacobian reuse (relin_every) and a narrower line search must still
    converge on a nonlinear problem (pendulum to upright)."""
    dt = 0.05

    def dynamics(x, u, t):
        th, w = x
        wdot = -9.81 * jnp.sin(th) - 0.2 * w + u[0]
        return jnp.array([th + dt * w, w + dt * wdot])

    def cost_fn(x, u, t):
        return 0.1 * (x[0] - jnp.pi) ** 2 + 0.01 * u[0] ** 2

    def term_fn(x):
        return 20.0 * (x[0] - jnp.pi) ** 2 + 1.0 * x[1] ** 2

    x0 = jnp.array([0.0, 0.0])
    T = 40
    full = ilqr.solve(dynamics, cost_fn, term_fn, x0, jnp.zeros((T, 1)),
                      n_iter=12)
    trimmed = ilqr.solve(dynamics, cost_fn, term_fn, x0, jnp.zeros((T, 1)),
                         n_iter=12, relin_every=2, n_alphas=4)
    assert float(trimmed.cost) < float(full.cost) * 1.5
    # both end near upright
    assert abs(float(full.xs[-1, 0]) - np.pi) < 0.15
    assert abs(float(trimmed.xs[-1, 0]) - np.pi) < 0.2


def test_trot_solve_batch_lanes_parity(trot_setup):
    """Lanes-batched iLQR (ilqr.solve_batch over ops/phys_lanes dynamics)
    matches the per-problem vmap path: same problems, same optimization,
    equal solution costs (the physics paths are numerically parity-tested
    in tests/test_phys_lanes.py; tiny float reorderings may flip a
    line-search pick, hence the modest tolerance)."""
    import dataclasses

    cfg, mpc_cfg, params = trot_setup
    # converge both paths: AD (vmap) vs central-FD (lanes) take different
    # descent routes. Round-3 traces (fd_eps=1e-3, post terminal-knot fix):
    # the slow problem (cmd 0.5) reads 8.27 on FD vs ~8.01 on AD at 10
    # iterations (3.2%), both still inching toward the same optimum; the
    # cmd-1.5 problem agrees to <0.5% by iteration 8
    mpc_cfg = dataclasses.replace(mpc_cfg, n_iter=10)
    B = 2
    cmds = jnp.stack([jnp.array([v, 0.0, 0.0]) for v in (0.5, 1.5)])
    probs = jax.vmap(lambda c: trot.make_problem(
        cfg, trot.standing_x0(cfg)[:19], jnp.zeros(18), c, jnp.asarray(0.0),
        mpc_cfg.horizon))(cmds)

    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    ref = jax.jit(lambda pr: trot.batched_solve(cfg, mpc_cfg, pb, pr))(probs)
    res = jax.jit(lambda pr: trot.solve_batch_lanes(cfg, mpc_cfg, params, pr))(probs)

    assert res.us.shape == ref.us.shape
    assert np.all(np.isfinite(np.asarray(res.cost)))
    # AD vs central-FD jacobians take slightly different descent paths;
    # near convergence the solution costs agree to a few percent
    np.testing.assert_allclose(np.asarray(res.cost), np.asarray(ref.cost),
                               rtol=5e-2)
    # both descend from the identical warm start
    tr_ = np.asarray(res.cost_trace)
    assert np.all(tr_[:, -1] <= tr_[:, 0] + 1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("linearizer", ["fd", "frozen"])
def test_wb_mpc_receding_horizon_stands(linearizer):
    """Whole-body iLQR receding-horizon control (runtime.wb_mpc_rollout):
    warm-started 1-iteration solves keep the robot upright closed-loop —
    with both the exact jacfwd linearization and the frozen-operator
    surrogate (mpc/linearize.py, ~49x fewer physics evals per solve)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime

    cfg = config.test_default().replace(terrain=False, crucial=False)
    mc = trot.MPCConfig(horizon=6, n_iter=1, model_substeps=2,
                        linearize_chunk=1, n_alphas=4, linearizer=linearizer)
    log = runtime.wb_mpc_rollout(cfg, mc, jnp.array([0.5, 0.0, 0.0]),
                                 jax.random.PRNGKey(0), 30)
    assert int(np.asarray(log.done).sum()) == 0
    z = np.asarray(log.gc)[:, 2]
    assert (z > 0.2).all() and (z < 0.5).all()
    assert np.isfinite(np.asarray(log.solve_cost)).all()


@pytest.mark.slow
def test_wb_mpc_fleet_batch_matches_single():
    """runtime.wb_mpc_rollout_batch (the B-robot serving shape) produces the
    same trajectory as B independent wb_mpc_rollout calls."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime

    cfg = config.test_default().replace(terrain=False, crucial=False)
    mc = trot.MPCConfig(horizon=6, n_iter=1, model_substeps=2,
                        linearize_chunk=1, n_alphas=4, linearizer="frozen")
    cmds = jnp.stack([jnp.array([0.3, 0.0, 0.0]), jnp.array([0.6, 0.0, 0.0])])
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    batch = runtime.wb_mpc_rollout_batch(cfg, mc, cmds, keys, 10)
    assert batch.gc.shape == (2, 10, 19)
    assert int(np.asarray(batch.done).sum()) == 0
    single = runtime.wb_mpc_rollout(cfg, mc, cmds[1], keys[1], 10)
    np.testing.assert_allclose(np.asarray(batch.gc[1]),
                               np.asarray(single.gc), atol=1e-4)


@pytest.mark.slow
def test_wb_mpc_chunked_matches_monolithic():
    """runtime.wb_mpc_rollout_chunked (the crash-safe long-rollout harness,
    round-4 h>=20 x 2500 kernel-fault workaround) must be BIT-IDENTICAL to
    the monolithic scan: the (state, warm-start plan) carry fully
    determines the continuation, so host-syncing between segments cannot
    change physics. Checked with a chunk size that does not divide n_steps
    (ragged final segment)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime

    cfg = config.test_default().replace(terrain=False, crucial=False)
    mc = trot.MPCConfig(horizon=6, n_iter=1, model_substeps=2,
                        linearize_chunk=1, n_alphas=4, linearizer="frozen")
    cmd = jnp.array([0.5, 0.0, 0.0])
    key = jax.random.PRNGKey(0)
    mono = runtime.wb_mpc_rollout(cfg, mc, cmd, key, 20)
    chunked = runtime.wb_mpc_rollout_chunked(cfg, mc, cmd, key, 20, chunk=7)
    for f in runtime.WBMPCRolloutLog._fields:
        np.testing.assert_array_equal(np.asarray(getattr(mono, f)),
                                      getattr(chunked, f), err_msg=f)


@pytest.mark.slow
def test_wb_mpc_terrain_oracle_model():
    """terrain_model=True threads the env's own heightmap into the MPC
    model + frozen linearizer (the oracle elevation-mapped MPC,
    trot.make_dynamics/make_linearize_fn terrain param). The rollout must
    run finite on terrain, DIFFER from the flat-model rollout (the terrain
    actually reaches the solver), and stay chunk-equivalent."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime

    cfg = config.test_default().replace(terrain=True, crucial=False,
                                        terrain_z_scale=0.05)
    mc = trot.MPCConfig(horizon=6, n_iter=1, model_substeps=2,
                        linearize_chunk=1, n_alphas=4, linearizer="frozen")
    cmd = jnp.array([0.5, 0.0, 0.0])
    key = jax.random.PRNGKey(0)
    # 40 steps: at this spawn the local ground sits ~3 cm below z=0, so
    # the flat and oracle models only predict different contact once the
    # settling robot nears ground (~25 steps in); shorter rollouts see
    # zero contact in BOTH models and bit-identical plans (measured)
    n = 40
    oracle = runtime.wb_mpc_rollout(cfg, mc, cmd, key, n,
                                    terrain_model=True)
    assert np.isfinite(np.asarray(oracle.solve_cost)).all()
    flat_model = runtime.wb_mpc_rollout(cfg, mc, cmd, key, n)
    assert np.abs(np.asarray(oracle.action)
                  - np.asarray(flat_model.action)).max() > 1e-6
    chunked = runtime.wb_mpc_rollout_chunked(cfg, mc, cmd, key, n, chunk=17,
                                             terrain_model=True)
    np.testing.assert_array_equal(np.asarray(oracle.gc), chunked.gc)


def test_frozen_linearizer_jacobian_accuracy(trot_setup):
    """Frozen-operator Jacobians (mpc/linearize.py) vs central FD of the TRUE
    control-step dynamics at a stance state: the surrogate freezes only the
    smooth O(v^2)/O(g) operators, so its A,B must track the stiff
    contact/PD-dominated true Jacobians closely."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import linearize

    cfg, mpc_cfg, params = trot_setup
    lin = linearize.make_frozen_linearizer(cfg, mpc_cfg, params)
    true_step = trot.make_dynamics(cfg, mpc_cfg, params)

    # stance state with a slight crouch + nonzero joint velocities
    x = trot.standing_x0(cfg)
    x = x.at[2].add(-0.01).at[19 + 6 :].add(0.3)
    u = 0.05 * jnp.sin(jnp.arange(12.0))

    A_s, B_s = jax.jit(lin)(x[None], u[None])
    A_s, B_s = np.asarray(A_s[0]), np.asarray(B_s[0])

    eps = 3e-4
    n, m = 37, 12
    eye = np.eye(n + m)

    @jax.jit
    def fd_all(cols):
        def one(col, sign):
            return true_step(x + sign * eps * col[:n],
                             u + sign * eps * col[n:], 0)
        fp = jax.vmap(lambda c: one(c, 1.0))(cols)
        fm = jax.vmap(lambda c: one(c, -1.0))(cols)
        return (fp - fm) / (2 * eps)

    J_true = np.asarray(fd_all(jnp.asarray(eye))).T  # (n, n+m)
    A_t, B_t = J_true[:, :n], J_true[:, n:]

    # B (actuation Jacobian) is PD-dominated -> near-exact
    assert np.linalg.norm(B_s - B_t) / np.linalg.norm(B_t) < 0.05
    # A: the deviation is only the frozen Coriolis/M^-1 variation
    assert np.linalg.norm(A_s - A_t) / np.linalg.norm(A_t) < 0.15


def test_trot_frozen_linearizer_solver_parity(trot_setup):
    """solve_batch_lanes with linearizer='frozen' descends to costs on par
    with the FD linearizer (rollouts are exact in both; only the Jacobian
    operator differs)."""
    import dataclasses

    cfg, mpc_cfg, params = trot_setup
    # 8 iterations: at 6 the FD path is still ~0.4/iter from its optimum on
    # the cmd-0.5 problem (round-3 trace: 8.78 at iter 6 -> 8.40 at iter 8
    # vs frozen's ~8.0) and the comparison measures transient, not solution
    mpc_cfg = dataclasses.replace(mpc_cfg, n_iter=8)
    B = 2
    cmds = jnp.stack([jnp.array([v, 0.0, 0.0]) for v in (0.5, 1.5)])
    probs = jax.vmap(lambda c: trot.make_problem(
        cfg, trot.standing_x0(cfg)[:19], jnp.zeros(18), c, jnp.asarray(0.0),
        mpc_cfg.horizon))(cmds)

    fd_res = jax.jit(
        lambda pr: trot.solve_batch_lanes(cfg, mpc_cfg, params, pr))(probs)
    fz_cfg = dataclasses.replace(mpc_cfg, linearizer="frozen")
    fz_res = jax.jit(
        lambda pr: trot.solve_batch_lanes(cfg, fz_cfg, params, pr))(probs)

    assert np.all(np.isfinite(np.asarray(fz_res.cost)))
    tr_ = np.asarray(fz_res.cost_trace)
    assert np.all(tr_[:, -1] <= tr_[:, 0] + 1e-6)  # descends
    # within 10% of the FD-linearized solution cost
    np.testing.assert_allclose(np.asarray(fz_res.cost),
                               np.asarray(fd_res.cost), rtol=0.10)


def test_trot_problem_terminal_ref_is_knot_T(trot_setup):
    # regression for the one-knot-stale terminal reference: joint_ref_T must
    # be the gait reference evaluated at t0 + T*dt, not joint_refs[-1] (knot
    # T-1) — mpc/trot.make_problem
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import gait

    cfg, mpc_cfg, _ = trot_setup
    T = mpc_cfg.horizon
    cmd = jnp.array([1.0, 0.0, 0.0])
    prob = trot.make_problem(cfg, trot.standing_x0(cfg)[:19], jnp.zeros(18),
                             cmd, jnp.asarray(0.0), T)
    expect = gait.gait_reference(cfg, cmd, jnp.asarray(T * cfg.control_dt))
    np.testing.assert_allclose(np.asarray(prob.joint_ref_T),
                               np.asarray(expect.joint_ref), atol=1e-6)
    assert not np.allclose(np.asarray(prob.joint_ref_T),
                           np.asarray(prob.joint_refs[-1]))


def test_raibert_shift_is_continuous_endpoint_shift(trot_setup):
    """make_problem's Raibert xy_shift must be the CONTINUOUS
    Bezier-endpoint form (gait.raibert_weight): full shift exactly at
    touchdown, zero at lift-off, and — the property both earlier forms
    violated (docs/evidence/wb_push_r4.md) — no reference jumps: the
    shift-induced per-knot delta must stay bounded by the smooth ramp, so
    finite-difference joint_dot_refs carry no mask-flip spikes."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import gait

    cfg, mpc_cfg, params = trot_setup
    # weight endpoints: touchdown (phase=0) -> 1, lift-off (phase=lam) -> 0
    w_td = np.asarray(gait.raibert_weight(
        cfg, jnp.asarray(-cfg.phase_offsets[0] * cfg.period)))
    w_lo = np.asarray(gait.raibert_weight(
        cfg, jnp.asarray((cfg.lam - cfg.phase_offsets[0]) * cfg.period)))
    np.testing.assert_allclose(w_td[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(w_lo[0], 0.0, atol=1e-6)
    # continuity on a fine grid: weight changes O(dt), never O(1)
    ts = jnp.arange(400) * (cfg.period / 200.0)
    ws = np.asarray(jax.vmap(lambda t: gait.raibert_weight(cfg, t))(ts))
    assert np.abs(np.diff(ws, axis=0)).max() < 0.05

    x0 = trot.standing_x0(cfg)
    args = (cfg, x0[:19], jnp.zeros(18), jnp.array([3.0, 0.0, 0.0]),
            jnp.asarray(0.0), mpc_cfg.horizon)
    base = trot.make_problem(*args)
    shifted = trot.make_problem(*args, xy_shift=jnp.array([0.05, 0.0]))
    delta = np.asarray(shifted.joint_refs - base.joint_refs)
    assert np.abs(delta).max() > 1e-3             # the shift is live
    # the shift-induced extra velocity reference is bounded by the smooth
    # ramp — well below the full delta_q/dt spike a binary mask flip
    # injects (the round-4 failure mode)
    jd_extra = np.abs(np.asarray(shifted.joint_dot_refs
                                 - base.joint_dot_refs))
    mask_spike_scale = np.abs(delta).max() / cfg.control_dt
    assert jd_extra.max() < 0.5 * mask_spike_scale
