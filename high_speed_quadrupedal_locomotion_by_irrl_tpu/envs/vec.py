"""Vectorized environment API.

``VecEnv`` is the jit/vmap-native interface (state-in/state-out pytrees) used
by the PPO and MPC layers; ``NumpyVecEnv`` is a drop-in host-side adapter with
the reference's ``RaisimGymVecEnv`` surface (step/observe/reset + episode
info dicts + batched introspection getters, RaisimGymVecEnv.py:6-189) for
users migrating from the reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl


class VecEnv:
    """Batched BlackPanther MDP. All methods are jitted and vmapped."""

    def __init__(self, cfg: EnvConfig, ref_table=None):
        self.cfg = cfg
        self.num_envs = cfg.num_envs
        self.ob_dim = bp.OBS_DIM
        self.act_dim = bp.ACT_DIM
        rt = None if ref_table is None else jnp.asarray(ref_table, jnp.float32)
        self._init = jax.jit(jax.vmap(lambda k: bp.env_init(cfg, k, rt)))
        self._step = jax.jit(jax.vmap(lambda s, a: bp.step(cfg, s, a, rt)))
        self._reset = jax.jit(jax.vmap(lambda s: bp.reset(cfg, s, rt)))
        self._observe = jax.jit(jax.vmap(functools.partial(bp.observe, cfg)))

    def init(self, key: jax.Array | int | None = None) -> bp.EnvState:
        if key is None or isinstance(key, int):
            key = jax.random.PRNGKey(self.cfg.seed if key is None else key)
        # per-env seed = base + i (VectorizedEnvironment.hpp:308-312 spirit)
        return self._init(jax.random.split(key, self.num_envs))

    def step(self, state: bp.EnvState, action: jnp.ndarray) -> bp.StepOut:
        return self._step(state, action)

    def reset(self, state: bp.EnvState) -> bp.EnvState:
        return self._reset(state)

    def observe(self, state: bp.EnvState) -> jnp.ndarray:
        return self._observe(state)


class NumpyVecEnv:
    """RaisimGymVecEnv-compatible host adapter (numpy in/out).

    Keeps the per-env episode-reward bookkeeping and ``{"r", "l"}`` info dicts
    of the reference adapter (RaisimGymVecEnv.py:42-50).
    """

    def __init__(self, cfg: EnvConfig, seed: int | None = None):
        self.env = VecEnv(cfg)
        self.cfg = cfg
        self.num_envs = cfg.num_envs
        self.num_obs = bp.OBS_DIM
        self.num_acts = bp.ACT_DIM
        self.state = self.env.init(seed)
        self._ep_rewards = [[] for _ in range(self.num_envs)]

    def seed(self, seed: int) -> None:
        self.state = self.env.init(seed)

    def observe(self) -> np.ndarray:
        return np.asarray(self.env.observe(self.state))

    def reset(self) -> np.ndarray:
        self.state = self.env.reset(self.state)
        return self.observe()

    def reset_and_update_info(self):
        return self.reset(), self._update_epi_info()

    def _update_epi_info(self):
        info = [{} for _ in range(self.num_envs)]
        for i in range(self.num_envs):
            eprew = sum(self._ep_rewards[i])
            info[i]["episode"] = {"r": eprew, "l": len(self._ep_rewards[i])}
            self._ep_rewards[i].clear()
        return info

    def step(self, action: np.ndarray, visualize: bool = False):
        out = self.env.step(self.state, jnp.asarray(action))
        self.state = out.state
        if getattr(self, "_video_gc", None) is not None:
            self._video_gc.append(np.asarray(out.state.gc[0]))
        reward = np.asarray(out.reward)
        done = np.asarray(out.done)
        info = [{} for _ in range(self.num_envs)]
        terms = np.asarray(out.info["reward_terms"])
        for i in range(self.num_envs):
            self._ep_rewards[i].append(float(reward[i]))
            info[i]["extra_info"] = {
                "EndEffectorReward(0.15)": terms[i, 0],
                "Height_Keep_Reward(0.1)": terms[i, 1],
                "Balance_Keep_Reward(0.1)": terms[i, 2],
                "base height": float(np.asarray(out.info["base_height"])[i]),
                "JointReward(0.65)": terms[i, 3] + terms[i, 4],
                "VelocityReward(0.2)": terms[i, 5],
            }
            if done[i]:
                info[i]["episode"] = {"r": sum(self._ep_rewards[i]),
                                      "l": len(self._ep_rewards[i])}
                self._ep_rewards[i].clear()
        return np.asarray(out.obs), reward, done, info

    # --- introspection passthroughs (RaisimGymVecEnv.py:54-93) ---------------
    def origin_state(self) -> np.ndarray:
        return np.asarray(jax.vmap(bp.origin_state)(self.state))

    def reference_state(self) -> np.ndarray:
        return np.asarray(jax.vmap(bp.reference_state)(self.state))

    def get_joint_effort(self) -> np.ndarray:
        return np.asarray(jax.vmap(bp.joint_effort)(self.state))

    def get_generalized_force(self) -> np.ndarray:
        return np.asarray(jax.vmap(bp.generalized_force)(self.state))

    def get_sphere_info(self) -> np.ndarray:
        """Attack-sphere state (GetSphereInfo parity; requires Crutial)."""
        assert self.cfg.crucial, "Please make sure the [Flag_Crutial] is True"
        return np.asarray(jax.vmap(bp.sphere_info)(self.state))

    # --- host-side stubs for the reference's visualization controls ----------
    def show_window(self):
        pass

    def hide_window(self):
        pass

    def start_recording_video(self, name: str = ""):
        """Begin capturing env-0 states each step; stop_recording_video
        renders them with the same writer behind `cli/test --vid`
        (analysis/figures.rollout_animation). Mirrors the reference's
        startRecordingVideo(name) which records env 0's render window
        (RaisimGymEnv.hpp:88-94, RaisimGymVecEnv.py:121-125)."""
        self._video_path = name or "video.gif"
        self._video_gc = []

    def stop_recording_video(self):
        gcs = getattr(self, "_video_gc", None)
        self._video_gc = None
        if gcs:
            import types

            from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import (
                figures,
            )
            figures.rollout_animation(
                types.SimpleNamespace(gc=np.stack(gcs)), self._video_path)

    def curriculum_update(self):
        pass

    def get_inverse_mass_matrix(self) -> np.ndarray:
        return np.asarray(jax.vmap(bp.inverse_mass_matrix)(self.state)).reshape(self.num_envs, -1)

    def get_nonlinear(self) -> np.ndarray:
        return np.asarray(jax.vmap(bp.nonlinear)(self.state))

    def set_contact_coefficient(self, coeff) -> None:
        """SetContactCoefficient parity: [friction, restitution, threshold]
        (Environment.hpp:1407-1418). All three are LIVE: restitution re-maps
        the compliant damping (phys/model.damping_for_restitution) and sets
        the hard solver's bounce rows; the threshold gates the hard-path
        bounce (the compliant surrogate maps e alone — documented
        approximation)."""
        friction = jnp.full((self.num_envs,), float(coeff[0]))
        restitution = jnp.full((self.num_envs,), float(coeff[1]))
        threshold = jnp.full((self.num_envs,), float(coeff[2]))
        damping = mdl.damping_for_restitution(
            self.state.params.contact_stiffness,
            jnp.full((self.num_envs,), float(self.cfg.contact_damping)),
            restitution)
        params = self.state.params._replace(
            friction=friction, restitution=restitution,
            res_threshold=threshold, contact_damping=damping)
        self.state = self.state._replace(params=params)

    def set_command(self, command) -> None:
        """Manual-mode command injection (run_bp_v5.py:408-409 path)."""
        cmd = jnp.tile(jnp.asarray(command, dtype=jnp.float32), (self.num_envs, 1))
        self.state = self.state._replace(command=cmd, command_filtered=cmd)
