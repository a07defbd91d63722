from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import gae, ppo  # noqa: F401
