from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther, vec  # noqa: F401
