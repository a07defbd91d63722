from high_speed_quadrupedal_locomotion_by_irrl_tpu.parallel import mesh, train  # noqa: F401
