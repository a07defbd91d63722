from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as evaluation  # noqa: F401
