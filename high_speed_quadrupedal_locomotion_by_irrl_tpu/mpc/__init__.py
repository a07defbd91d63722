from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import ilqr, cost, trot  # noqa: F401
