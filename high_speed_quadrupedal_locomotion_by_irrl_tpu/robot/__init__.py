from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import kinematics, gait  # noqa: F401
