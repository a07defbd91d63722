from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import linalg, lstm_pallas  # noqa: F401
