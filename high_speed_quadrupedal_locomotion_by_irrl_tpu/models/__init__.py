from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm, io  # noqa: F401
