from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import rotation, filters, delay  # noqa: F401
