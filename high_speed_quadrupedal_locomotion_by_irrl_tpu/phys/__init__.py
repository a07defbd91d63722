from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import spatial, model, dynamics, contact, terrain  # noqa: F401
