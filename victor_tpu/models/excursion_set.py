"""Excursion-set model hooks consumed by the theory core.

Thin indirection so `ccf_theory` has no import-time dependency on the ESM
pipeline (victor_tpu/models/esm.py, the JAX re-design of
victor/excursion_set_profile.py).
"""

from .esm import esm_delta_profiles, esm_velocity_terms, esm_s8z  # noqa: F401
