"""Excursion-set model hooks for the theory core (placeholder).

The full on-device excursion-set profile (reference:
victor/excursion_set_profile.py) lands with the `victor_tpu.models.esm`
module; these hooks wire it into `delta_profiles` / `velocity_terms`.
"""

from ..errors import InputError


def esm_delta_profiles(tables, spec, opts, params):
    raise NotImplementedError(
        'excursion_set matter model: on-device ESM pipeline not yet wired '
        'into the theory core')


def esm_velocity_terms(tables, spec, opts, params, growth_term, iaH_true,
                       delta_rv, delta_100):
    raise NotImplementedError(
        'nonlinear mean velocity model: on-device ESM pipeline not yet wired '
        'into the theory core')
