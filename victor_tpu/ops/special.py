"""Special functions needed on device.

The only nontrivial one is the Gauss hypergeometric 2F1(5/6, 3/2; 11/6; x) for
x <= 0, which enters the closed-form LCDM linear growth factor
(victor/cosmology.py:234-242, victor/excursion_set_profile.py:106-119).
jax.scipy has no hyp2f1, so we evaluate Euler's integral representation

    2F1(a,b;c;z) = G(c)/(G(b)G(c-b)) * int_0^1 t^(b-1) (1-t)^(c-b-1) (1-zt)^(-a) dt

with the substitution t = 1 - (1 - w^2)^3, which simultaneously removes the
(1-t)^(-2/3) endpoint singularity (c-b = 1/3) and the sqrt(t) derivative
branch at t=0, leaving an analytic integrand handled exactly by fixed
Gauss-Legendre nodes. Accuracy vs scipy.special.hyp2f1: ~1e-13 over the
cosmologically relevant range z in [-50, 0].
"""

from __future__ import annotations

from math import gamma

import jax.numpy as jnp
import numpy as np

_A, _B, _C = 5.0 / 6.0, 3.0 / 2.0, 11.0 / 6.0
_PREFAC = gamma(_C) / (gamma(_B) * gamma(_C - _B))
_NODES, _WEIGHTS = np.polynomial.legendre.leggauss(64)
_U = 0.5 * (_NODES + 1.0)          # map to [0, 1]
_W = 0.5 * _WEIGHTS


def hyp2f1_growth(z):
    """2F1(5/6, 3/2; 11/6; z) for z <= 0 (scalar or array, jnp)."""
    z = jnp.asarray(z)
    u = jnp.asarray(_U)
    w = jnp.asarray(_W)
    t = 1.0 - (1.0 - u ** 2) ** 3                  # (64,)
    jac = 6.0 * u                                  # dt/du absorbing (1-t)^(-2/3)
    integrand = (jac * jnp.sqrt(t) *
                 (1.0 - z[..., None] * t) ** (-_A))  # (..., 64)
    integral = jnp.sum(w * integrand, axis=-1)
    return _PREFAC * integral


def growth_factor_lcdm(z, omega_m, omega_l):
    """Linear growth factor D(z) from the flat-LCDM hyp2f1 closed form.

    Same closed form as victor/cosmology.py:234-242, computed on device.
    D(0) = sqrt(omega_m + omega_l): exactly 1 only in the flat case — the
    closed form is the flat-LCDM growth solution, and a non-flat cosmology
    inherits its (reference-identical) bias through sigma8z/fsigma8.
    """
    az = 1.0 / (1.0 + z)
    num = az ** 2.5 * jnp.sqrt(omega_l + omega_m * az ** -3.0) * \
        hyp2f1_growth(-(omega_l * az ** 3.0) / omega_m)
    den = hyp2f1_growth(-omega_l / omega_m)
    return num / den
