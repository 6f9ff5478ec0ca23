"""Legendre polynomials P_ell(mu) for the even multipoles used in CCF analysis.

Closed forms (replacing scipy.special.legendre at victor/ccf_model.py:683 and
victor/utils.py:53); works on numpy or jax arrays.
"""

from __future__ import annotations


def legendre_p(ell: int, mu):
    mu2 = mu * mu
    if ell == 0:
        return mu * 0 + 1.0
    if ell == 1:
        return mu
    if ell == 2:
        return 1.5 * mu2 - 0.5
    if ell == 3:
        return (5.0 * mu2 - 3.0) * mu / 2.0
    if ell == 4:
        return ((35.0 * mu2 - 30.0) * mu2 + 3.0) / 8.0
    if ell == 6:
        return ((231.0 * mu2 - 315.0) * mu2 + 105.0) * mu2 / 16.0 - 5.0 / 16.0
    raise NotImplementedError(f'Legendre P_{ell} not implemented')
