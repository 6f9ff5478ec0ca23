"""Legendre multipole <-> f(r, mu) transforms (victor/utils.py:9-95 parity).

Host-side numpy utilities used at data-preparation time; the hot-path
equivalents live in `victor_tpu.ops` as precomputed projection matrices.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np

from ..errors import InputError
from ..ops.legendre import legendre_p
from ..ops.integrate import trapz_weights


def multipoles_from_fn(fn: Callable, r: np.ndarray,
                       ell: Sequence[int] = (0,), npts: int = 200,
                       mu_range: str = 'full') -> Dict[str, np.ndarray]:
    """Legendre multipoles of a callable f(r, mu) via trapezoid quadrature.

    Matches the reference (victor/utils.py:9-58): `mu_range='full'` integrates
    mu in [-1, 1] with factor (2l+1)/2; 'positive' integrates [0, 1] with
    factor (2l+1) (valid when f is even in mu, as for the CCF).
    """
    ell = np.atleast_1d(ell)
    if mu_range == 'full':
        mu = np.linspace(-1.0, 1.0, npts)
        factors = (2 * ell + 1) / 2.0
    elif mu_range == 'positive':
        mu = np.linspace(0.0, 1.0, npts)
        factors = (2 * ell + 1).astype(float)
    else:
        raise InputError(f"mu_range must be 'full' or 'positive', got {mu_range!r}")
    w = trapz_weights(mu)
    r = np.atleast_1d(r)
    out = {}
    for i, l in enumerate(ell):
        lw = factors[i] * w * np.asarray(legendre_p(int(l), mu))
        vals = np.empty(len(r))
        for j, rj in enumerate(r):
            vals[j] = np.dot(np.asarray(fn(rj, mu)).reshape(-1), lw)
        out[f'{int(l)}'] = vals
    return out


def fn_from_multipoles(r: np.ndarray, ell: Sequence[int],
                       multipoles: np.ndarray):
    """Rebuild f(r, mu) from multipole arrays (victor/utils.py:60-95).

    `multipoles` is (n_ell, n_r) stacked in the order of `ell`. Returns a
    callable f(r, mu) using cubic-spline radial interpolation of each
    multipole, summed against Legendre polynomials.
    """
    from scipy.interpolate import InterpolatedUnivariateSpline as IUS
    ell = [int(l) for l in np.atleast_1d(ell)]
    multipoles = np.atleast_2d(multipoles)
    if multipoles.shape[0] != len(ell):
        raise InputError(
            f'multipoles shape {multipoles.shape} does not match {len(ell)} ells')
    splines = [IUS(r, multipoles[i], k=3, ext=3) for i in range(len(ell))]

    def fn(rr, mu):
        rr = np.atleast_1d(rr)
        mu = np.atleast_1d(mu)
        out = np.zeros((len(rr), len(mu)))
        for i, l in enumerate(ell):
            out += splines[i](rr)[:, None] * np.asarray(legendre_p(l, mu))[None, :]
        return np.squeeze(out)

    return fn
