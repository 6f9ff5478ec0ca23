"""Compatibility shims that let the reference implementation (at /root/reference)
run under the modern environment in this image, purely for baseline measurement and
golden-fixture generation.

The reference depends on:
  * astropy.cosmology.LambdaCDM  (astropy not installed) -> minimal stand-in
  * scipy.integrate.simps        (removed in scipy>=1.14) -> old `even='avg'` behaviour
  * scipy.interpolate.interp2d   (removed in scipy>=1.14) -> RectBivariateSpline wrapper

Nothing here is shipped as part of the framework; it exists so we can (a) time the
reference on this machine (BASELINE.md denominator) and (b) generate regression
fixtures for parity tests.
"""

import sys
import types
import numpy as np


# ---------------------------------------------------------------------------
# astropy.cosmology.LambdaCDM stand-in (no radiation, exactly what the reference
# constructs at victor/cosmology.py:33: LambdaCDM(H0, Om0, Ode0))
# ---------------------------------------------------------------------------
class _Quantity:
    def __init__(self, value):
        self.value = np.asarray(value, dtype=float) if np.ndim(value) else float(value)


class _LambdaCDM:
    def __init__(self, H0, Om0, Ode0):
        self.H0 = float(H0)
        self.Om0 = float(Om0)
        self.Ode0 = float(Ode0)
        self.Ok0 = 1.0 - Om0 - Ode0
        self._c = 299792.458  # km/s

    def efunc(self, z):
        z = np.asarray(z, dtype=float)
        return np.sqrt(self.Om0 * (1 + z) ** 3 + self.Ok0 * (1 + z) ** 2 + self.Ode0)

    def H(self, z):
        return _Quantity(self.H0 * self.efunc(z))

    def Om(self, z):
        z = np.asarray(z, dtype=float)
        return self.Om0 * (1 + z) ** 3 / self.efunc(z) ** 2

    def comoving_distance(self, z):
        from scipy.integrate import quad
        zs = np.atleast_1d(np.asarray(z, dtype=float))
        d = np.array([quad(lambda zz: 1.0 / self.efunc(zz), 0.0, z_i)[0] for z_i in zs])
        d *= self._c / self.H0
        return _Quantity(d[0] if np.ndim(z) == 0 else d)

    def comoving_transverse_distance(self, z):
        dc = np.atleast_1d(self.comoving_distance(z).value)
        if abs(self.Ok0) < 1e-12:
            dm = dc
        else:
            dh = self._c / self.H0
            sqrt_ok = np.sqrt(abs(self.Ok0))
            if self.Ok0 > 0:
                dm = dh / sqrt_ok * np.sinh(sqrt_ok * dc / dh)
            else:
                dm = dh / sqrt_ok * np.sin(sqrt_ok * dc / dh)
        return _Quantity(dm[0] if np.ndim(z) == 0 else dm)


def _install_astropy_shim():
    if 'astropy' in sys.modules:
        return
    astropy = types.ModuleType('astropy')
    cosmo_mod = types.ModuleType('astropy.cosmology')
    cosmo_mod.LambdaCDM = _LambdaCDM
    astropy.cosmology = cosmo_mod
    sys.modules['astropy'] = astropy
    sys.modules['astropy.cosmology'] = cosmo_mod


# ---------------------------------------------------------------------------
# old scipy.integrate.simps (default even='avg')
# ---------------------------------------------------------------------------
def _basic_simpson(y, start, stop, x, dx, axis):
    nd = len(y.shape)
    if start is None:
        start = 0
    step = 2
    slice_all = (slice(None),) * nd
    sl0 = tuple(slice_all[:axis] + (slice(start, stop, step),) + slice_all[axis + 1:])
    sl1 = tuple(slice_all[:axis] + (slice(start + 1, stop + 1, step),) + slice_all[axis + 1:])
    sl2 = tuple(slice_all[:axis] + (slice(start + 2, stop + 2, step),) + slice_all[axis + 1:])
    if x is None:
        result = np.sum(y[sl0] + 4 * y[sl1] + y[sl2], axis=axis) * (dx / 3.0)
    else:
        h = np.diff(x, axis=axis)
        sl_h0 = tuple(slice_all[:axis] + (slice(start, stop, step),) + slice_all[axis + 1:])
        sl_h1 = tuple(slice_all[:axis] + (slice(start + 1, stop + 1, step),) + slice_all[axis + 1:])
        h0 = h[sl_h0]
        h1 = h[sl_h1]
        hsum = h0 + h1
        hprod = h0 * h1
        h0divh1 = h0 / h1
        tmp = hsum / 6.0 * (y[sl0] * (2 - 1.0 / h0divh1) +
                            y[sl1] * hsum * hsum / hprod +
                            y[sl2] * (2 - h0divh1))
        result = np.sum(tmp, axis=axis)
    return result


def simps(y, x=None, dx=1.0, axis=-1, even='avg'):
    """Reimplementation of scipy<1.14 ``simps`` with the old default even='avg'."""
    y = np.asarray(y)
    nd = len(y.shape)
    axis = axis % nd
    N = y.shape[axis]
    if x is not None:
        x = np.asarray(x)
        if x.ndim == 1:
            shape = [1] * nd
            shape[axis] = N
            x = x.reshape(shape)
    slice_all = (slice(None),) * nd
    if N % 2 == 0:
        val = 0.0
        result = 0.0
        # trapz on last interval + simpson on first N-1 points
        sl_last0 = tuple(slice_all[:axis] + (-1,) + slice_all[axis + 1:])
        sl_last1 = tuple(slice_all[:axis] + (-2,) + slice_all[axis + 1:])
        if x is not None:
            last_dx = (x[sl_last0] - x[sl_last1])
        else:
            last_dx = dx
        val += 0.5 * last_dx * (y[sl_last0] + y[sl_last1])
        result = _basic_simpson(y, 0, N - 3, x, dx, axis)
        # trapz on first interval + simpson on last N-1 points
        sl_first0 = tuple(slice_all[:axis] + (0,) + slice_all[axis + 1:])
        sl_first1 = tuple(slice_all[:axis] + (1,) + slice_all[axis + 1:])
        if x is not None:
            first_dx = (x[sl_first1] - x[sl_first0])
        else:
            first_dx = dx
        val += 0.5 * first_dx * (y[sl_first1] + y[sl_first0])
        result += _basic_simpson(y, 1, N - 2, x, dx, axis)
        result = (result + val) * 0.5
    else:
        result = _basic_simpson(y, 0, N - 2, x, dx, axis)
    return result


# ---------------------------------------------------------------------------
# old scipy.interpolate.interp2d for regular-grid data (cubic / linear)
# ---------------------------------------------------------------------------
class interp2d:
    def __init__(self, x, y, z, kind='linear'):
        from scipy.interpolate import RectBivariateSpline
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        z = np.asarray(z, dtype=float)
        # old interp2d convention: z.shape == (len(y), len(x))
        k = 3 if kind == 'cubic' else 1
        self._spl = RectBivariateSpline(x, y, z.T, kx=k, ky=k, s=0)

    def __call__(self, xnew, ynew):
        xnew = np.atleast_1d(np.asarray(xnew, dtype=float))
        ynew = np.atleast_1d(np.asarray(ynew, dtype=float))
        return self._spl(xnew, ynew).T


def _install_scipy_shims():
    import scipy.integrate as _si
    import scipy.interpolate as _sip
    # modern scipy ships stubs that raise NotImplementedError -> always override
    _si.simps = simps
    _sip.interp2d = interp2d


def install(reference_path='/root/reference'):
    """Install all shims and put the reference package on sys.path."""
    _install_astropy_shim()
    _install_scipy_shims()
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
