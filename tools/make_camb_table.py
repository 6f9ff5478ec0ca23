#!/usr/bin/env python
"""Generate linear P(k, z=0) tables for victor_tpu's excursion-set model.

CAMB is host-only Fortran and cannot run inside a jitted computation, so the
framework ingests pregenerated tables produced by this script:

* **Single table** (`matter_ccf.excursion_set_options.pk_table_file`) —
  mirrors the reference's CAMB branch (victor/excursion_set_profile.py:63-104)
  at fixed cosmology; only `sigma_8_0` can vary in a chain. Output: .npz with
  k [h/Mpc], pk0 [(Mpc/h)^3 at z=0], sigma8_0, sigma8_z.

* **Cosmology grid** (`--grid name=v1,v2,... , pk_grid_file`) — the
  varying-cosmology mode: P(k) tables at every point of a small grid over
  named cosmology axes (H0 / Omega_m / Omega_b / ns — the parameter names the
  sampler uses), multilinearly interpolated in log P(k) ON DEVICE per
  likelihood call (models/esm.py:_esm_grid_interp). This is the
  device-evaluable analogue of the reference's per-cosmology-tuple
  `lru_cache` CAMB rebuild (victor/excursion_set_profile.py:84-104): a chain
  can sample shape-cosmology parameters with generator-grade P(k). Output:
  .npz with k, axis_names, grid_<name> per axis, logpk0 (*shape, nk),
  sigma8_0 (*shape), sigma8_z (*shape), z.

`--generator eh` computes the tables from the Eisenstein-Hu fitting formula
instead of CAMB (no camb dependency): numerically pointless for production
(EH mode already evaluates on device) but the validation backbone — a chain
through an EH-generated grid must reproduce the direct EH-mode posterior up
to interpolation error, isolating the grid machinery from the generator
(tests/test_esm_camb_grid.py pins this at table level; BASELINE.md round 5
at posterior level).

Usage:
    python tools/make_camb_table.py --h 0.675 --omega-m 0.31 --omega-b 0.048 \
        --z 0.57 --ns 0.96 --mnu 0.06 --out data/camb_pk_table.npz
    python tools/make_camb_table.py --z 0.57 \
        --grid H0=65,67.5,70 --grid Omega_m=0.27,0.31,0.35 \
        --grid Omega_b=0.044,0.048,0.052 --grid ns=0.92,0.96,1.0 \
        --out data/camb_pk_grid.npz      # 81 CAMB calls
"""

import argparse
import itertools
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AXIS_NAMES = ('H0', 'Omega_m', 'Omega_b', 'ns')


def _pk_camb(h, omega_m, omega_b, ns, mnu, z, kmax, npts, accuracy):
    import camb
    pars = camb.CAMBparams()
    pars.set_accuracy(AccuracyBoost=accuracy)
    omch2 = (omega_m - omega_b) * h ** 2
    ombh2 = omega_b * h ** 2
    pars.set_cosmology(H0=100 * h, ombh2=ombh2, omch2=omch2, mnu=mnu, omk=0)
    pars.InitPower.set_params(As=2e-9, ns=ns, r=0)
    redshifts = [z, 0.0] if z > 0 else [0.0]
    pars.set_matter_power(redshifts=redshifts, kmax=kmax)
    pars.NonLinear = camb.model.NonLinear_none
    results = camb.get_results(pars)
    if z > 0:
        sigma8_z, sigma8_0 = results.get_sigma8()
    else:
        sigma8_0 = results.get_sigma8()[0]
        sigma8_z = sigma8_0
    pk = camb.get_matter_power_interpolator(pars, nonlinear=False)
    k = np.logspace(-4, np.log10(kmax), npts)
    return k, pk.P(0.0, k), float(sigma8_0), float(sigma8_z)


def _pk_eh(h, omega_m, omega_b, ns, mnu, z, kmax, npts, accuracy):
    """Eisenstein-Hu stand-in generator (same table contract as CAMB):
    sigma8_z uses the closed-form LCDM growth, matching what EH mode
    computes on device — so an EH-generated grid reproduces EH mode exactly
    at grid points."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

    from victor_tpu.models.eisenstein_hu import (eisenstein_hu_params,
                                                 power_eh, sigma80)
    from victor_tpu.ops.special import growth_factor_lcdm
    p = eisenstein_hu_params(h, omega_m, omega_b, ns=ns, As=2e-9)
    k = np.logspace(-4, np.log10(kmax), npts)
    pk0 = np.asarray(power_eh(p, k), dtype=np.float64)
    s80 = float(sigma80(p))
    s8z = s80 * float(growth_factor_lcdm(z, omega_m, 1.0 - omega_m))
    return k, pk0, s80, s8z


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--h', type=float, default=0.675)
    p.add_argument('--omega-m', type=float, default=0.31)
    p.add_argument('--omega-b', type=float, default=0.048)
    p.add_argument('--z', type=float, default=0.0, help='redshift for sigma8_z')
    p.add_argument('--ns', type=float, default=0.96)
    p.add_argument('--mnu', type=float, default=0.06)
    p.add_argument('--accuracy', type=float, default=1.0)
    p.add_argument('--kmax', type=float, default=2.0)
    p.add_argument('--npts', type=int, default=200)
    p.add_argument('--grid', action='append', default=[],
                   metavar='name=v1,v2,...',
                   help=f'cosmology grid axis (one of {AXIS_NAMES}); repeat '
                        'per axis. With any --grid, writes the grid format '
                        '(pk_grid_file); axes not listed stay at their '
                        'scalar flag values')
    p.add_argument('--generator', choices=['camb', 'eh'], default='camb',
                   help='eh = Eisenstein-Hu stand-in (no camb dependency; '
                        'the validation generator — see module docstring)')
    p.add_argument('--out', required=True)
    args = p.parse_args()

    if args.generator == 'camb':
        try:
            import camb                                        # noqa: F401
        except ImportError:
            sys.exit('camb is not installed; install it (pip install camb) '
                     'to generate tables, use --generator eh for the '
                     'validation stand-in, or use use_eisenstein_hu: True')
    gen = _pk_camb if args.generator == 'camb' else _pk_eh

    base = {'H0': 100 * args.h, 'Omega_m': args.omega_m,
            'Omega_b': args.omega_b, 'ns': args.ns}
    common = dict(mnu=args.mnu, z=args.z, kmax=args.kmax, npts=args.npts,
                  accuracy=args.accuracy)

    if not args.grid:
        k, pk0, s80, s8z = gen(args.h, args.omega_m, args.omega_b, args.ns,
                               **common)
        np.savez(args.out, k=k, pk0=pk0, sigma8_0=s80, sigma8_z=s8z,
                 h=args.h, omega_m=args.omega_m, omega_b=args.omega_b,
                 ns=args.ns, mnu=args.mnu, z=args.z)
        print(f'wrote {args.out}: sigma8(0)={s80:.5f} '
              f'sigma8(z={args.z})={s8z:.5f}')
        return

    names, axes = [], []
    for spec in args.grid:
        name, _, vals = spec.partition('=')
        if name not in AXIS_NAMES:
            sys.exit(f'--grid axis {name!r} must be one of {AXIS_NAMES} '
                     '(the sampler parameter names)')
        grid = np.asarray([float(v) for v in vals.split(',')])
        if len(grid) < 1 or (len(grid) > 1 and not np.all(np.diff(grid) > 0)):
            sys.exit(f'--grid {name}: values must be strictly increasing')
        names.append(name)
        axes.append(grid)
    shape = tuple(len(a) for a in axes)
    logpk = np.empty(shape + (args.npts,))
    s80g = np.empty(shape)
    s8zg = np.empty(shape)
    k = None
    for idx in itertools.product(*(range(n) for n in shape)):
        pt = dict(base)
        pt.update({n: axes[a][idx[a]] for a, n in enumerate(names)})
        k, pk0, s80, s8z = gen(pt['H0'] / 100.0, pt['Omega_m'],
                               pt['Omega_b'], pt['ns'], **common)
        logpk[idx] = np.log(pk0)
        s80g[idx] = s80
        s8zg[idx] = s8z
    out = {'k': k, 'axis_names': np.asarray(names), 'logpk0': logpk,
           'sigma8_0': s80g, 'sigma8_z': s8zg, 'z': args.z,
           'mnu': args.mnu, 'generator': args.generator}
    for n, a in zip(names, axes):
        out[f'grid_{n}'] = a
    np.savez(args.out, **out)
    print(f'wrote {args.out}: {len(names)}-axis grid {shape} '
          f'({int(np.prod(shape))} {args.generator} tables), '
          f'sigma8(0) range [{s80g.min():.5f}, {s80g.max():.5f}]')


if __name__ == '__main__':
    main()
