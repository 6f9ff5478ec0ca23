#!/usr/bin/env python
"""Generate a CAMB linear P(k, z=0) table for victor_tpu's excursion-set model.

CAMB is host-only Fortran and cannot run inside a jitted computation, so for
`matter_ccf.excursion_set_options.use_eisenstein_hu: False` the framework
ingests a pregenerated table (`pk_table_file`) produced by this script —
mirroring the reference's CAMB branch (victor/excursion_set_profile.py:84-104)
at fixed cosmology. Output: .npz with k [h/Mpc], pk0 [(Mpc/h)^3 at z=0],
sigma8_0, sigma8_z.

Usage:
    python tools/make_camb_table.py --h 0.675 --omega-m 0.31 --omega-b 0.048 \
        --z 0.57 --ns 0.96 --mnu 0.06 --out data/camb_pk_table.npz
"""

import argparse
import sys

import numpy as np


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
    p.add_argument('--out', required=True)
    args = p.parse_args()

    try:
        import camb
    except ImportError:
        sys.exit('camb is not installed; install it (pip install camb) to '
                 'generate tables, or use use_eisenstein_hu: True')

    pars = camb.CAMBparams()
    pars.set_accuracy(AccuracyBoost=args.accuracy)
    omch2 = (args.omega_m - args.omega_b) * args.h ** 2
    ombh2 = args.omega_b * args.h ** 2
    pars.set_cosmology(H0=100 * args.h, ombh2=ombh2, omch2=omch2,
                       mnu=args.mnu, omk=0)
    pars.InitPower.set_params(As=2e-9, ns=args.ns, r=0)
    redshifts = [args.z, 0.0] if args.z > 0 else [0.0]
    pars.set_matter_power(redshifts=redshifts, kmax=args.kmax)
    pars.NonLinear = camb.model.NonLinear_none
    results = camb.get_results(pars)
    if args.z > 0:
        sigma8_z, sigma8_0 = results.get_sigma8()
    else:
        sigma8_0 = results.get_sigma8()[0]
        sigma8_z = sigma8_0
    pk = camb.get_matter_power_interpolator(pars, nonlinear=False)

    k = np.logspace(-4, np.log10(args.kmax), args.npts)
    pk0 = pk.P(0.0, k)
    np.savez(args.out, k=k, pk0=pk0, sigma8_0=sigma8_0, sigma8_z=sigma8_z,
             h=args.h, omega_m=args.omega_m, omega_b=args.omega_b,
             ns=args.ns, mnu=args.mnu, z=args.z)
    print(f'wrote {args.out}: sigma8(0)={sigma8_0:.5f} sigma8(z={args.z})={sigma8_z:.5f}')


if __name__ == '__main__':
    main()
