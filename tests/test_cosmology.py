"""Parity tests: BackgroundCosmology and EisensteinHu vs the reference."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
import refshim  # noqa: E402

refshim.install()

from victor_tpu.models.cosmology import BackgroundCosmology  # noqa: E402
from victor_tpu.models.eisenstein_hu import EisensteinHu  # noqa: E402


@pytest.fixture(scope='module')
def ref_cosmo():
    from victor.cosmology import BackgroundCosmology as RefCosmo
    return RefCosmo({'Omega_m': 0.31, 'sigma8': 0.81})


@pytest.fixture(scope='module')
def our_cosmo():
    return BackgroundCosmology({'Omega_m': 0.31, 'sigma8': 0.81})


ZS = np.array([0.1, 0.5, 0.57, 1.0, 2.0])


class TestBackgroundCosmology:
    def test_Ez(self, our_cosmo, ref_cosmo):
        np.testing.assert_allclose(our_cosmo.Ez(ZS), ref_cosmo.Ez(ZS), rtol=1e-12)

    def test_Om(self, our_cosmo, ref_cosmo):
        np.testing.assert_allclose(our_cosmo.Om(ZS), ref_cosmo.Om(ZS), rtol=1e-12)

    def test_comoving_distance(self, our_cosmo, ref_cosmo):
        for z in ZS:
            np.testing.assert_allclose(our_cosmo.comoving_distance(z),
                                       ref_cosmo.comoving_distance(z), rtol=1e-9)
            np.testing.assert_allclose(our_cosmo.comoving_distance(z, mpc_units=True),
                                       ref_cosmo.comoving_distance(z, mpc_units=True),
                                       rtol=1e-9)

    def test_distances_and_bao(self, our_cosmo, ref_cosmo):
        for z in [0.5, 1.0]:
            for name in ['comoving_transverse_distance', 'hubble_distance',
                         'angular_diameter_distance', 'F_AP', 'y',
                         'DH_over_rd', 'DM_over_rd', 'DA_over_rd',
                         'Hz_rd']:
                got = getattr(our_cosmo, name)(z)
                want = getattr(ref_cosmo, name)(z)
                np.testing.assert_allclose(got, want, rtol=1e-9, err_msg=name)

    def test_DV_over_rd_intended(self, our_cosmo, ref_cosmo):
        """D_V = (z DM^2 DH)^(1/3): the reference's precedence bug (cube root
        on DH only, victor/cosmology.py:188 — ref bug 8, SURVEY §2b) is fixed
        as intended, built here from the reference's own DM/DH/rd pieces."""
        for z in [0.5, 1.0]:
            dm = ref_cosmo.comoving_transverse_distance(z)
            dh = ref_cosmo.hubble_distance(z)
            intended = (z * dm ** 2 * dh) ** (1 / 3) / ref_cosmo.rd
            np.testing.assert_allclose(our_cosmo.DV_over_rd(z), intended,
                                       rtol=1e-9)
            # and the reference's value really is the buggy one
            buggy = z * dm ** 2 * dh ** (1 / 3) / ref_cosmo.rd
            np.testing.assert_allclose(ref_cosmo.DV_over_rd(z), buggy,
                                       rtol=1e-12)

    def test_growth(self, our_cosmo, ref_cosmo):
        np.testing.assert_allclose(our_cosmo.growth_factor(ZS),
                                   ref_cosmo.growth_factor(ZS), rtol=1e-12)
        np.testing.assert_allclose(our_cosmo.growth_rate(ZS),
                                   ref_cosmo.growth_rate(ZS), rtol=1e-12)
        np.testing.assert_allclose(our_cosmo.fsigma8(ZS),
                                   ref_cosmo.fsigma8(ZS), rtol=1e-12)

    def test_growth_traces_under_jit(self, our_cosmo, ref_cosmo):
        """growth_factor/sigma8z/fsigma8 run the on-device 2F1
        (ops/special.py) so they trace under jit and differentiate,
        matching scipy.special.hyp2f1 host values (ref cosmology.py:234-293)."""
        import jax
        got = jax.jit(lambda z: (our_cosmo.growth_factor(z),
                                 our_cosmo.sigma8z(z),
                                 our_cosmo.fsigma8(z)))(jnp.asarray(ZS))
        np.testing.assert_allclose(np.asarray(got[0]),
                                   ref_cosmo.growth_factor(ZS), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(got[2]),
                                   ref_cosmo.fsigma8(ZS), rtol=1e-10)
        g = jax.grad(lambda z: our_cosmo.fsigma8(z))(0.52)
        # finite-difference check of the gradient
        h = 1e-5
        fd = (our_cosmo.fsigma8(0.52 + h) - our_cosmo.fsigma8(0.52 - h)) / (2 * h)
        np.testing.assert_allclose(float(g), fd, rtol=1e-5)

    def test_nonflat(self):
        ours = BackgroundCosmology({'Omega_m': 0.31, 'Omega_K': 0.05})
        from victor.cosmology import BackgroundCosmology as RefCosmo
        theirs = RefCosmo({'Omega_m': 0.31, 'Omega_K': 0.05})
        for z in [0.5, 1.5]:
            np.testing.assert_allclose(ours.comoving_transverse_distance(z),
                                       theirs.comoving_transverse_distance(z),
                                       rtol=1e-8)


class TestEisensteinHu:
    def test_power_matches_reference(self):
        from victor.eisenstein_hu import EisensteinHu as RefEH
        for h, om, ob, ns in [(0.6777, 0.307, 0.0482, 0.96),
                              (0.675, 0.31, 0.048, 0.965)]:
            ours = EisensteinHu(h, om, ob, ns=ns)
            theirs = RefEH(h, om, ob, ns=ns)
            k = np.logspace(-4, np.log10(2), 200)
            np.testing.assert_allclose(np.asarray(ours.power_EH(k)),
                                       theirs.power_EH(k), rtol=1e-10)

    def test_sigma80_matches_reference_quad(self):
        from victor.eisenstein_hu import EisensteinHu as RefEH
        ours = EisensteinHu(0.6777, 0.307, 0.0482, ns=0.96)
        theirs = RefEH(0.6777, 0.307, 0.0482, ns=0.96)
        np.testing.assert_allclose(ours.compute_sigma80(), theirs.compute_sigma80(),
                                   rtol=1e-8)
