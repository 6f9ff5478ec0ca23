"""Convergence diagnostics: split R-hat, effective sample size, acceptance.

The reference's only convergence machinery is cobaya's Gelman-Rubin stop
criterion (R-1 < 0.01, config/boss_cobaya_config.yaml:46-47), computed by MPI
reductions across chain processes. Here chains are walker groups on one mesh;
R-hat is a jnp reduction (XLA collectives when the walker axis is sharded)
and ESS is a host-side FFT autocorrelation over the recorded chain.
"""

from __future__ import annotations

import numpy as np

from ..parallel.mesh import cross_chain_rhat


def split_rhat(chain: np.ndarray) -> np.ndarray:
    """Split R-hat per parameter from a (n_steps, n_walkers, ndim) chain.

    Each walker is treated as a chain (standard practice for ensemble
    samplers; walkers interact through the ensemble, which makes this mildly
    conservative — the safe direction).
    """
    return np.asarray(cross_chain_rhat(chain.transpose(1, 0, 2)))


def autocorr_time(x: np.ndarray, c: float = 5.0) -> np.ndarray:
    """Integrated autocorrelation time per parameter (emcee-style windowing).

    x: (n_steps, n_walkers, ndim). Averages walker autocorrelation functions.
    """
    n_steps = x.shape[0]
    nfft = 1 << (2 * n_steps - 1).bit_length()
    xc = x - x.mean(axis=0, keepdims=True)
    f = np.fft.rfft(xc, n=nfft, axis=0)
    acf = np.fft.irfft(f * np.conj(f), n=nfft, axis=0)[:n_steps].real
    acf /= np.maximum(acf[0:1], 1e-300)
    rho = acf.mean(axis=1)                               # (n_steps, ndim)
    taus = 2.0 * np.cumsum(rho, axis=0) - 1.0
    out = np.empty(x.shape[2])
    for p in range(x.shape[2]):
        window = np.arange(n_steps) >= c * taus[:, p]
        idx = np.argmax(window) if window.any() else n_steps - 1
        out[p] = taus[idx, p]
    return out


def effective_sample_size(chain: np.ndarray) -> np.ndarray:
    """ESS per parameter for a (n_steps, n_walkers, ndim) chain."""
    tau = autocorr_time(chain)
    n_total = chain.shape[0] * chain.shape[1]
    return n_total / np.maximum(tau, 1.0)


def acceptance_fraction(n_accepted, n_steps) -> float:
    return float(np.mean(np.asarray(n_accepted)) / max(float(n_steps), 1.0))
