"""On-device ensemble MCMC: differential-evolution and stretch moves.

This replaces the reference's sampling stack (external cobaya Metropolis
chains parallelised with MPI, victor/README.md:30) with a sampler that runs
entirely inside one jit: the walker ensemble advances under `lax.scan`, every
walker's likelihood is evaluated in a single vmapped dispatch per half-step,
and the walker axis can be sharded across a device mesh. Deterministic PRNG
key threading gives bit-reproducible chains for any device count.

Two complementary-ensemble moves (both update one half against the other,
preserving detailed balance w.r.t. the complementary walkers):

  * 'de' (default): differential evolution (ter Braak 2006, the move family
    behind emcee's DEMove/DIME) — proposal x + gamma (x_r1 - x_r2) with
    distinct partners from the other half, gamma jittered around the
    2.38/sqrt(2 ndim) optimum and a 10% chance of gamma = 1 mode-hopping
    jumps; symmetric, so plain Metropolis acceptance. Measured to converge
    the flagship BOSS config where the stretch move stalls (BASELINE.md
    round 5: the round-4 stretch measurement ended at R-1 0.0112 after
    512 x 8000 steps).
  * 'stretch': Goodman & Weare affine-invariant stretch move (the round-1..4
    behavior, kept for comparison studies).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class EnsembleState(NamedTuple):
    """Sampler state: a pytree, so it checkpoints/restores as plain arrays."""
    coords: jnp.ndarray     # (n_walkers, ndim)
    log_prob: jnp.ndarray   # (n_walkers,)
    aux: jnp.ndarray        # (n_walkers, n_aux) auxiliary outputs (e.g. chi2)
    key: jax.Array
    n_accepted: jnp.ndarray  # (n_walkers,) running acceptance counts
    n_steps: jnp.ndarray     # scalar step counter


def init_state(logpost_fn: Callable, coords: jnp.ndarray,
               key: jax.Array) -> EnsembleState:
    lnp, aux = logpost_fn(coords)
    if aux.ndim == 1:            # (W,) -> (W, 1); multi-aux (W, K) unchanged
        aux = aux[:, None]
    return EnsembleState(coords=coords, log_prob=lnp, aux=aux,
                         key=key,
                         n_accepted=jnp.zeros(coords.shape[0]),
                         n_steps=jnp.zeros(()))


def _half_update(logpost_fn, key, active, other, lnp_active, aux_active, a):
    """Stretch-move update of one half of the ensemble against the other."""
    n, ndim = active.shape
    k_z, k_pair, k_acc = jax.random.split(key, 3)
    u = jax.random.uniform(k_z, (n,))
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    partners = other[jax.random.randint(k_pair, (n,), 0, other.shape[0])]
    proposal = partners + z[:, None] * (active - partners)
    lnp_new, aux_new = logpost_fn(proposal)
    log_accept = (ndim - 1) * jnp.log(z) + lnp_new - lnp_active
    accept = jnp.log(jax.random.uniform(k_acc, (n,))) < log_accept
    coords = jnp.where(accept[:, None], proposal, active)
    lnp = jnp.where(accept, lnp_new, lnp_active)
    aux = jnp.where(accept[:, None], aux_new, aux_active)
    return coords, lnp, aux, accept


def _de_half_update(logpost_fn, key, active, other, lnp_active, aux_active,
                    jump_prob: float = 0.1):
    """Differential-evolution update of one half against the other: proposal
    x + gamma (x_r1 - x_r2) with DISTINCT partners r1 != r2 drawn from the
    complementary half, gamma jittered around 2.38/sqrt(2 ndim) and a
    jump_prob chance of gamma = 1 (full mode-hopping difference vector).
    The proposal is symmetric in (x, x'), so acceptance is plain Metropolis."""
    n, ndim = active.shape
    m = other.shape[0]
    k_r1, k_r2, k_g, k_jump, k_acc = jax.random.split(key, 5)
    r1 = jax.random.randint(k_r1, (n,), 0, m)
    # distinct second partner: nonzero offset mod m cannot collide with r1
    r2 = (r1 + jax.random.randint(k_r2, (n,), 1, m)) % m
    gamma0 = 2.38 / jnp.sqrt(2.0 * ndim)
    g = gamma0 * (1.0 + 1e-4 * jax.random.normal(k_g, (n,)))
    g = jnp.where(jax.random.uniform(k_jump, (n,)) < jump_prob, 1.0, g)
    proposal = active + g[:, None] * (other[r1] - other[r2])
    lnp_new, aux_new = logpost_fn(proposal)
    accept = jnp.log(jax.random.uniform(k_acc, (n,))) < (lnp_new - lnp_active)
    coords = jnp.where(accept[:, None], proposal, active)
    lnp = jnp.where(accept, lnp_new, lnp_active)
    aux = jnp.where(accept[:, None], aux_new, aux_active)
    return coords, lnp, aux, accept


def step(logpost_fn: Callable, state: EnsembleState, a: float = 2.0,
         move: str = 'stretch') -> EnsembleState:
    """One full red-black sweep (both halves updated) with the given move."""
    x, lnp, aux = state.coords, state.log_prob, state.aux
    n = x.shape[0] // 2
    key, k0, k1 = jax.random.split(state.key, 3)
    if move == 'de':
        half = lambda k, act, oth, lp, ax: _de_half_update(
            logpost_fn, k, act, oth, lp, ax)
    elif move == 'stretch':
        half = lambda k, act, oth, lp, ax: _half_update(
            logpost_fn, k, act, oth, lp, ax, a)
    else:
        raise ValueError(f"ensemble move must be 'de' or 'stretch', "
                         f'got {move!r}')
    x0, lnp0, aux0, acc0 = half(k0, x[:n], x[n:], lnp[:n], aux[:n])
    x1, lnp1, aux1, acc1 = half(k1, x[n:], x0, lnp[n:], aux[n:])
    return EnsembleState(
        coords=jnp.concatenate([x0, x1]),
        log_prob=jnp.concatenate([lnp0, lnp1]),
        aux=jnp.concatenate([aux0, aux1]),
        key=key,
        n_accepted=state.n_accepted + jnp.concatenate([acc0, acc1]),
        n_steps=state.n_steps + 1,
    )


def run(logpost_fn: Callable, state: EnsembleState, n_steps: int,
        a: float = 2.0, thin: int = 1, move: str = 'stretch'
        ) -> Tuple[EnsembleState, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Advance `n_steps` sweeps under lax.scan, recording every `thin`-th.

    Returns (final_state, (coords, log_prob, aux)) with leading axis
    n_steps // thin (n_steps must be a multiple of thin: a silent
    remainder-drop, and the thin > n_steps zero-length scan that never
    advanced the state, both hid misconfiguration). The whole loop is one
    XLA computation: no host round trips between steps.
    """
    if thin < 1 or n_steps % thin != 0:
        raise ValueError(f'n_steps ({n_steps}) must be a positive multiple '
                         f'of thin ({thin})')

    def body(st, _):
        # inner scan, not a Python unroll: unrolling duplicates the full
        # likelihood subgraph 2*thin times in the traced program, and
        # trace/lowering time dominates sampler wall-clock (CLAUDE.md)
        st2 = lax.scan(lambda s, _: (step(logpost_fn, s, a, move), None),
                       st, None, length=thin)[0]
        return st2, (st2.coords, st2.log_prob, st2.aux)

    return lax.scan(body, state, None, length=n_steps // thin)


def make_logpost(log_prior_fn: Callable, batched_loglike: Callable):
    """Compose prior + batched likelihood into the (lnp, aux) posterior fn.

    Points outside the prior support short-circuit to -inf but are still
    evaluated (branchless batch); the NaN guard inside the likelihood keeps
    them finite-safe (victor/ccf_fit.py:477-481 semantics).
    """
    def logpost(coords):
        lp = log_prior_fn(coords)
        lnl, chisq = batched_loglike(coords)
        total = jnp.where(jnp.isfinite(lp), lp + lnl, -jnp.inf)
        return total, jnp.stack([chisq], axis=-1)
    return logpost
