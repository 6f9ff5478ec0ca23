"""Fused Pallas TPU kernel for the dispersion model's exact final stage.

The dispersion RSD model (victor/ccf_model.py:658-671) ends with three exact
150k-point velocity-spline passes: the final Picard update's v_r(rr_prev),
and the jacobian's v_r(rr)/dv_r(rr) at the updated coordinate. On the XLA
path these are three `ppoly_eval` masksums with the elementwise glue fused
around them by XLA (which also CSEs the shared interval masks of the two
same-point jacobian passes).

This kernel runs the WHOLE final stage in one VMEM-resident pass: both
spline coefficient tables stay in VMEM, the intermediate (n_v, q) arrays
(rr_prev, v_r, r_par, rr, mu_r) never touch HBM, and the two jacobian
passes share one interval-mask computation. It exists to answer the
measured question "is the XLA path leaving fusion bandwidth on the table?"
— see BASELINE.md (round 3) for the verdict. The algorithm and op order
per point match the XLA path, so outputs agree to f32 roundoff.

No autodiff: this is a forward-only throughput experiment
(`dispersion_final='fused'`); gradient-based sampling uses the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def dispersion_final_fused(x, c_vr, c_dvr, r_par, A, s_perp, iaH, resc_vel,
                           interpret: bool | None = None):
    """One fused kernel: exact final Picard update + jacobian spline passes.

    x:        (n,) velocity-spline knots
    c_vr:     (n-1, 4) v_r spline coefficients (ascending powers)
    c_dvr:    (n-1, 4) dv_r/dr spline coefficients
    r_par:    (n_v, q) line-of-sight coordinate after the interior iterations
    A:        (n_v, q) fixed-point constant s_par - v_par/(aH)
    s_perp:   (q,) transverse coordinate
    iaH:      scalar 1/(aH) (AP-corrected)
    resc_vel: scalar template rescaling of the velocity splines

    Returns (r_par_final, rr, mu_r, jacobian), each (n_v, q) — exactly the
    quantities the streaming integral needs downstream.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n = x.shape[0]
    n_v, q = r_par.shape
    nvp, qp = _round_up(n_v, 8), _round_up(q, 128)
    dt = r_par.dtype

    # pad with benign values (1.0) so every padded lane stays finite
    def pad2(a):
        return jnp.pad(a, ((0, nvp - n_v), (0, qp - q)), constant_values=1.0)

    rp_p = pad2(r_par)
    A_p = pad2(A)
    sp_p = jnp.pad(s_perp, (0, qp - q), constant_values=1.0)[None, :]
    scal = jnp.stack([jnp.asarray(iaH, dt).reshape(()),
                      jnp.asarray(resc_vel, dt).reshape(())])[None, :]

    def kernel(x_ref, cv_ref, cd_ref, rp_ref, a_ref, sp_ref, sc_ref,
               rpo_ref, rro_ref, muo_ref, jo_ref):
        iaH_s = sc_ref[0, 0]
        resc_s = sc_ref[0, 1]
        x0 = x_ref[0, 0]
        xn = x_ref[0, n - 1]
        sp = sp_ref[:]                       # (1, qp), broadcasts over rows
        sp2 = sp * sp

        def masksum(c_ref, qq):
            acc = jnp.zeros_like(qq)
            for i in range(n - 1):
                t = qq - x_ref[0, i]
                p = ((c_ref[i, 3] * t + c_ref[i, 2]) * t + c_ref[i, 1]) * t \
                    + c_ref[i, 0]
                if i == 0:
                    m = qq < x_ref[0, 1]
                elif i == n - 2:
                    m = qq >= x_ref[0, i]
                else:
                    m = (qq >= x_ref[0, i]) & (qq < x_ref[0, i + 1])
                acc = acc + jnp.where(m, p, 0.0)
            # `+ (qq - qq)` propagates NaN queries — see ppoly_eval
            return acc + (qq - qq)

        # exact final Picard update (pass 1)
        rp = rp_ref[:]
        rr_prev = jnp.sqrt(sp2 + rp * rp)
        q1 = jnp.clip(rr_prev / resc_s, x0, xn)
        vr_prev = masksum(cv_ref, q1)
        r_par_f = a_ref[:] / (1.0 + iaH_s * vr_prev / rr_prev)

        rr = jnp.sqrt(sp2 + r_par_f * r_par_f)
        mu_r = r_par_f / rr

        # jacobian passes (2 + 3) share one interval-mask computation
        q2 = jnp.clip(rr / resc_s, x0, xn)
        acc_v = jnp.zeros_like(q2)
        acc_d = jnp.zeros_like(q2)
        for i in range(n - 1):
            t = q2 - x_ref[0, i]
            pv = ((cv_ref[i, 3] * t + cv_ref[i, 2]) * t + cv_ref[i, 1]) * t \
                + cv_ref[i, 0]
            pd = ((cd_ref[i, 3] * t + cd_ref[i, 2]) * t + cd_ref[i, 1]) * t \
                + cd_ref[i, 0]
            if i == 0:
                m = q2 < x_ref[0, 1]
            elif i == n - 2:
                m = q2 >= x_ref[0, i]
            else:
                m = (q2 >= x_ref[0, i]) & (q2 < x_ref[0, i + 1])
            acc_v = acc_v + jnp.where(m, pv, 0.0)
            acc_d = acc_d + jnp.where(m, pd, 0.0)
        # `+ (q2 - q2)` propagates NaN queries — see ppoly_eval
        acc_v = acc_v + (q2 - q2)
        dvr_rr = (acc_d + (q2 - q2)) / resc_s
        jac = 1.0 / (1.0 + acc_v * iaH_s / rr
                     + iaH_s * mu_r * mu_r * (dvr_rr - acc_v / rr))

        rpo_ref[:] = r_par_f
        rro_ref[:] = rr
        muo_ref[:] = mu_r
        jo_ref[:] = jac

    # Grid over row tiles: keeps each program instance's VMEM footprint at
    # ~10 x (TILE, qp) f32 blocks (~1 MB at TILE=8) — one (n_v_pad, qp)
    # block per operand would exceed the 16 MB scoped-vmem limit once the
    # batching rule prepends the vmap chunk axis.
    TILE = 8
    fixed = lambda *_: (0, 0)          # noqa: E731 — replicated small inputs
    tiled = lambda i: (i, 0)           # noqa: E731
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((nvp, qp), dt) for _ in range(4)),
        grid=(nvp // TILE,),
        in_specs=[
            pl.BlockSpec((1, n), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((n - 1, 4), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((n - 1, 4), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, qp), tiled, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, qp), tiled, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec((TILE, qp), tiled,
                                     memory_space=pltpu.VMEM)
                        for _ in range(4)),
        interpret=interpret,
    )(x[None, :].astype(dt), c_vr.astype(dt), c_dvr.astype(dt),
      rp_p, A_p, sp_p, scal)
    return tuple(o[:n_v, :q] for o in outs)
