"""Fused tri-concat MLP bridge Pallas kernel (forward AND backward).

Fuses STAGE's ``concat_fc`` pipeline (reference stage.py:107-113, applied at
stage.py:300-302): LN([s; v; s*v]) -> dropout -> dense(3D->D) -> ReLU -> LN,
where s/v are the attended subtitle/video statements (B, A, Li, Lqa, D).

Why: the pure-XLA path materializes the (B, A, Li, Lqa, 3D) concat in HBM
(~60 MB bf16 at bench shapes) and runs 2 LayerNorms + dropout + matmul as
separate HBM passes — ~2.8 ms/step of an 18 ms step (profiled).  The kernel
reads s and v once, computes everything in VMEM, and writes only the result.

Every op here is ROW-LOCAL (no cross-row interaction), so the whole
(A, T, Lqa) block collapses into the matmul row axis — one
(rows, 3D) x (3D, D) MXU matmul per grid cell.

Dropout follows the same TPU-PRNG replay scheme as ops/pallas_attention.py:
the forward draws one (rows, 3D) keep mask per cell, the backward re-seeds
identically and replays it.  Non-TPU backends fall back to pure JAX when
dropout is active (interpret mode has no TPU PRNG).

LayerNorm numerics replicate flax.linen.LayerNorm exactly: stats in f32
(fast variance, clipped at 0), normalize+affine in f32, result cast to the
compute dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvqaplus_tpu.ops.pallas_attention import (
    LN_EPS,
    _keep_mask,
    _out_dtype,
)


def _frames_per_cell(li, m, d, budget_bytes=12 * 1024 * 1024):
    """Frame-block size T (largest divisor of Li <= 10 under the VMEM
    budget): the backward holds ~6 (T*M, 3D) f32 intermediates live
    (xhat/keep/yd/g_yd/g_y/gx) plus several (T*M, D) rows.  Forward and
    backward MUST use the same T (dropout PRNG stream replay)."""
    def footprint(t):
        rows = t * m
        return 4 * (5 * rows * 3 * d + 6 * rows * d)
    for t in range(min(10, li), 0, -1):
        if li % t == 0 and footprint(t) <= budget_bytes:
            return t
    return 1


def _bridge_fwd(s_r, v_r, gamma_in, beta_in, w_ref, b, gamma_out, beta_out,
                dropout_rate, ct):
    """Row-merged forward; returns intermediates the backward needs.
    s_r/v_r: (rows, D) f32."""
    rows, d = s_r.shape
    inv3d = 1.0 / (3 * d)
    sv = s_r * v_r
    mean = (jnp.sum(s_r, -1, keepdims=True)
            + jnp.sum(v_r, -1, keepdims=True)
            + jnp.sum(sv, -1, keepdims=True)) * inv3d
    var = jnp.maximum(
        (jnp.sum(jnp.square(s_r), -1, keepdims=True)
         + jnp.sum(jnp.square(v_r), -1, keepdims=True)
         + jnp.sum(jnp.square(sv), -1, keepdims=True)) * inv3d
        - jnp.square(mean), 0.0)
    inv_std = jax.lax.rsqrt(var + LN_EPS)
    xhat = (jnp.concatenate([s_r, v_r, sv], axis=-1) - mean) * inv_std
    y = xhat * gamma_in + beta_in                        # (rows, 3D)
    keep = _keep_mask((rows, 3 * d), dropout_rate) \
        if dropout_rate > 0.0 else None
    yd = y * keep if keep is not None else y
    y1 = jax.lax.dot_general(
        yd.astype(ct), w_ref[...].astype(ct), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b          # (rows, D)
    y2 = jnp.maximum(y1, 0.0)
    mean2 = jnp.sum(y2, -1, keepdims=True) * (1.0 / d)
    var2 = jnp.maximum(
        jnp.sum(jnp.square(y2), -1, keepdims=True) * (1.0 / d)
        - jnp.square(mean2), 0.0)
    inv_std2 = jax.lax.rsqrt(var2 + LN_EPS)
    xhat2 = (y2 - mean2) * inv_std2
    out = xhat2 * gamma_out + beta_out                   # (rows, D)
    return dict(sv=sv, inv_std=inv_std, xhat=xhat, keep=keep, yd=yd,
                y1=y1, inv_std2=inv_std2, xhat2=xhat2, out=out)


def _fwd_kernel(seed_ref, s_ref, v_ref, gin_ref, bin_ref, w_ref, b_ref,
                gout_ref, bout_ref, stmt_ref, *, dropout_rate, compute_dtype):
    """One (batch, frame-block) cell.  Block refs:
      s/v: (1, A, T, Lqa, D); params: (1, 3D)/(3D, D)/(1, D);
      stmt: (1, A, T, Lqa, D).
    """
    a_dim, t_frames, lqa, d = s_ref.shape[1:]
    rows = a_dim * t_frames * lqa
    ct = compute_dtype
    if dropout_rate > 0.0:
        pltpu.prng_seed(
            seed_ref[0],
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    s_r = s_ref[0].reshape(rows, d).astype(jnp.float32)
    v_r = v_ref[0].reshape(rows, d).astype(jnp.float32)
    f = _bridge_fwd(s_r, v_r, gin_ref[0, :], bin_ref[0, :], w_ref,
                    b_ref[0, :], gout_ref[0, :], bout_ref[0, :],
                    dropout_rate, ct)
    stmt_ref[0] = f["out"].astype(stmt_ref.dtype).reshape(
        a_dim, t_frames, lqa, d)


def _bwd_kernel(seed_ref, s_ref, v_ref, gin_ref, bin_ref, w_ref, b_ref,
                gout_ref, bout_ref, g_ref,
                gs_ref, gv_ref, ggin_ref, gbin_ref, gw_ref, gb_ref,
                ggout_ref, gbout_ref, *, dropout_rate, compute_dtype):
    """Backward cell: recompute from inputs (PRNG replayed), write gs/gv
    blocks, accumulate the six param grads across the sequential grid."""
    a_dim, t_frames, lqa, d = s_ref.shape[1:]
    rows = a_dim * t_frames * lqa
    inv3d = 1.0 / (3 * d)
    ct = compute_dtype
    i, j = pl.program_id(0), pl.program_id(1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * pl.num_programs(1) + j)

    @pl.when((i == 0) & (j == 0))
    def _init_param_grads():
        ggin_ref[...] = jnp.zeros_like(ggin_ref)
        gbin_ref[...] = jnp.zeros_like(gbin_ref)
        gw_ref[...] = jnp.zeros_like(gw_ref)
        gb_ref[...] = jnp.zeros_like(gb_ref)
        ggout_ref[...] = jnp.zeros_like(ggout_ref)
        gbout_ref[...] = jnp.zeros_like(gbout_ref)

    gamma_in = gin_ref[0, :]
    gamma_out = gout_ref[0, :]
    s_r = s_ref[0].reshape(rows, d).astype(jnp.float32)
    v_r = v_ref[0].reshape(rows, d).astype(jnp.float32)
    f = _bridge_fwd(s_r, v_r, gamma_in, bin_ref[0, :], w_ref, b_ref[0, :],
                    gamma_out, bout_ref[0, :], dropout_rate, ct)
    g = g_ref[0].reshape(rows, d).astype(jnp.float32)

    # LN_out backward
    xhat2 = f["xhat2"]
    gxh2 = g * gamma_out
    m1 = jnp.sum(gxh2, -1, keepdims=True) * (1.0 / d)
    m2 = jnp.sum(gxh2 * xhat2, -1, keepdims=True) * (1.0 / d)
    g_y2 = f["inv_std2"] * (gxh2 - m1 - xhat2 * m2)
    ggout_ref[...] += jnp.sum(g * xhat2, 0, keepdims=True)
    gbout_ref[...] += jnp.sum(g, 0, keepdims=True)

    # relu + dense backward
    g_y1 = g_y2 * (f["y1"] > 0.0).astype(jnp.float32)
    gb_ref[...] += jnp.sum(g_y1, 0, keepdims=True)
    gw_ref[...] += jax.lax.dot_general(
        f["yd"].astype(ct), g_y1.astype(ct), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (3D, D)
    g_yd = jax.lax.dot_general(
        g_y1.astype(ct), w_ref[...].astype(ct), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (rows, 3D)
    g_y = g_yd * f["keep"] if f["keep"] is not None else g_yd
    xhat = f["xhat"]
    ggin_ref[...] += jnp.sum(g_y * xhat, 0, keepdims=True)
    gbin_ref[...] += jnp.sum(g_y, 0, keepdims=True)

    # LN_in backward over the virtual 3D concat
    gxh = g_y * gamma_in
    m1i = jnp.sum(gxh, -1, keepdims=True) * inv3d
    m2i = jnp.sum(gxh * xhat, -1, keepdims=True) * inv3d
    gx = f["inv_std"] * (gxh - m1i - xhat * m2i)         # (rows, 3D)
    gx0, gx1, gx2 = gx[:, :d], gx[:, d:2 * d], gx[:, 2 * d:]
    # activation cotangents ride the PRIMAL dtype straight out of the
    # kernel (bf16 under the bf16 policy): writing f32 and converting in
    # XLA costs an extra full read+write of two (B, A, Li, Lqa, D) tensors
    # (~160 MB/step at bench shapes, profiled round 4)
    gs_ref[0] = (gx0 + gx2 * v_r).astype(gs_ref.dtype).reshape(
        a_dim, t_frames, lqa, d)
    gv_ref[0] = (gx1 + gx2 * s_r).astype(gv_ref.dtype).reshape(
        a_dim, t_frames, lqa, d)


def _specs(bsz, num_a, lqa, d, li, t):
    blk = pl.BlockSpec((1, num_a, t, lqa, d), lambda i, j, s: (i, 0, j, 0, 0))
    vec3 = pl.BlockSpec((1, 3 * d), lambda i, j, s: (0, 0))
    vec1 = pl.BlockSpec((1, d), lambda i, j, s: (0, 0))
    mat = pl.BlockSpec((3 * d, d), lambda i, j, s: (0, 0))
    return blk, vec3, vec1, mat


def _params_f32(gamma_in, beta_in, w, b, gamma_out, beta_out, d):
    return (gamma_in.reshape(1, 3 * d).astype(jnp.float32),
            beta_in.reshape(1, 3 * d).astype(jnp.float32),
            w.astype(jnp.float32), b.reshape(1, d).astype(jnp.float32),
            gamma_out.reshape(1, d).astype(jnp.float32),
            beta_out.reshape(1, d).astype(jnp.float32))


def _forward(s, v, gamma_in, beta_in, w, b, gamma_out, beta_out, seed,
             dropout_rate, interpret=False, compute_dtype=jnp.bfloat16):
    bsz, num_a, li, lqa, d = s.shape
    t = _frames_per_cell(li, num_a * lqa, d)
    blk, vec3, vec1, mat = _specs(bsz, num_a, lqa, d, li, t)
    kernel = functools.partial(_fwd_kernel, dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, li // t),
        in_specs=[blk, blk, vec3, vec3, mat, vec1, vec1, vec1],
        out_specs=[blk],
    )
    (stmt,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bsz, num_a, li, lqa, d),
                                        _out_dtype(compute_dtype))],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), s, v,
      *_params_f32(gamma_in, beta_in, w, b, gamma_out, beta_out, d))
    return stmt


def _backward(s, v, gamma_in, beta_in, w, b, gamma_out, beta_out, seed,
              g_stmt, dropout_rate, interpret=False,
              compute_dtype=jnp.bfloat16):
    bsz, num_a, li, lqa, d = s.shape
    t = _frames_per_cell(li, num_a * lqa, d)
    blk, vec3, vec1, mat = _specs(bsz, num_a, lqa, d, li, t)
    kernel = functools.partial(_bwd_kernel, dropout_rate=dropout_rate,
                               compute_dtype=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, li // t),
        in_specs=[blk, blk, vec3, vec3, mat, vec1, vec1, vec1, blk],
        out_specs=[blk, blk, vec3, vec3, mat, vec1, vec1, vec1],
    )
    gs, gv, ggin, gbin, gw, gb, ggout, gbout = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, num_a, li, lqa, d), s.dtype),
            jax.ShapeDtypeStruct((bsz, num_a, li, lqa, d), v.dtype),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((3 * d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), s, v,
      *_params_f32(gamma_in, beta_in, w, b, gamma_out, beta_out, d),
      g_stmt)
    return (gs, gv, ggin.reshape(gamma_in.shape), gbin.reshape(beta_in.shape),
            gw, gb.reshape(b.shape), ggout.reshape(gamma_out.shape),
            gbout.reshape(beta_out.shape))


def reference_impl(s, v, gamma_in, beta_in, w, b, gamma_out, beta_out):
    """Pure-JAX equivalent (no dropout) — numerics oracle + non-TPU VJP."""
    x = jnp.concatenate([s, v, s * v], axis=-1).astype(jnp.float32)
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(x), -1, keepdims=True)
                      - jnp.square(mean), 0.0)
    xhat = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = xhat * gamma_in + beta_in
    y1 = jnp.einsum("...k,kd->...d", y, w) + b
    y2 = jnp.maximum(y1, 0.0)
    mean2 = jnp.mean(y2, -1, keepdims=True)
    var2 = jnp.maximum(jnp.mean(jnp.square(y2), -1, keepdims=True)
                       - jnp.square(mean2), 0.0)
    return ((y2 - mean2) * jax.lax.rsqrt(var2 + LN_EPS)) * gamma_out \
        + beta_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_tri_bridge(s, v, gamma_in, beta_in, w, b, gamma_out, beta_out,
                     seed, compute_dtype=jnp.bfloat16, dropout_rate=0.0):
    """Pallas forward + Pallas backward (TPU) / pure-JAX rematerialized
    backward (interpret mode, dropout_rate == 0 only).

    s, v: (B, A, Li, Lqa, D) attended statements; ``seed`` is a traced
    int32 scalar for the in-kernel dropout PRNG (pass 0 when inactive).
    """
    return _forward(s, v, gamma_in, beta_in, w, b, gamma_out, beta_out,
                    seed, dropout_rate,
                    interpret=jax.default_backend() != "tpu",
                    compute_dtype=compute_dtype)


def _fused_fwd(s, v, gamma_in, beta_in, w, b, gamma_out, beta_out, seed,
               compute_dtype, dropout_rate):
    out = fused_tri_bridge(s, v, gamma_in, beta_in, w, b, gamma_out,
                           beta_out, seed, compute_dtype, dropout_rate)
    return out, (s, v, gamma_in, beta_in, w, b, gamma_out, beta_out, seed)


def _fused_bwd(compute_dtype, dropout_rate, residuals, g):
    on_tpu = jax.default_backend() == "tpu"
    if dropout_rate > 0.0 and not on_tpu:
        raise NotImplementedError(
            "in-kernel dropout backward needs the TPU PRNG; non-TPU "
            "callers must use the pure-JAX path when dropout is active")
    s, v, gamma_in, beta_in, w, b, gamma_out, beta_out, seed = residuals
    gs, gv, ggin, gbin, gw, gb, ggout, gbout = _backward(
        s, v, gamma_in, beta_in, w, b, gamma_out, beta_out, seed, g,
        dropout_rate, interpret=not on_tpu, compute_dtype=compute_dtype)
    # cotangents ride the primal dtypes (see ops/pallas_attention.py)
    return (gs.astype(s.dtype), gv.astype(v.dtype), ggin, gbin, gw, gb,
            ggout, gbout, np.zeros(jnp.shape(seed), jax.dtypes.float0))


fused_tri_bridge.defvjp(_fused_fwd, _fused_bwd)
