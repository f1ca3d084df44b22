"""Cross-modal structured attention (parameter-free), pure-JAX reference path.

``structured_attention`` is the core matcher of STAGE (reference
context_query_attention.py:7-101): every QA word attends over the detected
regions (or subtitle tokens) of every frame through **cosine** similarity,
softmaxed over the region axis with a temperature ``scale``.  The frame axis
Li is purely a batch dimension — no cross-frame mixing — which is what makes
context-parallel sharding over Li communication-free (SURVEY.md §5).

The fused Pallas kernel in ``tvqaplus_tpu.ops.pallas_attention`` implements
the same math; this module is the numerics oracle for it.

``context_query_attention`` is the scaled-dot-product variant kept for API
parity (reference context_query_attention.py:104-142; unused by STAGE).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from tvqaplus_tpu.ops.masking import safe_softmax


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch.nn.functional.normalize semantics: x / max(||x||, eps).

    Stats accumulate in f32 even for bf16 inputs (a bf16 sum of squares
    over a few hundred dims loses ~1% relative accuracy); the result rides
    the input dtype, and XLA fuses the conversions into the surrounding
    elementwise chain."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=True))
    return (x32 / jnp.maximum(norm, eps)).astype(x.dtype)


def _dropout(x, rate, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def structured_attention(C, Q, c_mask, q_mask, scale=10.0, dropout_rate=0.0,
                         dropout_rng=None, noun_mask=None,
                         void_vector=None, add_void=False):
    """Cosine structured attention over regions.

    Args:
      C: (N, 5, 1|Li, Lqa, D) QA-word embeddings (broadcast over frames).
      Q: (N, 1, Li, Lr, D) per-frame context embeddings.
      c_mask: (N, 5, 1|Li, Lqa); q_mask: (N, 1, Li, Lr).
      scale: softmax temperature multiplier (reference config.py:67).
      dropout_rate/dropout_rng: dropout applied to the *normalized* inputs
        before the similarity matmul (reference
        context_query_attention.py:95-96); pass rng=None for eval.
      noun_mask: (N, 5, Lqa) or (N, 5, Li, Lqa) multiplicative gate on rows.
      void_vector: (m, D) learned non-visual vectors appended to the region
        axis; ``add_void`` keeps them in the weighted sum
        (reference context_query_attention.py:51-79).

    Returns:
      (A, raw_S, S_mask, S_normalized) with shapes
      (N, 5, Li, Lqa, D), (N, 5, Li, Lqa, Lr) x3 — void columns stripped.
    """
    bsz, _, num_img, num_region, hsz = Q.shape
    num_void = 0
    if void_vector is not None:
        num_void = void_vector.shape[0]
        q_void = jnp.broadcast_to(void_vector.reshape(1, 1, 1, num_void, hsz),
                                  (bsz, 1, num_img, num_void, hsz))
        Q = jnp.concatenate([Q, q_void], axis=-2)
        q_mask = jnp.concatenate(
            [q_mask, jnp.ones((bsz, 1, num_img, num_void), q_mask.dtype)],
            axis=-1)

    # cosine similarity with dropout on the normalized inputs
    rng_c = rng_q = None
    if dropout_rng is not None:
        rng_c, rng_q = jax.random.split(dropout_rng)
    Cn = _dropout(l2_normalize(C), dropout_rate, rng_c)
    Qn = _dropout(l2_normalize(Q), dropout_rate, rng_q)

    S_mask = c_mask[..., :, None] * q_mask[..., None, :]  # (N,5,Li,Lqa,Lr+v)
    # batched matmul with leading-dim broadcasting over the answer/frame axes
    S = jnp.matmul(Cn, jnp.swapaxes(Qn, -2, -1))          # (N,5,Li,Lqa,Lr+v)
    masked_S = S - 1e10 * (1.0 - S_mask)

    S_ = safe_softmax(masked_S * scale, axis=-1)
    S_ = S_ * S_mask  # zero out rows that are entirely padding

    if noun_mask is not None:
        if noun_mask.ndim == 3:
            S_ = S_ * noun_mask[:, :, None, :, None]
        elif noun_mask.ndim == 4:
            S_ = S_ * noun_mask[..., None]
        else:
            raise NotImplementedError

    if num_void and add_void:
        A = jnp.matmul(S_, Q)
        masked_S = masked_S[..., :-num_void]
        S_mask = S_mask[..., :-num_void]
        S_ = S_[..., :-num_void]
    else:
        if num_void:
            masked_S = masked_S[..., :-num_void]
            S_mask = S_mask[..., :-num_void]
            S_ = S_[..., :-num_void]
            Q = Q[..., :-num_void, :]
        A = jnp.matmul(S_, Q)
    return A, masked_S, S_mask, S_


def context_query_attention(C, Q, c_mask, q_mask, dropout_rate=0.0,
                            dropout_rng=None):
    """Scaled dot-product context-query attention (reference
    context_query_attention.py:104-142).  Kept for surface parity."""
    rng_c = rng_q = None
    if dropout_rng is not None:
        rng_c, rng_q = jax.random.split(dropout_rng)
    Cd = _dropout(C, dropout_rate, rng_c)
    Qd = _dropout(Q, dropout_rate, rng_q)
    S_mask = c_mask[..., :, None] * q_mask[..., None, :]
    S = jnp.matmul(Cd, jnp.swapaxes(Qd, -2, -1)) / math.sqrt(C.shape[-1])
    masked_S = S - 1e10 * (1.0 - S_mask)
    S_ = safe_softmax(masked_S, axis=-1)
    return jnp.matmul(S_, Q)
