"""Masking primitives shared across the model and losses.

The reference masks by adding -1e10 (model_utils.py:14-15) and relies on
softmax-of-constant-rows returning uniform values that are zeroed later.
Under jit, XLA's fused softmax computes exp(x) / sum(exp(x)) for such rows as
0/0 = nan (eager keeps the max-subtracted form), so every masked softmax here
floors its logits at SAFE_FLOOR first: in float32, exp underflows to exactly
0 more than ~90 below the row max, so any floor <= -1e4 preserves exact
masking semantics while keeping fully-padded rows finite (they're zeroed or
weight-0 downstream anyway).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e10     # the additive mask value (reference model_utils.py:15)
SAFE_FLOOR = -3e4   # large enough to zero out in f32 exp, small enough to fuse


def mask_logits(target, mask):
    """x*m + (1-m)*(-1e10)."""
    return target * mask + (1.0 - mask) * NEG_INF


def safe_softmax(x, axis=-1):
    """softmax that is nan-free for fully-masked (-1e10) rows under jit."""
    return jax.nn.softmax(jnp.maximum(x, SAFE_FLOOR), axis=axis)


def safe_log_softmax(x, axis=-1):
    """log_softmax that is nan/inf-free for fully-masked rows under jit."""
    return jax.nn.log_softmax(jnp.maximum(x, SAFE_FLOOR), axis=axis)
