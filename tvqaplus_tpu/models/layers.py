"""Core layers, designed TPU-first.

Capability parity with the reference's ``model/{cnn,encoder,
position_encoding,self_attention}.py`` and the two wrapper layers in
``model/stage.py:15-52``, but with XLA-friendly formulations:

* **DepthwiseSeparableConv** (reference cnn.py:6-47): instead of a grouped
  conv1d (tiny channel groups that map poorly onto the MXU), the depthwise
  stage is k static shifted elementwise FMAs (pure VPU work that XLA fuses
  into one pass) and the pointwise stage is a single (L, D) @ (D, D') matmul
  on the MXU.
* **PositionEncoding** (reference position_encoding.py:6-43): a constant
  sinusoid table folded into the graph; XLA constant-folds the add.
* **EncoderBlock / StackedEncoder** (reference encoder.py:9-74): QANet-style
  [posenc; n_conv x (LN -> dropout-on-even -> dsconv -> residual); optional
  MHA + residual; final LN].  Dropout placement (every *other* conv layer,
  encoder.py:41-42) is preserved for training-dynamics parity.
* **MultiHeadedAttention** (reference self_attention.py:19-71): dormant under
  the default head-count 0 but part of the surface.  The reference applies
  its (N,1,L,1) mask over the *query* axis (self_attention.py:43,67); that
  exact semantics is kept.
* **LinearWrapper / ConvLinear** (reference stage.py:15-52): LN -> dropout ->
  linear/conv (+ optional ReLU).

All modules take a ``dtype`` for the compute precision (bfloat16 on TPU);
parameters and layer norms stay float32.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# LayerNorm epsilon matching torch.nn.LayerNorm's default (1e-5).
LN_EPS = 1e-5


def mask_logits(target, mask):
    """x*m + (1-m)*(-1e10): the reference's additive-mask idiom
    (model_utils.py:14-15), used before max-pools and softmaxes."""
    return target * mask + (1.0 - mask) * (-1e10)


class LinearWrapper(nn.Module):
    """[LayerNorm] -> Dropout -> Dense [-> ReLU]  (reference stage.py:15-32)."""
    out_hsz: int
    layer_norm: bool = True
    dropout: float = 0.1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_hsz, dtype=self.dtype, name="fc")(x)
        return nn.relu(x) if self.relu else x


class DepthwiseSeparableConv(nn.Module):
    """Depthwise-separable 1-D conv, same-padded, optional ReLU.

    Shift-and-FMA depthwise stage + matmul pointwise stage (see module
    docstring).  Matches reference cnn.py:6-47 semantics: zero padding of
    k//2 on both sides, depthwise bias, pointwise bias, ReLU applied after
    the pointwise conv.
    """
    out_ch: int
    kernel_size: int = 7
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (..., L, D)
        d = x.shape[-1]
        k = self.kernel_size
        dw = self.param("depthwise", nn.initializers.lecun_normal(),
                        (k, d))
        dw_b = self.param("depthwise_bias", nn.initializers.zeros, (d,))
        x = x.astype(self.dtype)
        pad = k // 2
        pad_widths = [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)]
        xp = jnp.pad(x, pad_widths)
        L = x.shape[-2]
        out = jnp.zeros_like(x)
        for j in range(k):  # static unroll: k shifted elementwise FMAs
            out = out + dw[j].astype(self.dtype) * jax.lax.slice_in_dim(
                xp, j, j + L, axis=-2)
        out = out + dw_b.astype(self.dtype)
        out = nn.Dense(self.out_ch, dtype=self.dtype, name="pointwise")(out)
        return nn.relu(out) if self.relu else out


class ConvLinear(nn.Module):
    """[LayerNorm] -> Dropout -> DepthwiseSeparableConv
    (reference stage.py:35-52; the `conv` t_layer_type projection)."""
    out_hsz: int
    kernel_size: int = 3
    layer_norm: bool = True
    dropout: float = 0.1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return DepthwiseSeparableConv(self.out_hsz, self.kernel_size,
                                      relu=self.relu, dtype=self.dtype,
                                      name="conv")(x)


def sinusoid_table(max_len, d, dtype=jnp.float32):
    """Fixed sin/cos positional table (reference position_encoding.py:24-31)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / d))
    angles = position * div_term  # (L, d/2)
    pe = jnp.zeros((max_len, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


class PositionEncoding(nn.Module):
    """Broadcast-add sinusoidal positions to any (*, L, D) input."""
    max_len: int = 500
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pe = sinusoid_table(self.max_len, x.shape[-1], self.dtype)
        return x + pe[: x.shape[-2]]


class MultiHeadedAttention(nn.Module):
    """Annotated-Transformer MHA with the reference's query-axis padding mask
    (self_attention.py:19-71).  Dormant at the default num_heads=0 but part
    of the API surface (enabled via *_encoder_n_heads)."""
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool):
        lead = x.shape[:-2]
        if x.ndim > 3:  # flatten leading batch dims
            x = x.reshape((-1,) + x.shape[-2:])
            mask = mask.reshape(-1, mask.shape[-1]) if mask is not None else None
        n, l, d = x.shape
        nh = self.num_heads
        assert d % nh == 0
        dk = d // nh
        q = nn.Dense(d, dtype=self.dtype, name="q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v")(x)
        q, k, v = (t.reshape(n, l, nh, dk).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        scores = jnp.einsum("nhqd,nhkd->nhqk", q, k) / math.sqrt(dk)
        if mask is not None:
            # (N, L) -> (N, 1, L, 1): masks *query* rows, reference quirk.
            m = mask.reshape(n, 1, l, 1)
            scores = jnp.where(m == 0, jnp.asarray(-1e9, scores.dtype), scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, l, d)
        out = nn.Dense(d, dtype=self.dtype, name="out")(out)
        return out.reshape(lead + out.shape[-2:])


class EncoderBlock(nn.Module):
    """QANet-style conv encoder block (reference encoder.py:9-52).

    Params are explicit (same tree as the original compact formulation —
    ln_i / conv_i{depthwise, depthwise_bias, pointwise} / final_ln;
    checkpoint- and torch-interop-compatible) so the fused Pallas kernel
    (ops/pallas_encoder.py) can consume them directly.  The fused path
    covers the default surface (n_conv=2, num_heads=0); other configs run
    the unfused module chain.
    """
    hsz: int
    n_conv: int = 2
    kernel_size: int = 7
    num_heads: int = 0
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        d = self.hsz
        # list attrs name children ln_0/ln_1/..., conv_0/conv_1/...
        self.ln = [_LNParams(d) for _ in range(self.n_conv)]
        self.conv = [_DSConvParams(d, d, self.kernel_size)
                     for _ in range(self.n_conv)]
        self.final_ln = _LNParams(d)
        self.pos = PositionEncoding(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        if self.num_heads:
            self.attn_ln = _LNParams(d)
            self.attn = MultiHeadedAttention(self.num_heads, self.dropout,
                                             dtype=self.dtype)

    def _fused(self, x, *, train: bool, reduce_mask=None, zero_mask=None):
        from tvqaplus_tpu.ops.pallas_encoder import fused_encoder_block
        l, d = x.shape[-2:]
        lead = x.shape[:-2]
        xg = x.reshape(lead[0], -1, l, d)               # (B, G, L, D)
        pe = sinusoid_table(l, d)
        params = {}
        for i in (0, 1):
            params[f"ln{i}_s"] = self.ln[i].scale
            params[f"ln{i}_b"] = self.ln[i].bias
            params[f"dw{i}"] = self.conv[i].depthwise
            params[f"dwb{i}"] = self.conv[i].depthwise_bias
            params[f"pw{i}"] = self.conv[i].pointwise.kernel
            params[f"pwb{i}"] = self.conv[i].pointwise.bias
        params["lnf_s"] = self.final_ln.scale
        params["lnf_b"] = self.final_ln.bias
        dropout_active = train and self.dropout > 0.0
        seed = jnp.zeros((), jnp.int32)
        if dropout_active:
            seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                      2 ** 31 - 1, dtype=jnp.int32)
        rm = None if reduce_mask is None else \
            reduce_mask.reshape(lead[0], -1, l)
        out = fused_encoder_block(
            xg, pe, params, seed, self.kernel_size, self.dtype,
            self.dropout if dropout_active else 0.0, rm, zero_mask)
        if reduce_mask is not None:
            return out.reshape(lead + (d,))
        return out.reshape(lead + (l, d))

    def __call__(self, x, mask=None, *, train: bool, reduce_mask=None,
                 zero_mask=None):
        """``reduce_mask`` (x's leading dims + (L,)): also fold in the
        consumer's masked word-max, returning (..., D) — in the fused
        kernel the full (..., L, D) output never reaches HBM (reference
        stage.py:500-505 semantics, max(mask_logits(out, m), axis=-2)).

        ``zero_mask`` (broadcastable to x.shape[:-1]): re-zero each conv's
        INPUT at masked positions, so a tap reading past a sequence's true
        length sees exactly the zeros that per-stream SAME padding would.
        Used by the merged-stream input encoder (stage.py
        _merged_input_encode), where sequences of different true lengths
        share one padded L axis — with it the merged outputs equal the
        separate per-stream calls exactly (positions past the true length
        are garbage and must be sliced away by the caller)."""
        dropout_active = train and self.dropout > 0.0
        # the fused kernel takes a 2-D (G, L) zero mask (one row per merged
        # group, constant over batch — the _merged_input_encode layout)
        zm_fusable = zero_mask is None or (
            getattr(zero_mask, "ndim", 0) == 2 and x.ndim == 4
            and zero_mask.shape == x.shape[1:3])
        if (self.use_pallas and self.num_heads == 0 and self.n_conv == 2
                and x.ndim >= 3 and zm_fusable
                and (not dropout_active
                     or jax.default_backend() == "tpu")):
            return self._fused(x, train=train, reduce_mask=reduce_mask,
                               zero_mask=zero_mask)
        out = self.pos(x)
        for i in range(self.n_conv):
            residual = out
            out = self.ln[i](out, self.dtype)
            if i % 2 == 0:  # dropout on even conv layers only (encoder.py:41)
                out = self.drop(out, deterministic=not train)
            if zero_mask is not None:
                out = out * zero_mask[..., None]
            out = self.conv[i](out, self.dtype)
            out = out + residual
        if self.num_heads:
            residual = out
            out = self.attn_ln(out, self.dtype)
            out = self.attn(out, mask, train=train)
            out = out + residual
        out = self.final_ln(out, self.dtype)
        if reduce_mask is not None:
            return jnp.max(mask_logits(out, reduce_mask[..., None]), axis=-2)
        return out


class StackedEncoder(nn.Module):
    """n_blocks stacked EncoderBlocks (reference encoder.py:55-74)."""
    n_blocks: int = 1
    n_conv: int = 2
    kernel_size: int = 7
    num_heads: int = 0
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool, reduce_mask=None,
                 zero_mask=None):
        for i in range(self.n_blocks):
            last = i == self.n_blocks - 1
            x = EncoderBlock(x.shape[-1], self.n_conv, self.kernel_size,
                             self.num_heads, self.dropout, self.dtype,
                             self.use_pallas,
                             name=f"block_{i}")(
                x, mask, train=train,
                reduce_mask=reduce_mask if last else None,
                zero_mask=zero_mask)
        return x


class MLPBridge(nn.Module):
    """LN -> Dropout -> Dense -> ReLU -> LN: the `bert_word_encoding_fc` /
    `vid_fc` recipe (reference stage.py:85-113; `concat_fc` uses the
    TriMLPBridge variant below).

    Params are explicit (same ln_in/fc/ln_out tree as the original compact
    formulation — checkpoint/torch-interop compatible) so the fused Pallas
    kernel (ops/pallas_bridge.py) can consume them directly.
    """
    in_hsz: int
    out_hsz: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.ln_in = _LNParams(self.in_hsz)
        self.fc = _DenseParams(self.in_hsz, self.out_hsz)
        self.ln_out = _LNParams(self.out_hsz)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, *, train: bool):
        dropout_active = train and self.dropout > 0.0
        kernel_ok = self.use_pallas and x.ndim == 4 and (
            not dropout_active or jax.default_backend() == "tpu")
        if kernel_ok:
            from tvqaplus_tpu.ops.pallas_bridge import fused_mlp_bridge
            seed = jnp.zeros((), jnp.int32)
            if dropout_active:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2 ** 31 - 1,
                    dtype=jnp.int32)
            return fused_mlp_bridge(
                x, self.ln_in.scale, self.ln_in.bias, self.fc.kernel,
                self.fc.bias, self.ln_out.scale, self.ln_out.bias, seed,
                self.dtype, self.dropout if dropout_active else 0.0)
        x = self.ln_in(x, self.dtype)
        x = self.drop(x, deterministic=not train)
        x = nn.relu(self.fc(x, self.dtype))
        return self.ln_out(x, self.dtype)


class InputEmbedding(nn.Module):
    """Dropout -> Dense -> ReLU -> LN: `input_embedding`
    (reference stage.py:115-120)."""
    out_hsz: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_hsz, dtype=self.dtype, name="fc")(x)
        x = nn.relu(x)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_out")(x)


class DownProjection(nn.Module):
    """LN -> Dropout -> Dense -> ReLU: `c2q_down_projection`
    (reference stage.py:133-138).

    Params are defined explicitly (not via nn.LayerNorm/nn.Dense submodules)
    so the fused Pallas attention kernel can consume them directly while
    sharing the exact same checkpointable parameter tree.
    """
    in_hsz: int
    out_hsz: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ln_scale = self.param("ln_scale", nn.initializers.ones,
                                   (self.in_hsz,))
        self.ln_bias = self.param("ln_bias", nn.initializers.zeros,
                                  (self.in_hsz,))
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_hsz, self.out_hsz))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.out_hsz,))
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, *, train: bool):
        mean = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
        x = x * self.ln_scale + self.ln_bias
        x = self.drop(x, deterministic=not train)
        x = x.astype(self.dtype) @ self.kernel.astype(self.dtype)
        return nn.relu(x + self.bias.astype(self.dtype))


class _LNParams(nn.Module):
    """Bare LayerNorm parameters (scale/bias) with flax-LayerNorm-equivalent
    math exposed as a method — lets a parent module hand the raw params to a
    Pallas kernel while keeping the standard {scale, bias} parameter tree."""
    dim: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))

    def __call__(self, x, dtype):
        # replicates flax.linen.LayerNorm(dtype=dtype): f32 stats (fast
        # variance clipped at 0), f32 normalize+affine, cast to dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, -1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(x32), -1, keepdims=True) - jnp.square(mean),
            0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
        return (y * self.scale + self.bias).astype(dtype)


class _DenseParams(nn.Module):
    """Bare Dense parameters (kernel/bias); see _LNParams."""
    in_dim: int
    out_dim: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_dim, self.out_dim))
        self.bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))

    def __call__(self, x, dtype):
        return (x.astype(dtype) @ self.kernel.astype(dtype)
                + self.bias.astype(dtype))


class _DSConvParams(nn.Module):
    """Bare depthwise-separable-conv parameters with
    DepthwiseSeparableConv-equivalent math (relu=True); see _LNParams."""
    dim: int
    out: int
    k: int

    def setup(self):
        self.depthwise = self.param("depthwise",
                                    nn.initializers.lecun_normal(),
                                    (self.k, self.dim))
        self.depthwise_bias = self.param("depthwise_bias",
                                         nn.initializers.zeros, (self.dim,))
        self.pointwise = _DenseParams(self.dim, self.out)

    def __call__(self, x, dtype):
        x = x.astype(dtype)
        pad = self.k // 2
        pad_widths = [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)]
        xp = jnp.pad(x, pad_widths)
        l = x.shape[-2]
        out = jnp.zeros_like(x)
        for j in range(self.k):
            out = out + self.depthwise[j].astype(dtype) * \
                jax.lax.slice_in_dim(xp, j, j + l, axis=-2)
        out = out + self.depthwise_bias.astype(dtype)
        return nn.relu(self.pointwise(out, dtype))


class TriMLPBridge(nn.Module):
    """``concat_fc`` as a fusable module: LN([s; v; s*v]) -> Dropout ->
    Dense -> ReLU -> LN (reference stage.py:107-113 + the concat at
    stage.py:300-302).

    Parameter tree matches MLPBridge exactly (ln_in/fc/ln_out — checkpoint
    and torch-interop compatible); params are exposed so the fused Pallas
    kernel (ops/pallas_tri_bridge.py) can consume them directly.  The
    unfused path reproduces MLPBridge-on-concat numerics.
    """
    hsz: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.ln_in = _LNParams(3 * self.hsz)
        self.fc = _DenseParams(3 * self.hsz, self.hsz)
        self.ln_out = _LNParams(self.hsz)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, s, v, *, train: bool):
        dropout_active = train and self.dropout > 0.0
        kernel_ok = self.use_pallas and s.ndim == 5 and (
            not dropout_active or jax.default_backend() == "tpu")
        if kernel_ok:
            from tvqaplus_tpu.ops.pallas_tri_bridge import fused_tri_bridge
            seed = jnp.zeros((), jnp.int32)
            if dropout_active:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2 ** 31 - 1,
                    dtype=jnp.int32)
            return fused_tri_bridge(
                s, v, self.ln_in.scale, self.ln_in.bias, self.fc.kernel,
                self.fc.bias, self.ln_out.scale, self.ln_out.bias, seed,
                self.dtype, self.dropout if dropout_active else 0.0)
        x = jnp.concatenate([s, v, s * v], axis=-1)
        x = self.ln_in(x, self.dtype)
        x = self.drop(x, deterministic=not train)
        x = nn.relu(self.fc(x, self.dtype))
        return self.ln_out(x, self.dtype)


class NormalizeScale(nn.Module):
    """L2-normalize then scale by a learned per-dim weight (reference
    model_utils.py:23-34; unused by STAGE but part of the surface)."""
    dim: int
    init_norm: float = 20.0

    @nn.compact
    def __call__(self, x):
        w = self.param("weight",
                       lambda _, shape: jnp.full(shape, self.init_norm),
                       (self.dim,))
        normed = x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return normed * w
