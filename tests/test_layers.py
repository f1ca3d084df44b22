"""Layer-level tests: shapes, semantics, and a depthwise-conv oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from tvqaplus_tpu.models.layers import (
    ConvLinear,
    DepthwiseSeparableConv,
    EncoderBlock,
    LinearWrapper,
    MultiHeadedAttention,
    PositionEncoding,
    StackedEncoder,
    mask_logits,
    sinusoid_table,
)


def test_mask_logits():
    x = jnp.array([1.0, 2.0, 3.0])
    m = jnp.array([1.0, 0.0, 1.0])
    out = np.array(mask_logits(x, m))
    np.testing.assert_allclose(out, [1.0, -1e10, 3.0])


def test_sinusoid_table_values():
    pe = np.array(sinusoid_table(10, 6))
    # position 0: sin(0)=0 on even dims, cos(0)=1 on odd dims
    np.testing.assert_allclose(pe[0], [0, 1, 0, 1, 0, 1], atol=1e-7)
    # position p, dim 0: sin(p)
    np.testing.assert_allclose(pe[3, 0], np.sin(3.0), rtol=1e-6)


def test_position_encoding_broadcast():
    pe = PositionEncoding()
    x = jnp.zeros((2, 3, 7, 16))
    y = pe.apply({}, x)
    assert y.shape == x.shape
    # every leading batch slice gets the same table
    np.testing.assert_allclose(np.array(y[0, 0]), np.array(y[1, 2]))


def oracle_depthwise_separable(x, dw, dw_b, pw, pw_b, relu=True):
    """Direct numpy conv: zero 'same' padding, depthwise then pointwise."""
    L, D = x.shape
    k = dw.shape[0]
    pad = k // 2
    xp = np.pad(x, ((pad, pad), (0, 0)))
    out = np.zeros_like(x)
    for l in range(L):
        for j in range(k):
            out[l] += dw[j] * xp[l + j]
    out = out + dw_b
    out = out @ pw + pw_b
    return np.maximum(out, 0) if relu else out


def test_depthwise_separable_conv_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 9, 6)).astype(np.float32)
    conv = DepthwiseSeparableConv(out_ch=6, kernel_size=5)
    params = conv.init(jax.random.PRNGKey(0), jnp.array(x))
    y = conv.apply(params, jnp.array(x))
    p = params["params"]
    oy = oracle_depthwise_separable(
        x[0], np.array(p["depthwise"]), np.array(p["depthwise_bias"]),
        np.array(p["pointwise"]["kernel"]), np.array(p["pointwise"]["bias"]))
    np.testing.assert_allclose(np.array(y[0]), oy, rtol=1e-5, atol=1e-5)


def test_depthwise_conv_batch_dims():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 9, 8)).astype(np.float32)
    conv = DepthwiseSeparableConv(out_ch=8, kernel_size=7)
    params = conv.init(jax.random.PRNGKey(0), jnp.array(x))
    y = conv.apply(params, jnp.array(x))
    assert y.shape == (2, 3, 9, 8)
    # matches flattening batch dims
    y_flat = conv.apply(params, jnp.array(x.reshape(6, 9, 8)))
    np.testing.assert_allclose(np.array(y), np.array(y_flat).reshape(y.shape),
                               rtol=1e-6)


def test_linear_wrapper_relu_flag():
    x = jnp.array(np.random.default_rng(2).standard_normal((4, 3, 8)),
                  jnp.float32)
    lw = LinearWrapper(out_hsz=5, relu=True)
    params = lw.init(jax.random.PRNGKey(0), x, train=False)
    y = lw.apply(params, x, train=False)
    assert y.shape == (4, 3, 5) and float(y.min()) >= 0.0
    lw2 = LinearWrapper(out_hsz=5, relu=False)
    p2 = lw2.init(jax.random.PRNGKey(0), x, train=False)
    y2 = lw2.apply(p2, x, train=False)
    assert float(y2.min()) < 0.0


def test_conv_linear_shape():
    x = jnp.ones((2, 7, 8))
    cl = ConvLinear(out_hsz=8, kernel_size=3)
    params = cl.init(jax.random.PRNGKey(0), x, train=False)
    assert cl.apply(params, x, train=False).shape == (2, 7, 8)


def test_encoder_block_residual_structure():
    rng = np.random.default_rng(3)
    x = jnp.array(rng.standard_normal((3, 11, 16)), jnp.float32)
    mask = jnp.ones((3, 11))
    blk = EncoderBlock(16, n_conv=2, kernel_size=7, num_heads=0)
    params = blk.init(jax.random.PRNGKey(0), x, mask, train=False)
    y = blk.apply(params, x, mask, train=False)
    assert y.shape == x.shape
    # final layer norm: per-position mean ~0, var ~1
    np.testing.assert_allclose(np.array(y).mean(-1), 0.0, atol=1e-4)


def test_encoder_block_with_heads():
    x = jnp.ones((2, 6, 16))
    mask = jnp.ones((2, 6))
    blk = EncoderBlock(16, n_conv=2, kernel_size=5, num_heads=4)
    params = blk.init(jax.random.PRNGKey(0), x, mask, train=False)
    assert blk.apply(params, x, mask, train=False).shape == x.shape


def test_stacked_encoder_blocks():
    x = jnp.ones((2, 6, 16))
    enc = StackedEncoder(n_blocks=2, n_conv=2, kernel_size=5)
    params = enc.init(jax.random.PRNGKey(0), x, None, train=False)
    assert enc.apply(params, x, None, train=False).shape == x.shape
    names = list(params["params"].keys())
    assert "block_0" in names and "block_1" in names


def test_mha_query_mask_semantics():
    """The reference masks *query* rows (self_attention.py:43): a padded
    position still produces finite output (uniform attention), and valid
    positions are unaffected by the padded position's own query row."""
    rng = np.random.default_rng(4)
    x = jnp.array(rng.standard_normal((1, 5, 8)), jnp.float32)
    mask = jnp.array([[1, 1, 1, 0, 0]], jnp.float32)
    mha = MultiHeadedAttention(num_heads=2)
    params = mha.init(jax.random.PRNGKey(0), x, mask, train=False)
    y = mha.apply(params, x, mask, train=False)
    assert np.isfinite(np.array(y)).all()


def test_dropout_changes_training_output():
    x = jnp.ones((2, 6, 16))
    enc = StackedEncoder(n_blocks=1, n_conv=2, kernel_size=5, dropout=0.5)
    params = enc.init(jax.random.PRNGKey(0), x, None, train=False)
    y_eval = enc.apply(params, x, None, train=False)
    y_train = enc.apply(params, x, None, train=True,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.array(y_eval), np.array(y_train))
