"""Structured-attention numerics vs a straightforward numpy oracle."""
import numpy as np
import jax.numpy as jnp

from tvqaplus_tpu.models.attention import (
    context_query_attention,
    l2_normalize,
    structured_attention,
)


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_l2norm(x, eps=1e-12):
    n = np.sqrt((x ** 2).sum(-1, keepdims=True))
    return x / np.maximum(n, eps)


def oracle_structured_attention(C, Q, c_mask, q_mask, scale):
    """Reference math (context_query_attention.py:35-101), numpy, no dropout."""
    Cn, Qn = np_l2norm(C), np_l2norm(Q)
    S_mask = c_mask[..., :, None] * q_mask[..., None, :]
    S = np.matmul(Cn, np.swapaxes(Qn, -1, -2))
    masked_S = S - 1e10 * (1 - S_mask)
    S_ = np_softmax(masked_S * scale, -1) * S_mask
    A = np.matmul(S_, Q)
    return A, masked_S, S_mask, S_


def _rand_inputs(rng, n=2, a=5, li=3, lqa=6, lr=4, d=8):
    C = rng.standard_normal((n, a, 1, lqa, d)).astype(np.float32)
    Q = rng.standard_normal((n, 1, li, lr, d)).astype(np.float32)
    c_mask = (rng.random((n, a, 1, lqa)) > 0.3).astype(np.float32)
    c_mask[..., 0] = 1
    q_mask = (rng.random((n, 1, li, lr)) > 0.3).astype(np.float32)
    q_mask[..., 0] = 1
    return C, Q, c_mask, q_mask


def test_structured_attention_matches_oracle():
    rng = np.random.default_rng(0)
    C, Q, c_mask, q_mask = _rand_inputs(rng)
    A, S, S_mask, S_ = structured_attention(
        jnp.array(C), jnp.array(Q), jnp.array(c_mask), jnp.array(q_mask),
        scale=10.0)
    # oracle needs broadcast inputs
    oA, oS, oSm, oS_ = oracle_structured_attention(
        np.broadcast_to(C, (2, 5, 3, 6, 8)),
        np.broadcast_to(Q, (2, 5, 3, 4, 8)),
        np.broadcast_to(c_mask, (2, 5, 3, 6)),
        np.broadcast_to(q_mask, (2, 5, 3, 4)), 10.0)
    np.testing.assert_allclose(np.array(A), oA, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.array(S_), oS_, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.array(S_mask), oSm)
    # raw S: compare only on valid cells (padding is -1e10 both sides)
    np.testing.assert_allclose(np.array(S) * oSm, oS * oSm,
                               rtol=2e-5, atol=2e-5)


def test_structured_attention_padded_rows_zero():
    rng = np.random.default_rng(1)
    C, Q, c_mask, q_mask = _rand_inputs(rng)
    q_mask[:, :, 1, :] = 0.0  # frame 1 fully padded
    A, S, S_mask, S_ = structured_attention(
        jnp.array(C), jnp.array(Q), jnp.array(c_mask), jnp.array(q_mask),
        scale=10.0)
    # S_ rows of a fully-padded frame are zeroed by the S_mask multiply
    assert float(jnp.abs(S_[:, :, 1]).max()) == 0.0
    assert float(jnp.abs(A[:, :, 1]).max()) == 0.0


def test_structured_attention_void_vectors():
    rng = np.random.default_rng(2)
    C, Q, c_mask, q_mask = _rand_inputs(rng)
    void = rng.standard_normal((2, 8)).astype(np.float32)
    # void columns are stripped from the returned score tensors
    A, S, S_mask, S_ = structured_attention(
        jnp.array(C), jnp.array(Q), jnp.array(c_mask), jnp.array(q_mask),
        scale=10.0, void_vector=jnp.array(void), add_void=True)
    assert S.shape[-1] == 4 and S_.shape[-1] == 4
    A2, *_ = structured_attention(
        jnp.array(C), jnp.array(Q), jnp.array(c_mask), jnp.array(q_mask),
        scale=10.0, void_vector=jnp.array(void), add_void=False)
    # with add_void=False the weighted sum excludes void columns -> differs
    assert not np.allclose(np.array(A), np.array(A2))


def test_structured_attention_noun_mask():
    rng = np.random.default_rng(3)
    C, Q, c_mask, q_mask = _rand_inputs(rng)
    noun_mask = np.zeros((2, 5, 6), np.float32)
    noun_mask[:, :, 0] = 1.0
    A, S, S_mask, S_ = structured_attention(
        jnp.array(C), jnp.array(Q), jnp.array(c_mask), jnp.array(q_mask),
        scale=10.0, noun_mask=jnp.array(noun_mask))
    assert float(jnp.abs(S_[:, :, :, 1:]).max()) == 0.0


def test_dropout_scales_and_zeroes():
    import jax
    rng = np.random.default_rng(4)
    C, Q, c_mask, q_mask = _rand_inputs(rng)
    A1, *_ = structured_attention(
        jnp.array(C), jnp.array(Q), jnp.array(c_mask), jnp.array(q_mask),
        scale=10.0, dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(0))
    A2, *_ = structured_attention(
        jnp.array(C), jnp.array(Q), jnp.array(c_mask), jnp.array(q_mask),
        scale=10.0)
    assert not np.allclose(np.array(A1), np.array(A2))


def test_context_query_attention_shape():
    rng = np.random.default_rng(5)
    C = rng.standard_normal((3, 7, 8)).astype(np.float32)
    Q = rng.standard_normal((3, 5, 8)).astype(np.float32)
    out = context_query_attention(
        jnp.array(C), jnp.array(Q), jnp.ones((3, 7)), jnp.ones((3, 5)))
    assert out.shape == (3, 7, 8)


def test_l2_normalize_matches_torch_semantics():
    x = np.zeros((2, 4), np.float32)  # zero vector -> eps floor, no nan
    out = np.array(l2_normalize(jnp.array(x)))
    assert np.isfinite(out).all()
