"""Span-op tests against brute-force numpy oracles (the reference semantics
of find_max_triples / find_max_pair / get_high_iou_sapns / expand_span)."""
import numpy as np
import jax.numpy as jnp

from tvqaplus_tpu.models import spans


def brute_top_span(p1, p2):
    best, st, ed = -1.0, 0, 0
    L = len(p1)
    for i in range(L):
        for j in range(i, L):
            if p1[i] * p2[j] > best:
                best, st, ed = p1[i] * p2[j], i, j
    return st, ed, best


def brute_find_max_pair(p1, p2):
    """Verbatim semantics of reference inference.py:13-35."""
    max_val = 0
    best_span = (0, 1)
    argmax_k1 = 0
    for i in range(len(p1)):
        val1 = p1[argmax_k1]
        if val1 < p1[i]:
            argmax_k1 = i
            val1 = p1[i]
        val2 = p2[i]
        if val1 * val2 > max_val:
            best_span = (argmax_k1, i)
            max_val = val1 * val2
    return best_span, float(max_val)


def test_top_spans_matches_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(20):
        L = 13
        p1 = rng.random(L).astype(np.float32)
        p2 = rng.random(L).astype(np.float32)
        st, ed, conf = spans.top_spans(jnp.array(p1), jnp.array(p2), top_n=1)
        bst, bed, bconf = brute_top_span(p1, p2)
        assert int(st[0]) == bst and int(ed[0]) == bed
        assert abs(float(conf[0]) - bconf) < 1e-6


def test_top_spans_batched_topn():
    rng = np.random.default_rng(1)
    p1 = rng.random((4, 7)).astype(np.float32)
    p2 = rng.random((4, 7)).astype(np.float32)
    st, ed, conf = spans.top_spans(jnp.array(p1), jnp.array(p2), top_n=3)
    assert st.shape == (4, 3)
    assert bool(jnp.all(ed >= st))
    assert bool(jnp.all(conf[:, 0] >= conf[:, 1]))


def test_find_max_pair_matches_reference_scan():
    rng = np.random.default_rng(2)
    for _ in range(30):
        L = 11
        p1 = rng.random(L).astype(np.float64)
        p2 = rng.random(L).astype(np.float64)
        st, ed, val = spans.find_max_pair(jnp.array(p1), jnp.array(p2))
        (bst, bed), bval = brute_find_max_pair(list(p1), list(p2))
        assert (int(st), int(ed)) == (bst, bed)
        assert abs(float(val) - bval) < 1e-6  # f32 on device vs f64 oracle


def test_find_max_pair_first_occurrence_ties():
    p1 = np.array([0.5, 0.5, 0.1])
    p2 = np.array([0.0, 0.4, 0.4])
    st, ed, val = spans.find_max_pair(jnp.array(p1), jnp.array(p2))
    (bst, bed), bval = brute_find_max_pair(list(p1), list(p2))
    assert (int(st), int(ed)) == (bst, bed) == (0, 1)


def test_temporal_iou():
    # same semantics as reference model_utils.py:37-51
    assert abs(float(spans.temporal_iou(0.0, 2.0, 1.0, 3.0)) - 1.0 / 3.0) < 1e-6
    assert float(spans.temporal_iou(0.0, 1.0, 2.0, 3.0)) == 0.0
    assert float(spans.temporal_iou(1.0, 2.0, 1.0, 2.0)) == 1.0


def test_expand_window_mask():
    m = spans.expand_window_mask(jnp.array([2]), jnp.array([4]), 8, extra=1)
    np.testing.assert_array_equal(np.array(m[0]),
                                  [0, 1, 1, 1, 1, 0, 0, 0])
    # lower bound clamps at 0
    m = spans.expand_window_mask(jnp.array([0]), jnp.array([2]), 5, extra=3)
    np.testing.assert_array_equal(np.array(m[0]), [1, 1, 1, 1, 1])


def test_pool_span_masked_max():
    x = jnp.arange(12.0).reshape(1, 6, 2)
    wmask = jnp.array([[0, 1, 1, 0, 0, 0]], jnp.float32)
    out = spans.pool_span(x, wmask)
    np.testing.assert_allclose(np.array(out[0]), [4.0, 5.0])


def test_training_proposals_gt_always_included():
    # logits that put the best span far from GT -> slot 1 gated off
    t = np.full((1, 6, 2), -5.0, np.float32)
    t[0, 5, 0] = t[0, 5, 1] = 5.0  # predicted span (5, 5)
    st, ed, w = spans.training_proposals(
        jnp.array(t), jnp.array([0]), jnp.array([1]),
        jnp.ones((1, 6)))
    assert int(st[0, 0]) == 0 and int(ed[0, 0]) == 2  # GT [st, ed+1)
    assert float(w[0, 0]) == 1.0
    assert float(w[0, 1]) == 0.0  # IoU < 0.5 vs GT

    # predicted span overlapping GT -> kept
    t = np.full((1, 6, 2), -5.0, np.float32)
    t[0, 0, 0] = 5.0
    t[0, 1, 1] = 5.0  # pred span (0, 1)
    st, ed, w = spans.training_proposals(
        jnp.array(t), jnp.array([0]), jnp.array([1]), jnp.ones((1, 6)))
    assert float(w[0, 1]) == 1.0
    assert int(st[0, 1]) == 0 and int(ed[0, 1]) == 2


def test_eval_proposals_shapes():
    rng = np.random.default_rng(3)
    t = rng.standard_normal((2, 5, 9, 2)).astype(np.float32)
    st, ed = spans.eval_proposals(jnp.array(t), jnp.ones((2, 9)))
    assert st.shape == (2, 5) and ed.shape == (2, 5)
    assert bool(jnp.all(ed > st))
