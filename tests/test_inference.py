"""Inference-path unit tests: time conversion + grounding records."""
import numpy as np

from tvqaplus_tpu.infer.predict import get_att_predictions, spans_to_seconds


class TestSpansToSeconds:
    def test_reference_math(self):
        # offset = (first_img_id % 6) / 3; [st*2+off, (ed+1)*2+off]
        # (reference inference.py:68-72)
        assert spans_to_seconds(0, 0, first_img_id=3) == [1.0, 3.0]
        assert spans_to_seconds(2, 4, first_img_id=6) == [4.0, 10.0]

    def test_py2_division_compat(self):
        # python2 floors the offset division: 1 % 6 / 3 -> 0
        assert spans_to_seconds(0, 0, 1, py2_offset_div=True) == [0, 2]
        ts = spans_to_seconds(0, 0, 1, py2_offset_div=False)
        assert abs(ts[0] - 1 / 3) < 1e-9

    def test_double_frame_rate(self):
        # stretch config: frame_interval 3 -> 1 s per grid step;
        # first img id 3 -> offset (3 % 3)/3 = 0
        assert spans_to_seconds(0, 1, 3, frame_interval=3) == [0.0, 2.0]
        assert spans_to_seconds(0, 1, 4, frame_interval=3) == [1 / 3, 2 + 1 / 3]


class TestAttPredictions:
    def _scores(self):
        # (B=1, 5, Li=2, Lqa=3, Lr=2)
        scores = np.full((1, 5, 2, 3, 2), -1.0, np.float32)
        scores[0, 2, 1, 0, 0] = 0.9   # answer 2, img 1, word 0, region 0
        scores[0, 2, 1, 0, 1] = 0.3
        scores[0, 2, 1, 1, 0] = 0.25  # word 1 (not in object vocab)
        return scores

    def test_records_threshold_and_order(self):
        scores = self._scores()
        words = np.zeros((1, 5, 3), np.int32)
        words[0, 2, 0] = 7   # object-vocab word
        words[0, 2, 1] = 99  # not in object vocab
        boxes = [[[[0, 0, 10, 10]], [[0, 0, 10, 10], [5, 5, 20, 20]]]]
        preds = get_att_predictions(
            scores, words, object_word_ids={7}, qids=[42],
            vid_names=["vidA"], img_indices=[[3, 9]], boxes=boxes,
            start_indices=[0], score_thd=0.2)
        assert len(preds) == 1
        rec = preds[0]
        assert set(rec.keys()) == {0, 1, 2, 3, 4}
        entries = rec[2]
        # word 0 appears for both images; img 0 has no score >= 0.2
        by_img = {e["img_idx"]: e for e in entries}
        assert by_img[3]["pred"] == []          # below threshold
        e9 = by_img[9]
        # ascending score order (reference stage.py:793-795)
        assert e9["pred"] == sorted(e9["pred"])
        assert abs(e9["pred"][0] - 0.3) < 1e-6
        assert abs(e9["pred"][1] - 0.9) < 1e-6
        assert e9["qid"] == 42 and e9["vid_name"] == "vidA"
        assert e9["word"] == 7

    def test_randomized_equivalence_vs_naive(self):
        """The hoisted/vectorized assembly must byte-match a direct
        transcription of the reference loop (stage.py:748-806)."""
        rng = np.random.default_rng(0)
        B, A, Li, Lqa, Lr = 3, 5, 6, 7, 4
        scores = rng.uniform(-1, 1, (B, A, Li, Lqa, Lr)).astype(np.float32)
        # force score ties so sort-order differences would surface
        scores[scores > 0.5] = 0.5
        words = rng.integers(0, 12, (B, A, Lqa)).astype(np.int32)
        obj_ids = {2, 3, 5, 7, 11}
        qids = list(range(B))
        vid_names = [f"v{b}" for b in range(B)]
        img_indices = [list(range(1, Li * 6, 6)) for _ in range(B)]
        boxes = [[[[float(i), 0.0, 10.0, 10.0]
                   for i in range(int(rng.integers(0, Lr + 1)))]
                  for _ in range(int(rng.integers(1, Li + 2)))]
                 for _ in range(B)]
        starts = [int(rng.integers(0, 3)) for _ in range(B)]

        def naive(scores, words, obj, qids, vid_names, img_indices, boxes,
                  starts, thd=0.2):
            out = []
            for b in range(len(scores)):
                q = {}
                for a in range(5):
                    q[a] = []
                    for il in range(len(boxes[b])):
                        ig = il + starts[b]
                        if ig >= scores.shape[2]:
                            continue
                        for wi, w in enumerate(words[b, a].tolist()):
                            if w not in obj:
                                continue
                            rs = scores[b, a, ig, wi]
                            nb = len(boxes[b][il])
                            acc = np.nonzero(rs[:nb] >= thd)[0].tolist()
                            sc = [float(rs[i]) for i in acc]
                            bx = [boxes[b][il][i] for i in acc]
                            order = np.argsort(sc)
                            q[a].append({
                                "pred": [sc[i] for i in order],
                                "bbox": [bx[i] for i in order],
                                "word": int(w), "qid": int(qids[b]),
                                "vid_name": vid_names[b],
                                "img_idx": int(img_indices[b][ig])})
                out.append(q)
            return out

        got = get_att_predictions(scores, words, obj_ids, qids, vid_names,
                                  img_indices, boxes, starts)
        want = naive(scores, words, obj_ids, qids, vid_names, img_indices,
                     boxes, starts)
        assert got == want

    def test_regions_clipped_to_box_count(self):
        scores = self._scores()
        words = np.zeros((1, 5, 3), np.int32)
        words[0, 2, 0] = 7
        # img 1 has only ONE box -> region 1's 0.3 score must be ignored
        boxes = [[[[0, 0, 10, 10]], [[0, 0, 10, 10]]]]
        preds = get_att_predictions(
            scores, words, {7}, [1], ["v"], [[3, 9]], boxes, [0])
        e9 = [e for e in preds[0][2] if e["img_idx"] == 9][0]
        assert len(e9["pred"]) == 1 and abs(e9["pred"][0] - 0.9) < 1e-6


class TestCompactedAssembly:
    """assemble_att_predictions (device-compacted serving path) must emit
    byte-identical records to get_att_predictions on the same scores."""

    def test_fuzz_equivalence(self):
        from tvqaplus_tpu.infer.predict import (SCORE_THD,
                                                assemble_att_predictions)
        rng = np.random.default_rng(3)
        B, A, F, LQA, LR, LI = 3, 5, 4, 6, 7, 12
        for trial in range(10):
            scores = rng.uniform(-1, 1, (B, A, F, LQA, LR)).astype(
                np.float32)
            words = rng.integers(0, 12, (B, A, LQA)).astype(np.int32)
            obj_ids = {1, 3, 5, 7}
            qids = list(range(100, 100 + B))
            vid_names = [f"v{b}" for b in range(B)]
            img_indices = [[3 + 6 * i for i in range(LI)]
                           for _ in range(B)]
            starts = rng.integers(0, 3, B).tolist()
            n_frames = rng.integers(0, F + 1, B)
            nb = rng.integers(1, LR + 1, (B, F))
            boxes = [[[[float(j), 0.0, float(j) + 5, 5.0]
                       for j in range(nb[b, f])]
                      for f in range(n_frames[b])] or None
                     for b in range(B)]
            base = get_att_predictions(
                scores, words, obj_ids, qids, vid_names, img_indices,
                boxes, starts, score_thd=SCORE_THD, scores_local=True,
                li_total=LI)
            # numpy mirror of the device compaction (infer_step)
            valid = np.arange(LR)[None, None] < nb[:, :, None]  # (B,F,LR)
            vm = valid[:, None, :, None, :]
            masked = np.where(vm, scores, np.inf)
            order = np.argsort(masked, axis=-1, kind="stable")
            sc_sorted = np.take_along_axis(masked, order, axis=-1)
            n_acc = ((scores >= SCORE_THD) & vm).sum(-1).astype(np.uint8)
            n_valid = valid.sum(-1).astype(np.uint8)
            got = assemble_att_predictions(
                sc_sorted, order.astype(np.int8), n_acc, n_valid,
                words, obj_ids, qids, vid_names, img_indices, boxes,
                starts, li_total=LI)
            assert len(got) == len(base)
            for g_ex, b_ex in zip(got, base):
                assert g_ex.keys() == b_ex.keys()
                for a in g_ex:
                    assert len(g_ex[a]) == len(b_ex[a])
                    for gr, br in zip(g_ex[a], b_ex[a]):
                        assert gr["bbox"] == br["bbox"]
                        assert gr["pred"] == br["pred"], (trial, a)
                        assert {k: gr[k] for k in
                                ("word", "qid", "vid_name", "img_idx")} \
                            == {k: br[k] for k in
                                ("word", "qid", "vid_name", "img_idx")}
