"""TVQAPlusDataset over synthetic artifacts in the EXACT reference formats
(SURVEY.md §2.2) — validates the real-data loading path end-to-end without
the 30 GB feature drop."""
import json
import os

import h5py
import numpy as np
import pytest

from tvqaplus_tpu.config import Config
from tvqaplus_tpu.data.batching import StaticShapeSpec, collate_static
from tvqaplus_tpu.data.tvqa import TVQAPlusDataset

DE = 16   # bert dim (small for tests)
DV = 8    # vfeat dim


def make_artifacts(root):
    """Write a 2-video, 3-QA artifact set in the reference formats."""
    rng = np.random.default_rng(0)
    vids = {"show_ep1_clip1": 40, "show_ep2_clip2": 31}

    def qa(qid, vid, ts, bbox_imgs):
        return {
            "qid": qid, "vid_name": vid,
            "q": "what is sheldon holding",
            "a0": "a cup", "a1": "a laptop", "a2": "a book",
            "a3": "a phone", "a4": "a towel",
            "q_len": 4, "a0_len": 2, "a1_len": 2, "a2_len": 2,
            "a3_len": 2, "a4_len": 2,
            "answer_idx": 1,
            "ts": list(ts),
            "bbox": {str(i): [
                {"img_id": i, "label": "laptop", "top": 10, "left": 10,
                 "width": 50, "height": 40}] for i in bbox_imgs},
        }

    train = [qa(101, "show_ep1_clip1", [2.0, 8.0], [3, 9, 15]),
             qa(102, "show_ep2_clip2", [1.0, 6.0], [4, 10])]
    valid = [qa(201, "show_ep1_clip1", [3.0, 9.0], [9, 15])]
    for name, data in [("train.json", train), ("valid.json", valid)]:
        with open(os.path.join(root, name), "w") as f:
            json.dump(data, f)

    # subtitles: " <eos> "-joined sentences + per-sentence start times
    sub = {}
    for vid in vids:
        sentences = ["hello there", "what are you doing", "that is my spot"]
        sub[vid] = {"sub_text": " <eos> ".join(sentences),
                    "sub_time": [0.0, 4.0, 8.0]}
    with open(os.path.join(root, "sub.json"), "w") as f:
        json.dump(sub, f)

    with open(os.path.join(root, "frm_cnt.json"), "w") as f:
        json.dump(vids, f)

    # qa bert h5: {qid}_q / {qid}_a{k} -> (L, DE)
    with h5py.File(os.path.join(root, "qa_bert.h5"), "w") as h5:
        for qid in (101, 102, 201):
            h5[f"{qid}_q"] = rng.standard_normal((4, DE)).astype(np.float32)
            for k in range(5):
                h5[f"{qid}_a{k}"] = rng.standard_normal(
                    (2, DE)).astype(np.float32)

    # sub bert h5: vid -> (sum tokens, DE); token counts = per-sentence words
    with h5py.File(os.path.join(root, "sub_bert.h5"), "w") as h5:
        for vid in vids:
            n_tok = 2 + 4 + 4  # words per sentence above
            h5[vid] = rng.standard_normal((n_tok, DE)).astype(np.float32)

    # vcpt: per-frame boxes/counts/objects at full frame resolution
    vcpt = {}
    for vid, n_frames in vids.items():
        counts = rng.integers(2, 5, size=n_frames).tolist()
        vcpt[vid] = {
            "counts": counts,
            "boxes": [[[10.0, 10.0, 60.0, 50.0]] * c for c in counts],
            "object": [["laptop desk", "cup"][:c] + ["chair"] * max(0, c - 2)
                       for c in counts],
        }
    with open(os.path.join(root, "vcpt.json"), "w") as f:
        json.dump(vcpt, f)

    # vid h5: vid -> (sum counts, DV)
    with h5py.File(os.path.join(root, "vid.h5"), "w") as h5:
        for vid in vids:
            total = sum(vcpt[vid]["counts"])
            h5[vid] = rng.standard_normal((total, DV)).astype(np.float32)

    with open(os.path.join(root, "word2idx.json"), "w") as f:
        json.dump({"<pad>": 0, "<unk>": 1, "<eos>": 2, "what": 3, "is": 4,
                   "sheldon": 5, "holding": 6, "a": 7, "cup": 8,
                   "laptop": 9, "book": 10, "phone": 11, "towel": 12,
                   "desk": 13, "chair": 14}, f)
    with open(os.path.join(root, "eval_object_vocab.json"), "w") as f:
        json.dump(["cup", "laptop", "book", "phone", "towel"], f)


def make_cfg(root, **kw):
    cfg = Config(
        train_path=os.path.join(root, "train.json"),
        valid_path=os.path.join(root, "valid.json"),
        sub_path=os.path.join(root, "sub.json"),
        frm_cnt_path=os.path.join(root, "frm_cnt.json"),
        qa_bert_path=os.path.join(root, "qa_bert.h5"),
        sub_bert_path=os.path.join(root, "sub_bert.h5"),
        vcpt_path=os.path.join(root, "vcpt.json"),
        vfeat_path=os.path.join(root, "vid.h5"),
        word2idx_path=os.path.join(root, "word2idx.json"),
        eval_object_vocab_path=os.path.join(root, "eval_object_vocab.json"),
        embedding_size=DE, vfeat_size=DV, use_sup_att=True,
        no_core_driver=True,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.finalize(save=False)
    return cfg


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tvqa_artifacts"))
    make_artifacts(root)
    return root


class TestTVQAPlusDataset:
    def test_train_item_structure(self, artifacts):
        ds = TVQAPlusDataset(make_cfg(artifacts), mode="train")
        assert len(ds) == 2
        ex = ds[0]
        assert ex["qid"] == 101 and ex["target"] == 1
        # grid: bbox imgs 3..15, frame interval 6 -> ids 3, 9, 15, 21, ...
        assert ex["image_indices"][0] == 3
        assert all(b - a == 6 for a, b in zip(ex["image_indices"],
                                              ex["image_indices"][1:]))
        assert ex["anno_st_idx"] == 0
        assert len(ex["qas"]) == 5 and len(ex["qas_bert"]) == 5
        assert ex["qas"][1][:4] == [3, 4, 5, 6]  # "what is sheldon holding"
        assert ex["qas_bert"][0].shape == (6, DE)  # 4 q + 2 answer tokens
        n_img = len(ex["image_indices"])
        assert len(ex["sub_bert"]) == n_img
        assert len(ex["vfeat"]) == n_img
        assert ex["vfeat"][0].shape[1] == DV
        # ts label within grid
        st, ed = ex["ts_label"]
        assert 0 <= st <= ed < n_img
        assert ex["boxes"] is None  # train mode

    def test_att_labels_mark_matching_word(self, artifacts):
        ds = TVQAPlusDataset(make_cfg(artifacts), mode="train")
        ex = ds[0]
        labels, defined = ex["att_labels_dense"]
        # GT label 'laptop' == correct answer word 'laptop' (a1="a laptop",
        # word position 5 in "what is sheldon holding a laptop")
        assert labels.sum() > 0
        word_positions = np.nonzero(labels.sum((0, 2)))[0]
        assert list(word_positions) == [5]
        # labels only on annotated grid images (bbox ids 3, 9, 15 ->
        # positions 0..2)
        img_positions = np.nonzero(labels.sum((1, 2)))[0]
        assert set(img_positions) <= {0, 1, 2}
        assert defined.sum() > 0

    def test_valid_mode_has_boxes(self, artifacts):
        ds = TVQAPlusDataset(make_cfg(artifacts), mode="valid")
        ex = ds[0]
        assert ex["boxes"] is not None
        # boxes span the annotated window only
        assert len(ex["boxes"]) >= 1
        assert ex["att_labels_dense"] is not None  # valid keeps labels

    def test_collates_into_static_batch(self, artifacts):
        cfg = make_cfg(artifacts)
        ds = TVQAPlusDataset(cfg, mode="train")
        spec = StaticShapeSpec.from_config(cfg, batch=2, max_img=10)
        arrays, meta = collate_static([ds[0], ds[1]], spec)
        assert arrays["qas_bert"].shape == (2, 5, cfg.max_qa_l, DE)
        assert arrays["vid"].shape == (2, 10, cfg.num_region, DV)
        assert arrays["ex_mask"].sum() == 2
        assert meta["qid"] == [101, 102]

    def test_set_mode_switches_split(self, artifacts):
        ds = TVQAPlusDataset(make_cfg(artifacts), mode="train")
        ds.set_mode("valid")
        assert len(ds) == 1 and ds[0]["qid"] == 201

    def test_eval_object_word_ids(self, artifacts):
        ds = TVQAPlusDataset(make_cfg(artifacts), mode="train")
        assert ds.vocab.get("laptop") in ds.eval_object_word_ids

    def test_double_frame_rate_stretch(self, artifacts):
        """frame_interval 3 (1 fps stretch config) doubles the sampled grid
        density; ids stay phase-locked to the first annotation."""
        ds6 = TVQAPlusDataset(make_cfg(artifacts), mode="train")
        cfg3 = make_cfg(artifacts, frame_interval=3, max_num_img=100)
        ds3 = TVQAPlusDataset(cfg3, mode="train")
        ex6, ex3 = ds6[0], ds3[0]
        assert all(b - a == 3 for a, b in zip(ex3["image_indices"],
                                              ex3["image_indices"][1:]))
        assert len(ex3["image_indices"]) >= 2 * len(ex6["image_indices"]) - 2
        assert 3 in ex3["image_indices"]  # first annotated img on the grid
        st, ed = ex3["ts_label"]
        assert 0 <= st <= ed < len(ex3["image_indices"])

    def test_view_shares_artifacts_independent_mode(self, artifacts):
        ds = TVQAPlusDataset(make_cfg(artifacts), mode="train")
        valid = ds.view("valid")
        assert valid.qa_bert_h5 is ds.qa_bert_h5  # shared handle
        assert valid.mode == "valid" and ds.mode == "train"
        assert len(valid) == 1 and len(ds) == 2
        valid.set_mode("train")
        assert ds.mode == "train" and len(valid) == 2

    def test_vcpt_stream_batch_keys(self, artifacts):
        """With the vcpt input stream requested, the dormant vcpt/vcpt_mask
        batch keys ship (reference pad_collate tvqa_dataset.py:600-605) in
        the hier layout: last word of each region's label per frame."""
        cfg = make_cfg(artifacts, input_streams=["sub", "vfeat", "vcpt"])
        assert cfg.vcpt_flag
        ds = TVQAPlusDataset(cfg, mode="train")
        ex = ds[0]
        assert "vcpt" in ex and len(ex["vcpt"]) == len(ex["image_indices"])
        spec = StaticShapeSpec.from_config(cfg, batch=2, max_img=10)
        assert spec.vcpt
        arrays, _ = collate_static([ds[0], ds[1]], spec)
        assert arrays["vcpt"].shape == (2, 10, cfg.num_region)
        assert arrays["vcpt"].dtype == np.int32
        assert arrays["vcpt_mask"].sum() > 0
        # first frame's first region label word id round-trips
        first_ids = ex["vcpt"][0]
        np.testing.assert_array_equal(
            arrays["vcpt"][0, 0, : len(first_ids)], first_ids)
        # default streams: the keys are absent (no dead upload)
        spec0 = StaticShapeSpec.from_config(make_cfg(artifacts), batch=2,
                                            max_img=10)
        arrays0, _ = collate_static([ds[0]], spec0)
        assert "vcpt" not in arrays0

    def test_mk_noun_mask_collates(self, artifacts):
        """Entries carrying noun annotations produce the qa_noun_masks
        batch key (labels.make_noun_mask -> structured_attention)."""
        cfg = make_cfg(artifacts)
        ds = TVQAPlusDataset(cfg, mode="train")
        entry = dict(ds.cur_data[0])
        entry["q_noun_indices"] = [[3, "sheldon"], [1, "zzznotinvocab"]]
        entry["a1_noun_indices"] = [[2, "laptop"]]
        ds.cur_data = [entry]
        ex = ds[0]
        assert "qa_noun_masks" in ex and len(ex["qa_noun_masks"]) == 5
        # q noun at 1-indexed 3 -> position 2; a1 noun at q_len+2-1 = 5
        assert ex["qa_noun_masks"][1][2] == 1.0
        assert ex["qa_noun_masks"][1][5] == 1.0
        assert ex["qa_noun_masks"][0][5] == 0.0  # a0 has no noun entry
        spec = StaticShapeSpec.from_config(cfg, batch=1, max_img=10)
        arrays, _ = collate_static([ex], spec)
        assert arrays["qa_noun_masks"].shape == (1, 5, cfg.max_qa_l)
        assert arrays["qa_noun_masks"][0, 1, 2] == 1.0
