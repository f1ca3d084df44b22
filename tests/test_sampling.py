"""Golden tests for frame sampling / ts labels / subtitle alignment — these
encode the dataset-semantics correctness risk (SURVEY.md §7 step 1)."""
import numpy as np
import pytest

from tvqaplus_tpu.data.sampling import (
    find_match,
    get_aligned_sub,
    get_aligned_sub_indices,
    get_all_img_ids,
    get_ts_label,
)


class TestGetAllImgIds:
    def test_phase_locked_grid(self):
        # start id 9 -> residual 3 -> grid 3, 9, 15, ...
        indices, s, e = get_all_img_ids(9, 21, num_imgs=30)
        assert indices == [3, 9, 15, 21, 27]
        assert indices[s] == 9 and indices[e] == 21

    def test_residual_zero_maps_to_interval(self):
        # start id 12 -> residual 0 -> grid starts at 6
        indices, s, e = get_all_img_ids(12, 18, num_imgs=25)
        assert indices == [6, 12, 18, 24]
        assert indices[s] == 12 and indices[e] == 18

    def test_caps_at_300_frames(self):
        indices, _, _ = get_all_img_ids(6, 294, num_imgs=500)
        assert indices[-1] <= 300
        assert len(indices) == 50

    def test_end_id_beyond_frame_count_clamps(self):
        # end_img_id not on the grid (beyond num_imgs) -> last index
        indices, s, e = get_all_img_ids(3, 99, num_imgs=40)
        assert e == len(indices) - 1

    def test_max_grid_length_is_50(self):
        for start in range(1, 7):
            indices, _, _ = get_all_img_ids(start, start, num_imgs=300)
            assert len(indices) <= 50


class TestGetTsLabel:
    def test_basic_span(self):
        # indices are 0-indexed frames; ts in seconds * fps 3
        indices = np.array([2, 8, 14, 20, 26])
        # st=3s -> frame 9; searchsorted left -> idx 2; ed=7s -> 21 ->
        # searchsorted right over [2,8,14,20,26] -> 4 -> ed-1 = 3
        assert get_ts_label(3.0, 7.0, 100, indices) == [2, 3]

    def test_clamp_to_last(self):
        indices = np.array([2, 8, 14])
        st_ed = get_ts_label(20.0, 30.0, 100, indices)
        assert st_ed == [2, 2]

    def test_equal_start_end(self):
        indices = np.array([2, 8, 14, 20])
        # st and ed both map into the same cell
        st_ed = get_ts_label(0.1, 0.2, 100, indices)
        assert st_ed[0] <= st_ed[1]

    def test_long_video_rescaled(self):
        indices = np.arange(0, 300, 6)
        short = get_ts_label(10.0, 20.0, 300, indices)
        # 600-frame video: timestamps scaled by 300/600
        long = get_ts_label(20.0, 40.0, 600, indices)
        assert short == long


class TestSubtitleAlignment:
    def test_find_match_nearest(self):
        assert find_match(np.array([0.0, 2.0, 4.0, 8.0]), 3.0,
                          mode="nearest") == [1, 2]

    def test_find_match_larger(self):
        subtime = np.array([0.0, 2.0, 4.0, 8.0])
        assert find_match(subtime, 5.0, mode="larger") == [1, 2, 3]
        assert find_match(subtime, 0.5, mode="larger") == [0, 1]

    def test_find_match_span(self):
        subtime = np.array([0.0, 2.0, 4.0, 8.0])
        # leading sentences are prepended (duplicates kept, reference
        # tvqa_dataset.py:272-275)
        assert find_match(subtime, 1.0, mode="span") == [0, 1, 0, 1]

    def test_aligned_indices_and_text(self):
        subtext = "hello there <eos> general kenobi <eos> you are bold"
        subtime = [0.0, 2.0, 4.0]
        idxs, n_tokens = get_aligned_sub_indices(
            [3, 9], subtext, subtime, mode="larger")
        assert n_tokens == [2, 2, 3]
        # frame 3 -> t=1.0 -> idx 0 -> [0, 1] (idx-1 clipped)
        assert idxs[0] == [0, 1]
        # frame 9 -> t=3.0 -> idx 1 -> [0, 1, 2]
        assert idxs[1] == [0, 1, 2]
        texts = get_aligned_sub(subtext, idxs)
        assert texts[0] == "hello there general kenobi"
        assert texts[1] == "hello there general kenobi you are bold"
