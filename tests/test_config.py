"""Config-system tests: CLI parsing, finalize side effects, opt.json
round-trip and the TestOptions override semantics."""
import json
import os

import pytest

from tvqaplus_tpu.config import Config, build_parser, parse_args


class TestFinalize:
    def test_derived_flags(self, tmp_path):
        cfg = Config(input_streams=["sub"],
                     results_dir_base=str(tmp_path / "r"))
        cfg.finalize(save=False)
        assert cfg.sub_flag and not cfg.vfeat_flag and not cfg.vcpt_flag
        assert cfg.h5driver == "core"

    def test_no_core_driver(self, tmp_path):
        cfg = Config(no_core_driver=True,
                     results_dir_base=str(tmp_path / "r"))
        cfg.finalize(save=False)
        assert cfg.h5driver is None

    def test_debug_rewiring(self, tmp_path):
        cfg = Config(debug=True, results_dir_base="results/run")
        cfg.finalize(save=False)
        # debug redirects under <root>/debug_results (reference
        # config.py:161-164) and forces no_core_driver + 0 workers
        assert cfg.results_dir_base == "results/debug_results"
        assert cfg.no_core_driver and cfg.num_workers == 0
        assert cfg.h5driver is None

    def test_results_dir_timestamped(self, tmp_path):
        cfg = Config(results_dir_base=str(tmp_path / "base"))
        cfg.finalize(save=False)
        assert cfg.results_dir.startswith(str(tmp_path / "base") + "_")

    def test_batch_scaling_by_shards(self, tmp_path):
        cfg = Config(bsz=16, test_bsz=8,
                     results_dir_base=str(tmp_path / "r"))
        cfg.finalize(save=False, n_data_shards=4)
        assert cfg.bsz == 64 and cfg.test_bsz == 32

    def test_num_hard_assertion(self, tmp_path):
        cfg = Config(num_hard=5, num_negatives=2,
                     results_dir_base=str(tmp_path / "r"))
        with pytest.raises(AssertionError):
            cfg.finalize(save=False)

    def test_save_writes_opt_json_and_code_zip(self, tmp_path):
        cfg = Config(results_dir_base=str(tmp_path / "r"))
        cfg.finalize(save=True)
        assert os.path.exists(os.path.join(cfg.results_dir, "opt.json"))
        assert os.path.exists(os.path.join(cfg.results_dir, "code.zip"))
        with open(os.path.join(cfg.results_dir, "opt.json")) as f:
            saved = json.load(f)
        assert saved["lr"] == cfg.lr and saved["hsz"] == cfg.hsz


class TestCli:
    def test_defaults_match_dataclass(self, tmp_path):
        cfg, _ = parse_args(
            ["--results_dir_base", str(tmp_path / "r")], save=False)
        ref = Config()
        assert cfg.lr == ref.lr == 1e-3
        assert cfg.wd == ref.wd == 3e-7
        assert cfg.bsz == ref.bsz == 16
        assert cfg.hsz == 128 and cfg.scale == 10.0 and cfg.alpha == 20.0

    def test_overrides(self, tmp_path):
        cfg, _ = parse_args(
            ["--lr", "0.01", "--bsz", "4", "--use_sup_att", "--add_local",
             "--input_streams", "sub",
             "--results_dir_base", str(tmp_path / "r")], save=False)
        assert cfg.lr == 0.01 and cfg.bsz == 4
        assert cfg.use_sup_att and cfg.add_local
        assert cfg.input_streams == ["sub"] and not cfg.vfeat_flag

    def test_extra_fields(self, tmp_path):
        cfg, extras = parse_args(
            ["--model_dir", "foo", "--results_dir_base", str(tmp_path / "r")],
            extra_fields=(("--model_dir", dict(type=str)),
                          ("--mode", dict(type=str, default="valid"))),
            save=False)
        assert extras.model_dir == "foo" and extras.mode == "valid"

    def test_list_flag_parsing(self, tmp_path):
        cfg, _ = parse_args(
            ["--img_buckets", "8", "16", "--mesh_shape", "2", "4",
             "--results_dir_base", str(tmp_path / "r")], save=False)
        assert cfg.img_buckets == [8, 16]
        assert cfg.mesh_shape == [2, 4]


class TestAutoTpuPolicy:
    """VERDICT r3 item 2: the benchmarked configuration (fused Pallas +
    bfloat16) must be the shipped default on TPU; CPU keeps f32/XLA for
    parity tests.  finalize() resolves `use_pallas=None` /
    `compute_dtype="auto"` from the live jax backend."""

    def test_auto_resolves_cpu(self, tmp_path):
        # the test suite runs on the forced-CPU backend (conftest)
        cfg = Config(results_dir_base=str(tmp_path / "r"))
        assert cfg.use_pallas is None and cfg.compute_dtype == "auto"
        cfg.finalize(save=False)
        assert cfg.use_pallas is False
        assert cfg.compute_dtype == "float32"

    def test_auto_resolves_tpu(self, tmp_path, monkeypatch):
        import tvqaplus_tpu.config as config_mod
        monkeypatch.setattr(config_mod, "backend_is_tpu", lambda: True)
        cfg = Config(results_dir_base=str(tmp_path / "r"))
        cfg.finalize(save=False)
        assert cfg.use_pallas is True
        assert cfg.compute_dtype == "bfloat16"

    def test_explicit_optout_wins(self, tmp_path, monkeypatch):
        import tvqaplus_tpu.config as config_mod
        monkeypatch.setattr(config_mod, "backend_is_tpu", lambda: True)
        cfg = Config(use_pallas=False, compute_dtype="float32",
                     results_dir_base=str(tmp_path / "r"))
        cfg.finalize(save=False)
        assert cfg.use_pallas is False and cfg.compute_dtype == "float32"

    def test_cli_tristate_use_pallas(self, tmp_path):
        base = ["--results_dir_base", str(tmp_path / "r")]
        cfg, _ = parse_args(["--use_pallas"] + base, save=False)
        assert cfg.use_pallas is True  # bare flag forces on, even on CPU
        cfg, _ = parse_args(["--use_pallas", "false"] + base, save=False)
        assert cfg.use_pallas is False
        cfg, _ = parse_args(base, save=False)  # unset -> auto (CPU here)
        assert cfg.use_pallas is False

    def test_resolved_values_persist(self, tmp_path):
        """opt.json must store the RESOLVED policy so inference's
        override_from replays the training configuration verbatim."""
        cfg = Config(results_dir_base=str(tmp_path / "r"))
        cfg.finalize(save=True)
        with open(os.path.join(cfg.results_dir, "opt.json")) as f:
            saved = json.load(f)
        assert saved["use_pallas"] in (True, False)
        assert saved["compute_dtype"] in ("float32", "bfloat16")


class TestOverrideFrom:
    def test_test_options_semantics(self, tmp_path):
        """Every field from the saved run overrides, except `debug`
        (reference config.py:169-174)."""
        train_cfg = Config(lr=0.5, hsz=64, use_sup_att=True,
                           results_dir_base=str(tmp_path / "run"))
        train_cfg.finalize(save=True)
        opt_path = os.path.join(train_cfg.results_dir, "opt.json")

        test_cfg = Config(debug=True, lr=9.9)
        test_cfg.override_from(opt_path)
        assert test_cfg.lr == 0.5 and test_cfg.hsz == 64
        assert test_cfg.use_sup_att
        assert test_cfg.debug  # preserved
        assert test_cfg.no_core_driver  # forced

    def test_round_trip(self, tmp_path):
        cfg = Config(lr=0.123, img_buckets=[5, 7],
                     results_dir_base=str(tmp_path / "r"))
        p = str(tmp_path / "opt.json")
        cfg.save(p)
        loaded = Config.load(p)
        assert loaded.lr == 0.123 and loaded.img_buckets == [5, 7]


def test_q_type_accuracy_breakdown():
    from tvqaplus_tpu.utils.misc import compute_acc_by_type, get_q_type
    w2i = {"what": 3, "who": 4, "where": 5, "how": 6, "why": 7}
    questions = [[3, 9, 9], [4, 9], [99, 1], [3, 2]]
    q_types = get_q_type(questions, w2i)
    assert q_types == ["what", "who", "other", "what"]
    acc = compute_acc_by_type(q_types, [1, 0, 1, 1])
    assert acc["what"]["acc"] == 1.0 and acc["what"]["num_qa"] == 2
    assert acc["who"]["acc"] == 0.0
    assert acc["other"]["num_qa"] == 1
