"""I/O + metrics-logger coverage."""
import json
import os
import zipfile

import numpy as np

from tvqaplus_tpu.train.metrics import MetricsLogger
from tvqaplus_tpu.utils.io import (
    load_glove,
    load_json,
    load_pickle,
    make_zipfile,
    read_json_lines,
    save_json,
    save_json_pretty,
    save_jsonl,
    save_pickle,
)
from tvqaplus_tpu.utils.misc import AverageMeter, Timer, get_show_name, \
    match_stanford_tokenizer


def test_json_round_trips(tmp_path):
    p = str(tmp_path / "x.json")
    save_json({"a": [1, 2]}, p)
    assert load_json(p) == {"a": [1, 2]}
    save_json_pretty({"b": 1, "a": 2}, p)
    text = open(p).read()
    assert text.index('"a"') < text.index('"b"')  # sorted keys


def test_jsonl(tmp_path):
    p = str(tmp_path / "x.jsonl")
    save_jsonl([{"i": 0}, {"i": 1}], p)
    save_jsonl([{"i": 2}], p, append=True)
    assert [r["i"] for r in read_json_lines(p)] == [0, 1, 2]


def test_pickle_round_trip(tmp_path):
    p = str(tmp_path / "x.pkl")
    save_pickle({"arr": np.arange(3)}, p)
    out = load_pickle(p)
    np.testing.assert_array_equal(out["arr"], np.arange(3))


def test_load_glove(tmp_path):
    p = str(tmp_path / "glove.txt")
    with open(p, "w") as f:
        f.write("cat 0.1 0.2 0.3\ndog -1 2 3\n")
    g = load_glove(p)
    np.testing.assert_allclose(g["cat"], [0.1, 0.2, 0.3])
    assert set(g) == {"cat", "dog"}


def test_make_zipfile_excludes(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "keep.py").write_text("x = 1")
    (src / "skip.pyc").write_text("no")
    (src / "sub" / "nested.py").write_text("y = 2")
    out = str(tmp_path / "code.zip")
    make_zipfile(str(src), out, enclosing_dir="code",
                 exclude_extensions=[".pyc"])
    names = zipfile.ZipFile(out).namelist()
    assert any(n.endswith("keep.py") for n in names)
    assert any(n.endswith("nested.py") for n in names)
    assert not any(n.endswith(".pyc") for n in names)


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.add_scalar("Train/Acc", 0.5, 1)
    logger.add_scalars({"Loss": 2.0}, 1, prefix="Valid/")
    logger.append_log("valid_acc.log", ["0\t0.5"])
    logger.export_scalars()
    logger.close()
    recs = read_json_lines(str(tmp_path / "scalars.jsonl"))
    assert {r["tag"] for r in recs} == {"Train/Acc", "Valid/Loss"}
    dumped = load_json(str(tmp_path / "all_scalars.json"))
    assert dumped["Train/Acc"] == [[1, 0.5]]
    assert open(tmp_path / "valid_acc.log").read() == "0\t0.5\n"


def test_average_meter_and_timer():
    m = AverageMeter()
    for v in (1.0, 3.0):
        m.update(v)
    assert m.avg == 2.0 and m.max == 3.0 and m.min == 1.0
    with Timer(m):
        pass
    assert m.count == 3


def test_tokenizer_and_show_name():
    # quote-splitting then contraction re-fusion (reference utils.py:336-337)
    assert match_stanford_tokenizer("don't") == "don't"
    assert match_stanford_tokenizer("it's") == "it 's"
    assert match_stanford_tokenizer("cannot") == "can not"
    assert get_show_name("friends_s01e01_seg01") == "friends"
    assert get_show_name("s01e02_seg01") == "bbt"
