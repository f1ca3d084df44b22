"""Metrics / observability: scalar logging with the reference's metric set.

The reference logs Train/{Acc,Loss,Loss_att,Loss_cls,Loss_ts},
Valid/{Acc,Loss} and learning_rate to tensorboardX plus a ``valid_acc.log``
append file (main.py:95-104, 145-146, 229).  Here scalars always go to a
JSONL stream (``scalars.jsonl``) — machine-readable and dependency-free —
and mirror into TensorBoard when ``tensorboardX``/``torch.utils.tensorboard``
is importable.  ``export_scalars`` reproduces the all_scalars.json dump on
early stop (main.py:244).
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict

from tvqaplus_tpu.utils.io import mkdirp, save_json_pretty


def _try_tb_writer(log_dir):
    try:
        from tensorboardX import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir)
    except ImportError:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir)
    except Exception:
        return None


class MetricsLogger:
    def __init__(self, results_dir, use_tensorboard=True):
        self.results_dir = results_dir
        mkdirp(results_dir)
        self.scalar_path = os.path.join(results_dir, "scalars.jsonl")
        self._f = open(self.scalar_path, "a")
        self.tb = _try_tb_writer(results_dir) if use_tensorboard else None
        self.history = defaultdict(list)

    def add_scalar(self, tag, value, step):
        value = float(value)
        rec = {"tag": tag, "value": value, "step": int(step),
               "ts": time.time()}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        self.history[tag].append((int(step), value))
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars, step, prefix=""):
        for k, v in scalars.items():
            self.add_scalar(prefix + k if prefix else k, v, step)

    def append_log(self, filename, lines):
        """Append raw lines (valid_acc.log contract, main.py:145-146)."""
        with open(os.path.join(self.results_dir, filename), "a") as f:
            f.write("\n".join(lines) + "\n")

    def export_scalars(self, filename="all_scalars.json"):
        save_json_pretty({k: v for k, v in self.history.items()},
                         os.path.join(self.results_dir, filename))

    def close(self):
        self._f.close()
        if self.tb is not None:
            self.tb.close()
