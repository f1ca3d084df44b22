"""Training entrypoint: `python main.py <flags>`.

Mirrors the reference driver (main.py:186-251): parse config, seed, build
dataset + model + optimizer + plateau scheduler, run epochs with
every-log_freq validation, best-checkpoint saving and early stop.

Run `python main.py --synthetic_data --debug` for an end-to-end smoke run
without the TVQA+ feature artifacts (the reference's `run_main.sh debug`
equivalent in this environment).
"""
from __future__ import annotations

import os

import numpy as np

# The axon TPU plugin registers from sitecustomize and overrides
# JAX_PLATFORMS; jax.config.update AFTER import is the way to force a
# backend (tests/conftest.py does the same).  Harnesses that drive this
# CLI as a subprocess (scripts/ref_eval_e2e.py) set TVQA_FORCE_PLATFORM.
if os.environ.get("TVQA_FORCE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TVQA_FORCE_PLATFORM"])

from tvqaplus_tpu.config import parse_args
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.parallel.mesh import data_parallel_size, make_mesh
from tvqaplus_tpu.train.loop import Trainer


def build_datasets(cfg):
    if cfg.synthetic_data or not cfg.train_path:
        n_train = 64 if cfg.debug else cfg.synthetic_n_train
        n_valid = 32 if cfg.debug else cfg.synthetic_n_valid
        train = SyntheticTVQADataset(cfg, n_train, mode="train")
        valid = SyntheticTVQADataset(cfg, n_valid, mode="valid")
        return train, valid
    from tvqaplus_tpu.data.tvqa import TVQAPlusDataset
    train = TVQAPlusDataset(cfg, mode="train")
    valid = train.view("valid")  # shares the loaded artifacts
    return train, valid


def main(argv=None):
    cfg, _ = parse_args(argv, save=False)
    mesh = make_mesh(tuple(cfg.mesh_shape))
    # the reference scales global batch by device count (config.py:187-188);
    # here by the data-parallel mesh size
    cfg.bsz *= data_parallel_size(mesh)
    cfg.test_bsz *= data_parallel_size(mesh)
    cfg.finalize(save=True, n_data_shards=1)
    np.random.seed(cfg.seed)

    train_ds, valid_ds = build_datasets(cfg)
    trainer = Trainer(cfg, mesh=mesh)
    print(f"Parameter count: {trainer.n_params:,d}")
    best_acc = trainer.fit(train_ds, valid_ds)
    print(f"Best val acc: {best_acc:.4f}")
    print(f"Results dir: {cfg.results_dir}")
    return cfg.results_dir, cfg.debug


if __name__ == "__main__":
    main()
