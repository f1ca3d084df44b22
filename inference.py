"""Inference entrypoint: `python inference.py --model_dir <run> --mode valid`.

Mirrors the reference (inference.py:78-103): reload the training run's
opt.json (every field overridden except debug), restore the best checkpoint,
run test-mode inference and write ``{mode}_inference_predictions.json`` in
the format consumed by the evaluator.
"""
from __future__ import annotations

import os

import jax

# subprocess backend forcing — see main.py (axon overrides JAX_PLATFORMS)
if os.environ.get("TVQA_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TVQA_FORCE_PLATFORM"])

from tvqaplus_tpu.config import parse_args
from tvqaplus_tpu.data.synthetic import SyntheticTVQADataset
from tvqaplus_tpu.infer.predict import InferenceRunner
from tvqaplus_tpu.models.stage import STAGE, ModelConfig
from tvqaplus_tpu.parallel.mesh import make_mesh
from tvqaplus_tpu.train.loop import Trainer
from tvqaplus_tpu.train.state import load_checkpoint
from tvqaplus_tpu.utils.io import save_json

EXTRA_FLAGS = (
    ("--model_dir", dict(type=str, required=True,
                         help="results dir of the training run")),
    ("--mode", dict(type=str, default="valid", help="valid/test")),
    ("--no_strict", dict(action="store_true")),
    ("--torch_checkpoint", dict(type=str, default="",
                                help="load a reference best_valid.pth "
                                     "instead of a flax checkpoint")),
    ("--checkpoint", dict(type=str, default="",
                          help="serve a specific checkpoint file (name "
                               "relative to the run dir, e.g. last.ckpt) "
                               "instead of best_valid.ckpt")),
)


def main_inference(argv=None):
    cfg, extras = parse_args(argv, extra_fields=EXTRA_FLAGS, save=False)
    model_dir = extras.model_dir
    opt_path = (os.path.join(model_dir, "opt.json") if os.path.isdir(model_dir)
                else os.path.join("results", model_dir, "opt.json"))
    run_dir = os.path.dirname(opt_path)
    cfg.override_from(opt_path)  # TestOptions semantics (config.py:169-174)

    mesh = make_mesh(tuple(cfg.mesh_shape))
    trainer = Trainer(cfg, mesh=mesh)  # builds model + state template
    if getattr(extras, "torch_checkpoint", ""):
        # run a reference-trained model directly (torch state_dict format)
        from tvqaplus_tpu.interop.torch_weights import \
            load_reference_checkpoint
        params = load_reference_checkpoint(extras.torch_checkpoint, cfg)
        state = trainer.state.replace(params=params)
    elif getattr(extras, "checkpoint", ""):
        ckpt = extras.checkpoint
        if not os.path.isabs(ckpt):
            ckpt = os.path.join(run_dir, ckpt)
        state, _ = load_checkpoint(ckpt, trainer.state)
    else:
        ckpt = os.path.join(run_dir, "best_valid.ckpt")
        if not os.path.exists(ckpt):
            # best_valid is only written when val acc improves (train
            # loop mirrors reference main.py); a short/degenerate run may
            # never beat 0.0 — fall back to the end-of-epoch snapshot
            last = os.path.join(run_dir, "last.ckpt")
            if os.path.exists(last):
                print(f"warning: {ckpt} missing, using {last}")
                ckpt = last
        state, _ = load_checkpoint(ckpt, trainer.state)

    mode = extras.mode
    if cfg.synthetic_data or not cfg.train_path:
        n = 32 if cfg.debug else cfg.synthetic_n_valid
        dataset = SyntheticTVQADataset(cfg, n, mode=mode)
        object_word_ids = list(range(3, 1000))
    else:
        from tvqaplus_tpu.data.tvqa import TVQAPlusDataset
        dataset = TVQAPlusDataset(cfg, mode=mode)
        object_word_ids = dataset.eval_object_word_ids

    runner = InferenceRunner(cfg, trainer.model, state.params, mesh=mesh)
    predictions = runner.run(dataset, mode=mode,
                             object_word_ids=object_word_ids,
                             debug=cfg.debug)
    pred_path = os.path.join(run_dir,
                             f"{mode}_inference_predictions.json")
    save_json(predictions, pred_path)
    print(f"predictions saved to {pred_path}")
    return pred_path


if __name__ == "__main__":
    main_inference()
