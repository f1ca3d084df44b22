"""Configuration system: typed dataclass + argparse CLI + opt.json round-trip.

Re-designs the reference's two-tier argparse registry (``config.py:9-203``,
``BaseOptions``/``TestOptions``) as a dataclass whose fields are the single
source of truth for both the CLI and the persisted ``opt.json``:

* every semantic flag of the reference is present with the same default
  (lr 1e-3 / wd 3e-7 / bsz 16 / hsz 128 / scale 10 / alpha 20 / length caps
  50/300/300/40 / num_region 25 / encoder configs, reference config.py:23-134);
* ``parse()`` side effects are kept: timestamped results dir
  (config.py:165), code self-snapshot ``code.zip`` (config.py:177-181),
  per-replica batch scaling (config.py:187-188 — here by data-parallel mesh
  size rather than GPU count), derived stream flags (config.py:190-192),
  debug rewires (config.py:161-164), ``num_hard <= num_negatives`` assertion
  (config.py:184);
* ``TestConfig`` semantics: reload the training run's ``opt.json`` and
  override every field except ``debug`` (config.py:169-174).

TPU-specific additions live in their own block: static shape caps (the
reference pads dynamically per batch; XLA needs fixed shapes), length
bucketing, dtype policy, mesh axes.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

from tvqaplus_tpu.utils.io import load_json, make_zipfile, mkdirp, save_json_pretty

_BOOL_FIELDS = set()

# Fields whose CLI value is tri-state: unset -> auto-resolve at finalize().
# `--use_pallas` alone means True; `--use_pallas false` opts out.
_TRISTATE_BOOL_FIELDS = {"use_pallas"}


def backend_is_tpu():
    """True iff jax's default backend drives a TPU chip (including the axon
    plugin, whose platform name is not "tpu" — sniff the device kind too)."""
    try:
        import jax
        dev = jax.devices()[0]
        kind = (getattr(dev, "device_kind", "") or "").lower()
        return "tpu" in (dev.platform or "").lower() or "tpu" in kind
    except Exception:
        return False


def _str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("1", "true", "yes", "on"):
        return True
    if v.lower() in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


@dataclass
class Config:
    # -- bookkeeping ---------------------------------------------------
    debug: bool = False
    results_dir_base: str = "results/results"
    results_dir: str = ""               # derived: results_dir_base + timestamp
    log_freq: int = 800                 # validate/log every N train batches
    seed: int = 2018
    # training PRNG implementation.  "rbg" uses the TPU-native
    # RngBitGenerator: threefry lowers to ~2000 serialized scalar
    # xor/shift ops PER STEP on the entry computation (~20 ms of the
    # round-1 47 ms step at bench shapes — measured, docs/BENCH.md)
    rng_impl: str = "rbg"

    # -- training ------------------------------------------------------
    lr: float = 1e-3
    wd: float = 3e-7
    n_epoch: int = 100
    max_es_cnt: int = 5                 # early-stop patience (epochs)
    bsz: int = 16                       # per-replica batch size
    test_bsz: int = 16
    device: int = 0                     # kept for opt.json parity; unused on TPU
    device_ids: List[int] = field(default_factory=lambda: [0])
    num_workers: int = 2
    t_iter: int = 0                     # temporal-refinement iterations
    t_layer_type: str = "linear"        # {"linear", "conv"}
    extra_span_length: int = 3
    ts_weight: float = 0.5
    add_local: bool = False
    input_streams: List[str] = field(default_factory=lambda: ["sub", "vfeat"])
    vfeat_type: Optional[str] = None
    no_core_driver: bool = False
    no_glove: bool = False
    learn_word_embedding: bool = False
    clip: float = 10.0                  # grad-norm clip
    resume: str = ""                    # checkpoint path; honored (unlike ref)
    non_visual: int = 0                 # number of learned non-visual vectors
    add_non_visual: bool = False
    use_sup_att: bool = False
    att_weight: float = 0.1
    att_iou_thd: float = 0.5
    margin: float = 0.1
    num_region: int = 25
    att_loss_type: str = "lse"          # {"hinge", "lse"}
    scale: float = 10.0
    alpha: float = 20.0
    num_hard: int = 2
    num_negatives: int = 2
    hard_negative_start: int = 100
    negative_pool_size: int = 0
    drop_topk: int = 0

    # -- length caps (reference config.py:88-99) ------------------------
    max_sub_l: int = 50
    max_vid_l: int = 300
    max_vcpt_l: int = 300
    max_q_l: int = 20
    max_a_l: int = 15
    max_qa_l: int = 40

    # -- model ----------------------------------------------------------
    embedding_size: int = 768           # BERT token embedding dim
    hsz: int = 128
    vocab_size: int = 0
    dropout: float = 0.1
    input_encoder_n_blocks: int = 1
    input_encoder_n_conv: int = 2
    input_encoder_kernel_size: int = 7
    input_encoder_n_heads: int = 0
    cls_encoder_n_blocks: int = 1
    cls_encoder_n_conv: int = 2
    cls_encoder_kernel_size: int = 5
    cls_encoder_n_heads: int = 0

    # -- data paths (same artifact contract as reference run_main.sh) ----
    glove_path: str = "data/glove.6B.300d.txt"
    word2idx_path: str = ""
    eval_object_vocab_path: str = ""
    qa_bert_path: str = ""
    sub_bert_path: str = ""
    train_path: str = ""
    valid_path: str = ""
    test_path: str = ""
    vcpt_path: str = ""
    vfeat_path: str = ""
    vfeat_size: int = 300
    sub_path: str = ""
    frm_cnt_path: str = ""

    # -- TPU-native block ------------------------------------------------
    # Static shape caps.  max_num_img bounds the 0.5 fps image axis: with
    # frame_interval 6 and the 300-frame cap (reference utils.py:159) there
    # are at most ceil(300/6) = 50 sampled images.  frame_interval 3 gives
    # the 1 fps stretch configuration (2x frame rate -> max_num_img 100).
    frame_interval: int = 6
    max_num_img: int = 50
    img_buckets: List[int] = field(default_factory=lambda: [16, 32, 50])
    # Subtitle token dedup.  The reference's h5 stores ONE token stream per
    # video (SURVEY §2.2: sub_bert h5 key vid_name -> (sum L_tokens, 768))
    # and its pipeline EXPANDS it into per-frame aligned windows
    # (tvqa_dataset.py:164-185) — frames share sentences, so the expanded
    # (B, Li, Ls, 768) batch re-uploads and re-encodes each token ~5-10x.
    # With sub_dedup the batch carries the unique token stream once
    # (sub_tokens (B, St, 768)) plus int32 window gather indices; the
    # 768->300 bridge + input_embedding run per unique token and the
    # windows are gathered ON DEVICE at hsz — numerically identical at
    # eval (invalid slots gather a reserved all-zero token = the expanded
    # path's zero padding), ~5x less upload bandwidth and bridge compute.
    sub_dedup: bool = True
    # Merge the qa/sub/vid streams into ONE input_encoder call: each
    # stream's pre-encoder embedding is zero-padded to the longest L and
    # concatenated on the group axis, and the conv inputs are re-zeroed at
    # the padded tail so every tap reads exactly what the per-stream SAME
    # padding would (models/stage.py _merged_input_encode) — mathematically
    # exact (tests/test_sub_dedup.py).  Only active with sub_dedup batches.
    # Default False: on the PURE-XLA encoder the +33% padding bytes beat
    # the op-count savings (measured r4: 11.12 vs 10.09 ms/step); it pays
    # off only when the merged site runs the fused encoder kernel (one HBM
    # pass), see docs/BENCH.md.
    merge_input_streams: bool = False
    max_sub_tokens: int = 512           # St cap (unique tokens per example)
    # Per-batch St capacity buckets (host->device bytes are the wall on
    # tunnel-attached hosts — measured ~47 MB/s, docs/BENCH.md): a batch
    # whose streams need fewer unique-token slots ships the smallest bucket
    # covering them instead of the full St cap, exactly like img_buckets on
    # the frame axis (max_sub_tokens is always the implicit top bucket; one
    # extra XLA variant per (Li, St) pair, compiled once ever).  Empty =
    # fixed St (the default).
    sub_token_buckets: List[int] = field(default_factory=list)
    # Batch-level video dedup (serving).  TVQA+ has ~7 QAs per clip
    # (SURVEY: 29.4k QAs / 4.2k train clips) and inference iterates in
    # dataset order, so a test batch usually holds a few distinct videos:
    # ship each unique video's `vid` and `sub_tokens` ONCE per batch
    # (vid_u (U, Li, Lr, Dv), sub_tokens_u (U, St, De), ex_vid (B,) gather
    # index) and expand on device at step start — the two arrays are ~80%
    # of the upload, the serving wall on tunnel hosts.  U pads to the
    # smallest video_buckets entry covering the batch (test_bsz is the
    # implicit top bucket).  Identity = (vid_name, image_indices): the
    # feature h5s key rows by vid_name alone, so equality holds by
    # construction (tvqa_dataset.py:118-135).  Inference-only: the train
    # loop shuffles, so batches rarely share clips.
    video_dedup: bool = False
    video_buckets: List[int] = field(default_factory=lambda: [4, 8])
    max_num_proposal: int = 1           # P = max_num_proposal + 1 slots
    att_entry_cap: int = 128            # max positive att entries per example
    # dtype / kernel policy.  "auto" (the default) resolves at finalize():
    # bfloat16 + fused Pallas kernels when the jax backend drives a TPU,
    # float32 + pure XLA otherwise (CPU parity tests, interpret mode).  The
    # benchmarked configuration IS the shipped default on the chip; pass
    # --compute_dtype float32 / --use_pallas false to opt out.
    compute_dtype: str = "auto"         # {"auto", "float32", "bfloat16"}
    mesh_shape: List[int] = field(default_factory=lambda: [-1, 1])  # (data, ctx[, model])
    use_pallas: Optional[bool] = None   # fused Pallas kernels; None = auto
    py2_offset_div: bool = False        # replicate python2 integer-div offset
    synthetic_data: bool = False        # run on synthetic data (no artifacts)
    synthetic_n_train: int = 256
    synthetic_n_valid: int = 128
    prefetch_depth: int = 2
    steps_per_dispatch: int = 1         # K>1: lax.scan K optimizer steps per
                                        # host dispatch (amortizes latency);
                                        # 0 = auto-size K to fit HBM
    eval_steps_per_dispatch: int = 4    # K same-bucket eval batches per
                                        # dispatch (lax.map; serving twin of
                                        # steps_per_dispatch)
    halt_on_nonfinite: bool = True      # NaN/inf window loss: snapshot
                                        # crash_state.ckpt + halt (train/loop)
    profile_dir: str = ""               # if set, dump a jax.profiler trace
    compilation_cache_dir: str = "~/.cache/tvqaplus_tpu_xla"  # "" disables

    # -- derived (filled by finalize()) ----------------------------------
    h5driver: Optional[str] = "core"
    vfeat_flag: bool = True
    vcpt_flag: bool = False
    sub_flag: bool = True

    def finalize(self, save=True, n_data_shards=1):
        """Apply the reference's parse()-time side effects.

        Args:
          save: write opt.json + code.zip snapshot into results_dir.
          n_data_shards: data-parallel mesh size; global batch = bsz *
            n_data_shards (the reference scales by GPU count,
            config.py:187-188).
        """
        assert self.num_hard <= self.num_negatives, (
            "num_hard must be <= num_negatives")
        assert self.att_loss_type in ("hinge", "lse")
        assert self.t_layer_type in ("linear", "conv")
        if self.debug:
            base = self.results_dir_base.split("/")[0] + "/debug_results"
            self.results_dir_base = base
            self.no_core_driver = True
            self.num_workers = 0
        if not self.results_dir:
            self.results_dir = self.results_dir_base + time.strftime(
                "_%Y_%m_%d_%H_%M_%S")
        self.bsz = self.bsz * n_data_shards
        self.test_bsz = self.test_bsz * n_data_shards
        if self.use_pallas is None or self.compute_dtype == "auto":
            on_tpu = backend_is_tpu()
            if self.use_pallas is None:
                self.use_pallas = on_tpu
            if self.compute_dtype == "auto":
                self.compute_dtype = "bfloat16" if on_tpu else "float32"
        assert self.compute_dtype in ("float32", "bfloat16")
        self.h5driver = None if self.no_core_driver else "core"
        self.vfeat_flag = "vfeat" in self.input_streams
        self.vcpt_flag = "vcpt" in self.input_streams
        self.sub_flag = "sub" in self.input_streams
        if save:
            mkdirp(self.results_dir)
            save_json_pretty(self.to_dict(),
                             os.path.join(self.results_dir, "opt.json"))
            code_dir = os.path.dirname(os.path.realpath(__file__))
            make_zipfile(code_dir,
                         os.path.join(self.results_dir, "code.zip"),
                         enclosing_dir="code",
                         exclude_paths=["results", "__pycache__"],
                         exclude_extensions=[".pyc", ".ipynb"])
        return self

    # -- (de)serialization -------------------------------------------------
    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def save(self, path):
        save_json_pretty(self.to_dict(), path)

    @classmethod
    def load(cls, path):
        return cls.from_dict(load_json(path))

    def override_from(self, saved_opt_path, keep=("debug",)):
        """TestConfig semantics: every field from the saved run's opt.json
        overrides this config, except fields in ``keep``
        (reference config.py:169-174)."""
        saved = load_json(saved_opt_path)
        known = {f.name for f in dataclasses.fields(type(self))}
        for k, v in saved.items():
            if k in known and k not in keep:
                setattr(self, k, v)
        self.no_core_driver = True
        self.h5driver = None
        return self

    # convenience views
    @property
    def max_len_dict(self):
        return dict(max_sub_l=self.max_sub_l, max_vid_l=self.max_vid_l,
                    max_vcpt_l=self.max_vcpt_l, max_qa_l=self.max_qa_l)


def _list_elem_type(annotation):
    """Element type of a List[...] dataclass annotation.  Annotations are
    strings under ``from __future__ import annotations`` — parse both
    forms; None when the element type isn't a plain builtin."""
    if not isinstance(annotation, str):
        import typing
        args = typing.get_args(annotation)
        return args[0] if args and args[0] in (int, float, str) else None
    inner = annotation.strip()
    if inner.startswith(("List[", "list[")):
        inner = inner[5:-1].strip()
        return {"int": int, "float": float, "str": str}.get(inner)
    return None


def _add_field_arg(parser, f):
    name = "--" + f.name
    if f.name in _TRISTATE_BOOL_FIELDS:
        # unset -> None (auto-resolve at finalize); bare `--flag` -> True;
        # `--flag false` -> explicit opt-out
        parser.add_argument(name, nargs="?", const=True, type=_str2bool,
                            default=None)
        _BOOL_FIELDS.add(f.name)
    elif f.type in ("bool", bool) or isinstance(f.default, bool):
        parser.add_argument(name, action="store_true", default=None)
        _BOOL_FIELDS.add(f.name)
    elif f.default_factory is not dataclasses.MISSING:  # type: ignore
        proto = f.default_factory()  # type: ignore
        # element type from the annotation (List[int] / List[str]) so
        # empty-default lists parse correctly; prototype as fallback
        elem_t = _list_elem_type(f.type) or (type(proto[0]) if proto else int)
        parser.add_argument(name, nargs="+", type=elem_t, default=None)
    else:
        t = type(f.default) if f.default is not None else str
        if t is type(None):
            t = str
        parser.add_argument(name, type=t, default=None)


def build_parser(extra_fields=()):
    """Build an argparse parser from the Config dataclass fields."""
    parser = argparse.ArgumentParser(
        description="TPU-native STAGE (TVQA+ video QA)")
    for f in dataclasses.fields(Config):
        if f.name in ("results_dir", "h5driver", "vfeat_flag", "vcpt_flag",
                      "sub_flag"):
            continue  # derived
        _add_field_arg(parser, f)
    for name, kwargs in extra_fields:
        parser.add_argument(name, **kwargs)
    return parser


def parse_args(argv=None, extra_fields=(), save=True, n_data_shards=1):
    """CLI entry: defaults come from Config, CLI flags override, then
    finalize() applies derived side effects.  Returns (config, extra_ns)."""
    parser = build_parser(extra_fields)
    ns = parser.parse_args(argv)
    cfg = Config()
    extra_names = {n.lstrip("-").replace("-", "_") for n, _ in extra_fields}
    extras = argparse.Namespace()
    for k, v in vars(ns).items():
        if k in extra_names:
            setattr(extras, k, v)
        elif v is not None:
            setattr(cfg, k, v)
    cfg.finalize(save=save, n_data_shards=n_data_shards)
    return cfg, extras
