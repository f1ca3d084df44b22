"""Training / validation drivers around one jitted step.

Mirrors the reference control flow (main.py:18-251) — per-epoch train loop
with every-``log_freq``-batches validation, best-checkpoint saving, plateau
LR scheduling on val accuracy, early stop after ``max_es_cnt`` flat epochs,
hard negatives after ``hard_negative_start`` epochs, debug break at batch 5
with a 4-phase timing dump — but the step itself is a single jit containing
forward, all three losses, backward and the optimizer update (the reference
crosses host<->device several times per step)."""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tvqaplus_tpu.data.batching import StaticShapeSpec, zeros_batch
from tvqaplus_tpu.data.pipeline import DataPipeline
from tvqaplus_tpu.models import losses
from tvqaplus_tpu.models.stage import STAGE, ModelConfig
from tvqaplus_tpu.parallel.mesh import (
    batch_shardings,
    data_parallel_size,
    make_mesh,
    place_state,
    replicated,
    state_shardings,
)
from tvqaplus_tpu.train.metrics import MetricsLogger
from tvqaplus_tpu.train.state import (
    PlateauScheduler,
    TrainState,
    create_train_state,
    load_checkpoint,
    save_checkpoint,
)
from tvqaplus_tpu.utils.misc import AverageMeter, count_parameters


def auto_steps_per_dispatch(cfg, hbm_budget_bytes=6 * 2 ** 30, max_k=16):
    """Pick K for the multi-step dispatch so the K-stacked batch fits a
    conservative HBM budget (the batch is the dominant resident tensor; a
    Li=100 f32 batch is ~2.4 GB — docs/BENCH.md)."""
    from tvqaplus_tpu.data.batching import StaticShapeSpec, zeros_batch
    spec = StaticShapeSpec.from_config(cfg, batch=cfg.bsz,
                                       max_img=cfg.max_num_img)
    batch_bytes = sum(a.nbytes for a in zeros_batch(spec).values())
    return max(1, min(max_k, int(hbm_budget_bytes // max(batch_bytes, 1))))


def log_crossing(prev_steps, new_steps, log_freq):
    """Log-point bookkeeping for multi-step dispatches.

    The reference logs when ``batch_idx % log_freq == 0`` (main.py:81); a
    dispatch covers optimizer-step batches [prev_steps, new_steps), so it
    triggers iff that interval contains a multiple of ``log_freq``.  Returns
    (triggered, batch_index-of-the-log-point).
    """
    assert new_steps - prev_steps <= log_freq, (
        "a dispatch interval spanning more than one log_freq multiple would "
        "silently skip log/validate points; lower steps_per_dispatch "
        f"({new_steps - prev_steps}) or raise log_freq ({log_freq})")
    if prev_steps == 0:
        return True, 0
    if (prev_steps - 1) // log_freq != (new_steps - 1) // log_freq:
        return True, ((prev_steps + log_freq - 1) // log_freq) * log_freq
    return False, 0


def enable_compilation_cache(cache_dir):
    """Persistent XLA compilation cache — one compile per (program, shape)
    across process restarts (TPU compiles are expensive).  TPU-only: CPU AOT
    artifacts are machine-feature-specific and can SIGILL when a cache is
    reused on a different host."""
    if not cache_dir or jax.default_backend() != "tpu":
        return
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags


class Trainer:
    def __init__(self, cfg, mesh=None, logger=None):
        self.cfg = cfg
        enable_compilation_cache(getattr(cfg, "compilation_cache_dir", ""))
        self.steps_per_dispatch = cfg.steps_per_dispatch
        if self.steps_per_dispatch == 0:
            self.steps_per_dispatch = auto_steps_per_dispatch(cfg)
        self.mesh = mesh if mesh is not None else make_mesh(
            tuple(cfg.mesh_shape))
        self.model_cfg = ModelConfig.from_config(cfg)
        self.model = STAGE(self.model_cfg)
        self.logger = logger or MetricsLogger(cfg.results_dir)

        # init params on a template batch (smallest bucket)
        spec = StaticShapeSpec.from_config(
            cfg, batch=2, max_img=min(cfg.img_buckets))
        template = {k: jnp.asarray(v) for k, v in zeros_batch(spec).items()}
        variables = self.model.init(
            {"params": jax.random.PRNGKey(cfg.seed)}, template, train=False)
        self.state, self.tx = create_train_state(
            variables["params"], cfg.lr, cfg.wd, cfg.clip)
        # lay the state out exactly as the jitted step returns it
        # (replicated — or model-axis-sharded under TP — NamedShardings);
        # a SingleDeviceSharding input would trigger a second full compile
        # on step 2
        self.state = place_state(self.mesh, self.state)
        self.n_params = count_parameters(self.state.params)
        self.scheduler = PlateauScheduler(cfg.lr, mode="max", factor=0.5,
                                          patience=10)
        self.rng = jax.random.key(cfg.seed,
                                  impl=getattr(cfg, "rng_impl", "rbg"))
        self.best_acc = 0.0
        self.start_epoch = 0
        if cfg.resume:
            self.state, extra = load_checkpoint(cfg.resume, self.state)
            # restored leaves are host numpy; re-place on the mesh
            self.state = place_state(self.mesh, self.state)
            self.best_acc = extra.get("best_acc", 0.0)
            self.start_epoch = extra.get("epoch", 0)
            self.scheduler.lr = extra.get("lr", cfg.lr)
        self._loss_kwargs = dict(
            att_weight=cfg.att_weight, ts_weight=cfg.ts_weight,
            use_sup_att=cfg.use_sup_att, num_negatives=cfg.num_negatives,
            att_loss_type=cfg.att_loss_type, margin=cfg.margin,
            alpha=cfg.alpha, drop_topk=cfg.drop_topk,
            negative_pool_size=cfg.negative_pool_size,
            num_hard=cfg.num_hard, entry_cap=cfg.att_entry_cap,
            vfeat_flag=cfg.vfeat_flag)
        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self):
        model, tx, loss_kwargs = self.model, self.tx, self._loss_kwargs

        # the raw cosine-score tensors are the largest forward outputs;
        # training consumes only the vid one and only at the target answer
        # (att loss), eval neither — the fused kernel emits exactly that
        # (stage.py need_*_raw / ops/pallas_attention.py raw_mode)
        need_vid_raw = "target" if (loss_kwargs["use_sup_att"]
                                    and loss_kwargs["vfeat_flag"]) else False

        def step_body(state: TrainState, batch, rng, use_hard_negatives):
            step_rng = jax.random.fold_in(rng, state.step)
            drop_rng, att_rng = jax.random.split(step_rng)

            def loss_fn(params):
                out = model.apply({"params": params}, batch, train=True,
                                  rngs={"dropout": drop_rng},
                                  need_sub_raw=False,
                                  need_vid_raw=need_vid_raw)
                return losses.total_loss(
                    out, batch, att_rng, train=True,
                    use_hard_negatives=use_hard_negatives, **loss_kwargs)

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state)
            metrics["grad_norm"] = jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(jnp.square(g)), grads, 0.0) ** 0.5
            return new_state, metrics

        def train_step(state, batch, rng, use_hard_negatives):
            return step_body(state, batch, rng, use_hard_negatives)

        def train_step_scan(state, batches, rng, use_hard_negatives):
            """K optimizer steps in ONE dispatch: lax.scan over a batch
            stack (leading axis K).  Amortizes the per-call host latency
            that dominates small-batch training (docs/BENCH.md)."""
            def body(state, batch):
                return step_body(state, batch, rng, use_hard_negatives)
            return jax.lax.scan(body, state, batches)

        def eval_step(state: TrainState, batch):
            out = model.apply({"params": state.params}, batch, train=False,
                              need_sub_raw=False, need_vid_raw=False)
            _, metrics = losses.total_loss(
                out, batch, jax.random.PRNGKey(0), train=False, **loss_kwargs)
            preds = jnp.argmax(out["answer_scores"], axis=-1)
            return metrics, preds

        def eval_scan(state: TrainState, batches):
            """K same-bucket eval batches per dispatch (lax.map — eval steps
            are independent); same amortization as the train scan."""
            return jax.lax.map(lambda b: eval_step(state, b), batches)

        repl = replicated(self.mesh)
        state_sh = state_shardings(self.mesh, self.state)
        self._train_step = jax.jit(
            train_step, static_argnames=("use_hard_negatives",),
            donate_argnums=(0,),
            out_shardings=(state_sh, repl))
        self._train_step_scan = jax.jit(
            train_step_scan, static_argnames=("use_hard_negatives",),
            donate_argnums=(0,),
            out_shardings=(state_sh, repl))
        self._eval_step = jax.jit(eval_step, out_shardings=(repl, repl))
        self._eval_scan = jax.jit(eval_scan, out_shardings=(repl, repl))

    # ------------------------------------------------------------------
    def _pipeline(self, dataset, shuffle, batch_size, group=1):
        return DataPipeline(dataset, self.cfg, mesh=self.mesh,
                            batch_size=batch_size, shuffle=shuffle,
                            seed=self.cfg.seed,
                            prefetch_depth=self.cfg.prefetch_depth,
                            group=group)

    def _dispatch_train(self, batch, use_hard_negatives):
        """Single- or multi-step (stacked) dispatch; returns summed metrics."""
        if batch["ex_mask"].ndim == 2:  # (K, B): lax.scan multi-step
            self.state, metrics = self._train_step_scan(
                self.state, batch, self.rng,
                use_hard_negatives=use_hard_negatives)
            return {k: (v.sum(0) if getattr(v, "ndim", 0) > 0 else v)
                    for k, v in metrics.items()}
        self.state, metrics = self._train_step(
            self.state, batch, self.rng,
            use_hard_negatives=use_hard_negatives)
        return metrics

    def validate(self, dataset, max_batches=None):
        """Full pass over the valid split; returns (acc, loss, qid_corrects)
        (reference main.py:151-183).  Batches ride the same-bucket grouped
        dispatch (``eval_steps_per_dispatch``) unless a batch budget caps
        the pass (debug / max_batches)."""
        dataset.set_mode("valid")
        group = max(1, getattr(self.cfg, "eval_steps_per_dispatch", 1))
        if max_batches is not None or self.cfg.debug:
            group = 1  # batch-budgeted pass: keep per-batch accounting
        pipeline = self._pipeline(dataset, shuffle=False,
                                  batch_size=self.cfg.test_bsz, group=group)
        totals = {"n_correct": 0.0, "n": 0.0, "loss": 0.0}
        qid_corrects = []
        for i, (batch, meta, _) in enumerate(pipeline):
            stacked = batch["ex_mask"].ndim == 2
            metrics, preds = (self._eval_scan if stacked
                              else self._eval_step)(self.state, batch)
            # targets / example counts come from the HOST-side meta
            # (batching.py) — the only device fetches are model outputs
            preds = np.asarray(jax.device_get(preds))
            totals["n_correct"] += float(np.sum(
                np.asarray(jax.device_get(metrics["n_correct"]))))
            totals["loss"] += float(np.sum(
                np.asarray(jax.device_get(metrics["loss"]))))
            n = len(meta["qid"])          # real examples in the dispatch
            totals["n"] += n
            b = batch["ex_mask"].shape[-1]
            for j in range(n):
                # under stacked dispatch preds is (K, B); meta index j maps
                # to stack row j // b, slot j % b (partial batches can only
                # be the stack's LAST member — shuffle-off iteration)
                p = preds[j // b, j % b] if stacked else preds[j]
                qid_corrects.append("%d\t%d" % (
                    meta["qid"][j], int(p == meta["target"][j])))
            if max_batches is not None and i + 1 >= max_batches:
                break
            if self.cfg.debug and i == 20:
                break
        acc = totals["n_correct"] / max(totals["n"], 1)
        loss = totals["loss"] / max(totals["n"], 1)
        return acc, loss, qid_corrects

    def train_epoch(self, dataset, epoch, use_hard_negatives=False,
                    valid_dataset=None):
        """One epoch (reference main.py:18-148).  Returns best val acc."""
        cfg = self.cfg
        # the prefetch producer thread reads `dataset` concurrently with the
        # mid-epoch validation passes — the two splits must be distinct
        # objects (unlike the reference's single mode-switched dataset,
        # whose fork-based workers were isolated)
        assert valid_dataset is not dataset, (
            "pass separate train/valid dataset objects")
        dataset.set_mode("train")
        pipeline = self._pipeline(dataset, shuffle=True, batch_size=cfg.bsz,
                                  group=self.steps_per_dispatch)
        # the background pipeline folds the reference's separate
        # dataloading/prepare_inputs phases into one staged phase
        meters = {k: AverageMeter() for k in
                  ("dataloading", "forward_backward")}
        window = {"loss": [], "loss_att": [], "loss_ts": [], "loss_cls": [],
                  "att_dropped": [], "n_correct": 0.0, "n": 0.0}
        valid_acc_log = ["batch_idx\tacc"]
        n_steps = len(pipeline)  # optimizer steps, not dispatches
        steps_done = 0           # optimizer steps completed so far

        profiling = False
        timer = time.time()
        for batch_idx, (batch, meta, bucket) in enumerate(pipeline):
            if cfg.profile_dir and epoch == 0 and batch_idx == 8:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            meters["dataloading"].update(time.time() - timer)
            t0 = time.time()
            k = batch["ex_mask"].shape[0] if batch["ex_mask"].ndim == 2 else 1
            prev_steps, steps_done = steps_done, steps_done + k
            metrics = self._dispatch_train(batch, use_hard_negatives)
            if cfg.debug:  # per-step timing only in debug (forces a sync);
                # host fetch, not block_until_ready (no-op on axon —
                # utils/timing.py)
                jax.device_get(metrics["loss"])
            meters["forward_backward"].update(time.time() - t0)

            # keep device arrays; only materialize at log points (no
            # per-step host sync)
            for k in ("loss", "loss_att", "loss_ts", "loss_cls"):
                window[k].append(metrics[k])
            if "att_n_pos_dropped" in metrics:
                window["att_dropped"].append(metrics["att_n_pos_dropped"])
            window["n_correct"] += metrics["n_correct"]
            window["n"] += metrics["n_eff"]

            triggered, log_point = log_crossing(prev_steps, steps_done,
                                                cfg.log_freq)
            if triggered:
                niter = epoch * n_steps + log_point
                if log_point > 0:
                    window = {k: (jax.device_get(v) if k in
                                  ("n_correct", "n") else
                                  [float(x) for x in jax.device_get(v)])
                              for k, v in window.items()}
                    # failure detection (SURVEY §5): the window fetch is the
                    # only place losses materialize on host — a NaN/inf step
                    # anywhere in the window surfaces here at zero extra
                    # sync cost.  Snapshot the diverged state for post-mortem
                    # and halt instead of training on garbage.
                    self._halt_if_nonfinite(window["loss"], epoch,
                                            f"batches [{max(0, log_point - cfg.log_freq)}, {log_point})")
                    n = max(float(window["n"]), 1)
                    self.logger.add_scalar("Train/Acc",
                                           window["n_correct"] / n, niter)
                    self.logger.add_scalar("Train/Loss",
                                           sum(window["loss"]) / n, niter)
                    self.logger.add_scalar("Train/Loss_att",
                                           sum(window["loss_att"]) / n, niter)
                    self.logger.add_scalar("Train/Loss_cls",
                                           sum(window["loss_cls"]) / n, niter)
                    self.logger.add_scalar("Train/Loss_ts",
                                           sum(window["loss_ts"]) / n, niter)
                    if window["att_dropped"]:
                        # silent-truncation canary: positives beyond
                        # att_entry_cap dropped by the att loss (total
                        # over the window; should be 0)
                        self.logger.add_scalar(
                            "Train/Att_pos_dropped",
                            sum(window["att_dropped"]), niter)
                if valid_dataset is not None:
                    valid_acc, valid_loss, _ = self.validate(valid_dataset)
                    self.logger.add_scalar("Valid/Acc", valid_acc, niter)
                    self.logger.add_scalar("Valid/Loss", valid_loss, niter)
                    valid_acc_log.append("%02d\t%.4f" % (log_point, valid_acc))
                    if valid_acc > self.best_acc:
                        self.best_acc = valid_acc
                        self.save(os.path.join(cfg.results_dir,
                                               "best_valid.ckpt"),
                                  epoch=epoch)
                    dataset.set_mode("train")
                    window = {"loss": [], "loss_att": [], "loss_ts": [],
                              "loss_cls": [], "att_dropped": [],
                              "n_correct": 0.0, "n": 0.0}
            if profiling and batch_idx >= 12:
                jax.profiler.stop_trace()
                profiling = False
            timer = time.time()
            # reference debug break at batch 5 (main.py:131) — count batches,
            # not dispatches, under multi-step dispatch
            if cfg.debug and steps_done > 5:
                for name, m in meters.items():
                    print(f"{name}: max {m.max:.4f} min {m.min:.4f} "
                          f"avg {m.avg:.4f}")
                break

        if profiling:
            jax.profiler.stop_trace()
        # tail window: losses accumulated after the last log crossing (and
        # whole epochs shorter than log_freq) still get the non-finite check
        if window["loss"]:
            tail = [float(x) for x in jax.device_get(window["loss"])]
            self._halt_if_nonfinite(tail, epoch, "the epoch's tail window")
        self.logger.append_log("valid_acc.log", valid_acc_log)
        return self.best_acc

    def _halt_if_nonfinite(self, losses_list, epoch, where):
        """Failure detection: NaN/inf training loss -> snapshot the diverged
        state for post-mortem and halt instead of training on garbage."""
        if not getattr(self.cfg, "halt_on_nonfinite", True):
            return
        if np.isfinite(sum(float(x) for x in losses_list)):
            return
        crash = os.path.join(self.cfg.results_dir, "crash_state.ckpt")
        self.save(crash, epoch=epoch)
        raise FloatingPointError(
            f"non-finite training loss in {where} of epoch {epoch}; "
            f"diverged state saved to {crash}")

    def fit(self, train_dataset, valid_dataset):
        """Full training run with plateau LR + early stop
        (reference main.py:186-251)."""
        cfg = self.cfg
        es_cnt = 0
        for epoch in range(self.start_epoch, cfg.n_epoch):
            use_hard = epoch + 1 > cfg.hard_negative_start
            self.logger.add_scalar("learning_rate", self.scheduler.lr,
                                   epoch)
            prev_best = self.best_acc
            cur_acc = self.train_epoch(train_dataset, epoch,
                                       use_hard_negatives=use_hard,
                                       valid_dataset=valid_dataset)
            new_lr = self.scheduler.step(cur_acc)
            self.state = self.state.with_lr(new_lr)
            if cur_acc > prev_best:      # epoch improved the best val acc
                es_cnt = 0
            else:
                es_cnt += 1
                if es_cnt >= cfg.max_es_cnt:
                    print("=> early stop with valid acc %.4f" % self.best_acc)
                    self.logger.export_scalars()
                    break
            self.save(os.path.join(cfg.results_dir, "last.ckpt"), epoch=epoch)
            if cfg.debug:
                break
        return self.best_acc

    def save(self, path, epoch=0):
        save_checkpoint(path, self.state,
                        extra={"best_acc": self.best_acc, "epoch": epoch,
                               "lr": self.scheduler.lr})
