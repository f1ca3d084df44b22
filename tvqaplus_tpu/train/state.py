"""Train state, optimizer, LR scheduling and checkpointing.

* Optimizer matches the reference recipe (main.py:209-219): Adam(lr 1e-3,
  L2 weight decay 3e-7 — torch-style coupled decay, i.e. added to the
  gradient before the moment updates) with global-norm gradient clipping 10
  (main.py:65), expressed as an optax chain.
* ``PlateauScheduler`` reimplements torch.optim.lr_scheduler.ReduceLROnPlateau
  (mode="max", factor 0.5, patience 10, rel threshold 1e-4) driven from the
  host between epochs; the live LR is an ``inject_hyperparams`` state field.
* Checkpoints serialize the full pytree (params + optimizer state + step +
  bookkeeping) — unlike the reference, ``--resume`` is actually honored
  (the reference defines but never consumes it, config.py:55).
"""
from __future__ import annotations

import os
from typing import Any

import flax
import flax.serialization
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    def lr(self):
        """Current learning rate from the injected hyperparams."""
        return float(self.opt_state[-1].hyperparams["learning_rate"])

    def with_lr(self, lr):
        hp = dict(self.opt_state[-1].hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        inner = self.opt_state[-1]._replace(hyperparams=hp)
        return self.replace(opt_state=self.opt_state[:-1] + (inner,))


def make_optimizer(lr, weight_decay, clip):
    """clip-by-global-norm -> torch-style Adam with coupled L2 decay."""

    @optax.inject_hyperparams
    def _adam(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.chain(optax.clip_by_global_norm(clip), _adam(lr))


def create_train_state(params, lr, weight_decay=3e-7, clip=10.0):
    tx = make_optimizer(lr, weight_decay, clip)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    # strongly-type the injected learning rate: inject_hyperparams stores a
    # weak-typed python float, whose aval differs from the strong f32 the
    # first jitted step returns — without this every run recompiles twice
    return state.with_lr(lr), tx


class PlateauScheduler:
    """ReduceLROnPlateau(max, factor, patience, rel threshold) semantics
    (reference main.py:213-219, stepped on val accuracy per epoch)."""

    def __init__(self, init_lr, mode="max", factor=0.5, patience=10,
                 threshold=1e-4, min_lr=0.0):
        assert mode in ("max", "min")
        self.lr = init_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = -float("inf") if mode == "max" else float("inf")
        self.num_bad_epochs = 0

    def _is_better(self, metric):
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold) \
                if self.best >= 0 else metric > self.best * (1.0 - self.threshold)
        return metric < self.best * (1.0 - self.threshold) \
            if self.best >= 0 else metric < self.best * (1.0 + self.threshold)

    def step(self, metric):
        """Returns the (possibly reduced) learning rate."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr


def save_checkpoint(path, state: TrainState, extra=None):
    """Serialize state (+ metadata dict) to a single msgpack file."""
    payload = {"state": flax.serialization.to_state_dict(state),
               "extra": extra or {}}
    data = flax.serialization.msgpack_serialize(
        jax.tree_util.tree_map(
            lambda x: jax.device_get(x) if isinstance(
                x, (jax.Array,)) else x, payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path, state: TrainState):
    """Restore into an existing state template; returns (state, extra)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    restored = flax.serialization.from_state_dict(state, payload["state"])
    return restored, payload.get("extra", {})


def save_params(path, params):
    data = flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(jax.device_get(params)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_params(path, params_template):
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return flax.serialization.from_state_dict(params_template, payload)
