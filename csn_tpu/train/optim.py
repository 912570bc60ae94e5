"""Optimizers and LR schedules with torch-equivalent semantics.

Reference: `MinkowskiNet/lib/solvers.py` — SGD(momentum, dampening) / Adam with
L2 weight decay folded into the gradient, and StepLR / PolyLR / SquaredLR /
ExpLR / ReduceLROnPlateau schedules. MID-FC uses Adam(betas=(0.5, 0.999)) with
StepLR stepped at hand-picked epochs (`MID-FC/ssa_training.py:245-246`).

All step-based schedules are pure functions step -> lr; ReduceLROnPlateau is a
host-side state machine (it reacts to validation loss, which only exists
between epochs). The optimizer is wrapped in `optax.inject_hyperparams` so the
trainer can overwrite `opt_state.hyperparams['lr']` every step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TraceState(NamedTuple):
    momentum: optax.Updates
    step: jnp.ndarray


def torch_sgd_momentum(momentum: float, dampening: float) -> optax.GradientTransformation:
    """torch.optim.SGD momentum: buf <- momentum*buf + (1-dampening)*grad,
    except the very first step where buf <- grad (torch initializes the
    buffer to the raw first gradient, undampened)."""

    def init_fn(params):
        return TraceState(jax.tree_util.tree_map(jnp.zeros_like, params),
                          jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        first = state.step == 0
        new_m = jax.tree_util.tree_map(
            lambda m, g: jnp.where(first, g,
                                   momentum * m + (1.0 - dampening) * g),
            state.momentum, updates)
        return new_m, TraceState(new_m, state.step + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    optimizer: str = "SGD",
    lr: float = 1e-2,
    sgd_momentum: float = 0.9,
    sgd_dampening: float = 0.1,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """`lib/solvers.py:45-63` equivalent. Returns an inject_hyperparams-wrapped
    transformation whose state exposes hyperparams['lr']."""

    if optimizer == "SGD":
        def make(lr):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                torch_sgd_momentum(sgd_momentum, sgd_dampening),
                optax.scale_by_learning_rate(lr),
            )
    elif optimizer == "Adam":
        def make(lr):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(b1=adam_beta1, b2=adam_beta2),
                optax.scale_by_learning_rate(lr),
            )
    else:
        raise ValueError(f"Optimizer type not supported: {optimizer}")

    return optax.inject_hyperparams(lambda lr: make(lr))(lr=lr)


def set_lr(opt_state, lr: float):
    """Overwrite the injected learning rate (plateau scheduler hook)."""
    opt_state.hyperparams["lr"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["lr"])


# ---------------------------------------------------------------------------
# Step-based schedules (`lib/solvers.py:22-42,66-81`)
# ---------------------------------------------------------------------------

def make_lr_schedule(
    scheduler: str,
    base_lr: float,
    *,
    step_size: int = 20000,
    step_gamma: float = 0.1,
    max_iter: int = 60000,
    poly_power: float = 0.9,
    exp_gamma: float = 0.95,
    exp_step_size: float = 445.0,
) -> Optional[Callable[[int], float]]:
    """Returns step -> lr, or None for ReduceLROnPlateau (host-driven)."""
    if scheduler == "StepLR":
        return lambda s: base_lr * step_gamma ** (s // step_size)
    if scheduler == "PolyLR":
        return lambda s: base_lr * (1 - s / (max_iter + 1)) ** poly_power
    if scheduler == "SquaredLR":
        return lambda s: base_lr * (1 - s / (max_iter + 1)) ** 2
    if scheduler == "ExpLR":
        return lambda s: base_lr * exp_gamma ** (s / exp_step_size)
    if scheduler == "ReduceLROnPlateau":
        return None
    raise ValueError(f"Scheduler not supported: {scheduler}")


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau (mode='min', rel threshold).

    The reference drives it with validation loss once per epoch
    (`lib/trainer_csn.py:163-167`) using factor=0.5, patience=10, cooldown=10
    (`trainer_csn.py:41-44`)."""

    lr: float
    factor: float = 0.5
    patience: int = 10
    cooldown: int = 10
    threshold: float = 1e-4
    min_lr: float = 0.0

    best: float = float("inf")
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, d):
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
        self.cooldown_counter = d["cooldown_counter"]
