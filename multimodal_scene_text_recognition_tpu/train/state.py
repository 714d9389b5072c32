"""Train state and optimiser assembly.

Optimisation recipe from the reference harness: AdamW lr 1e-4
(training_functions.py:46), global-norm grad clip 2.0 (:94), optional
StepLR(step, gamma) from the legacy loop (train.py:154).  Upgrades: the full
state (params + batch_stats + optimiser + step) is a single checkpointable
pytree — the reference saves bare module weights only (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Any

import optax
from flax import struct
from flax.core import FrozenDict

from ..core.config import TrainConfig


@struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int = 1):
    if cfg.lr_step_size:
        # StepLR semantics: lr * gamma^(epoch // step_size) (reference:
        # train.py:154,267 steps the scheduler per epoch)
        boundaries = {
            cfg.lr_step_size * (i + 1) * steps_per_epoch: cfg.lr_gamma
            for i in range(100)
        }
        base = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    else:
        base = optax.constant_schedule(cfg.lr)
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        return optax.join_schedules([warmup, base], [cfg.warmup_steps])
    return base


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            make_lr_schedule(cfg, steps_per_epoch),
            weight_decay=cfg.weight_decay,
        ),
    )


def create_train_state(model, tx, sample_batch, rng) -> TrainState:
    """Initialise model variables and optimiser state."""
    image = sample_batch["image"]
    if str(image.dtype) == "uint8":  # wire format (data.pipeline); model sees f32
        image = image.astype("float32") / 255.0
    variables = model.init(
        {"params": rng, "dropout": rng, "semantics": rng},
        image,
        sample_batch["text"][:, :-1],
        sample_batch["overlap"],
        sample_batch["scene"],
        sample_batch["ious"],
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
