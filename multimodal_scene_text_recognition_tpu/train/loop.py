"""Training harness: epoch loop, in-loop validation, best-model gating, logs.

Capability parity with reference training_functions.py:30-148:
  * pre-training validation pass (reference:59);
  * epoch loop over shuffled batches with loss/train-acc bookkeeping
    (reference:71-117);
  * validation every ``validation_steps`` iterations; on a new best, append
    to the CSV log and checkpoint (reference:120-137), gated by
    ``model_save_threshold`` (reference:69, config.py:21);
  * ``iteration_limit`` — honoured by actually stopping (the reference
    checks but never breaks, reference:138-140).

Upgrades over the reference: running-average metrics stay on device until
logged; checkpoints carry the full train state and support resume
(SURVEY.md §5.4); per-step wall-clock telemetry (SURVEY.md §5.1).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.charset import AttnCodec, CTCCodec
from ..core.config import Config
from ..core.metrics import Averager
from ..data.pipeline import (
    Batcher,
    PackedSamples,
    Prefetcher,
    device_batch,
    packed_batches,
)
from ..eval.evaluate import validate
from .checkpoint import save_checkpoint
from .state import TrainState, create_train_state, make_optimizer
from .steps import (
    make_device_data_train_step,
    make_eval_step,
    make_train_step,
)


class CSVLog:
    """Append-style training log (reference: training_functions.py:49,128-129
    writes a pandas frame per new-best; columns iter/cost_avg/val_acc/train_acc)."""

    COLUMNS = ["iter", "cost_avg", "val_acc", "train_acc"]

    def __init__(self, path: str):
        self.path = path
        self.rows: List[Dict] = []
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        self._has_header = (
            os.path.exists(path) and os.path.getsize(path) > 0
        )

    def append(self, **row):
        r = {c: row.get(c, "n/a") for c in self.COLUMNS}
        self.rows.append(r)
        # true append — O(1) per event, resume-safe (no whole-file rewrite)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.COLUMNS)
            if not self._has_header:
                w.writeheader()
                self._has_header = True
            w.writerow(r)


def build_codec(cfg: Config):
    """Label codec for the configured recipe; validates the CTC combination
    (reference utils.py:5-99 ships the CTC converter unwired — here the
    recipe is a first-class, checked configuration)."""
    if cfg.train.loss == "ctc" or cfg.model.label_codec == "ctc":
        if cfg.train.loss != "ctc" or cfg.model.label_codec != "ctc":
            raise ValueError(
                "CTC training needs BOTH train.loss=ctc and "
                "model.label_codec=ctc (got "
                f"loss={cfg.train.loss!r}, codec={cfg.model.label_codec!r})"
            )
        if cfg.model.decoder != "linear":
            raise ValueError(
                "train.loss=ctc requires model.decoder=linear (per-column "
                f"logits); got {cfg.model.decoder!r}"
            )
        return CTCCodec(cfg.model.chars, cfg.model.max_text_length)
    return AttnCodec(cfg.model.chars, cfg.model.max_text_length)


def train(
    cfg: Config,
    model,
    train_samples,
    val_samples,
    state: Optional[TrainState] = None,
    device_put=None,
    log_every: int = 50,
    verbose: bool = True,
) -> TrainState:
    """Train ``model`` (reference train(), training_functions.py:30-148)."""
    from ..data.lmdb_data import BalancedMixture

    codec = build_codec(cfg)
    # ratio-mixed multi-source corpora are a batch STREAM (quota draws per
    # batch, independent rewinds — reference dataset.py:17-100), not a
    # packable Sequence; they train through the host collate + prefetch path
    mixture = isinstance(train_samples, BalancedMixture)
    n_train = (sum(len(s) for s in train_samples.sources) if mixture
               else len(train_samples))
    steps_per_epoch = max(n_train // cfg.train.batch_size, 1)

    # one upfront pack: per-batch host work drops to fancy-index gathers and
    # the wire format is uint8 (see data.pipeline.PackedSamples)
    packed_train = (None if mixture
                    else PackedSamples.from_samples(train_samples, codec))
    packed_val = PackedSamples.from_samples(val_samples, codec)
    batcher = Batcher(codec, cfg.train.batch_size) if mixture else None

    tx = make_optimizer(cfg.train, steps_per_epoch)
    rng = jax.random.PRNGKey(cfg.train.seed)

    if state is None:
        if mixture:
            sample_batch = batcher.collate(train_samples.next_batch())
        else:
            sample_batch = next(iter(packed_batches(
                packed_train, min(len(packed_train), cfg.train.batch_size),
                shuffle=False, drop_last=False)))
        dev = device_batch(sample_batch, device_put)
        state = create_train_state(model, tx, dev, rng)

    # device-resident dataset: gather batches by index inside the jitted
    # step (the index vector is the only per-step host->device transfer)
    packed_bytes = 0 if mixture else sum(
        getattr(packed_train, k).nbytes
        for k in ("image", "text", "overlap", "scene", "ious")
    )
    use_device_data = (
        not mixture
        and cfg.train.device_data
        and packed_bytes <= cfg.train.device_data_max_mb * 2**20
    )
    if use_device_data:
        data_dev = jax.device_put({
            k: getattr(packed_train, k)
            for k in ("image", "text", "overlap", "scene", "ious")
        })
        dd_step = make_device_data_train_step(
            model, tx, counts_pad=cfg.train.loss_counts_pad,
            label_smoothing=cfg.train.label_smoothing, loss=cfg.train.loss,
        )
    else:
        train_step = make_train_step(
            model, tx, counts_pad=cfg.train.loss_counts_pad,
            label_smoothing=cfg.train.label_smoothing, loss=cfg.train.loss,
        )
    eval_step = make_eval_step(model)

    def run_validation(st: TrainState) -> float:
        val_iter = packed_batches(packed_val, cfg.train.batch_size,
                                  shuffle=False, drop_last=False,
                                  seed=cfg.train.seed)
        res = validate(eval_step, st.variables(), val_iter, codec,
                       print_samples=verbose, device_put=device_put)
        return res.accuracy

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    if verbose:
        print(f"--- Training for {cfg.train.epochs} epochs. "
              f"Number of parameters: {n_params}")

    log = CSVLog(os.path.join(
        cfg.results_dir, f"{cfg.experiment}_training_log.csv"))

    # pre-training validation (reference:59)
    val_acc = run_validation(state)
    log.append(iter=0, cost_avg="n/a", val_acc=val_acc, train_acc="n/a")
    if verbose:
        print(f"  - initial val acc: {val_acc}%", flush=True)

    best_accuracy = cfg.train.model_save_threshold
    loss_avg = Averager()
    acc_avg = Averager()
    iteration = int(state.step)
    stop = False

    for epoch in range(cfg.train.epochs):
        if stop:
            break
        if verbose:
            print(f"  - Epoch: {epoch + 1}", flush=True)
        if use_device_data:
            B = cfg.train.batch_size
            n_steps = len(packed_train) // B
            K = max(1, min(cfg.train.steps_per_call, n_steps))
            # truncate to the iteration limit so K-step blocks never
            # overshoot it (the final block may be shorter: at most one
            # extra compile per run at the remainder shape)
            n_avail = n_steps
            if cfg.train.iteration_limit:
                n_avail = min(
                    n_steps, max(cfg.train.iteration_limit - iteration, 0))
            order = np.random.default_rng(
                cfg.train.seed + epoch).permutation(len(packed_train))
            flat = order[: n_avail * B].reshape(-1, B)
            epoch_iter = (
                jnp.asarray(flat[i : i + K], jnp.int32)
                for i in range(0, len(flat), K)
            )
        else:
            # collate AND device_put happen in the prefetch thread so the
            # host->device copy overlaps the previous step's compute
            if mixture:
                gen = (
                    device_batch(
                        batcher.collate(train_samples.next_batch()),
                        device_put)
                    for _ in range(steps_per_epoch)
                )
            else:
                gen = (
                    device_batch(b, device_put)
                    for b in packed_batches(packed_train,
                                            cfg.train.batch_size,
                                            shuffle=True,
                                            seed=cfg.train.seed + epoch)
                )
            epoch_iter = Prefetcher(gen, depth=4)
        t_last = time.perf_counter()
        iter_last = iteration
        pending = []  # device-side metrics; fetched only at logging points
        next_log = (iteration // log_every + 1) * log_every
        next_val = (
            (iteration // cfg.train.validation_steps + 1)
            * cfg.train.validation_steps
        )
        for dev in epoch_iter:
            if use_device_data:
                # dev is a [K, B] index block: K optimizer steps per call
                state, metrics = dd_step(state, data_dev, dev, rng)
                iteration += int(dev.shape[0])
            else:
                state, metrics = train_step(state, dev, rng)
                iteration += 1

            # keep metrics on device — a float() here would synchronise the
            # dispatch queue every step and stall the chip
            pending.append(metrics)

            hit_log = iteration >= next_log
            hit_val = iteration >= next_val
            if hit_log or hit_val:
                # ONE stacked transfer for the whole window — per-scalar
                # float() fetches are a host round-trip each, which on a
                # tunneled chip costs more than the steps themselves
                fetched = jax.device_get(jax.tree.map(
                    lambda *xs: jnp.concatenate(
                        [jnp.atleast_1d(x) for x in xs]),
                    *pending,
                ))
                for l, a in zip(fetched["loss"], fetched["token_acc"]):
                    loss_avg.add(float(l))
                    acc_avg.add(float(a))
                pending = []
            if hit_log:
                # advanced here (not in the verbose print below) so that
                # with verbose=False the blocking device_get above still
                # happens only once per log window, not every step
                next_log = (iteration // log_every + 1) * log_every

            if verbose and hit_log:
                n_done = iteration - iter_last
                dt = (time.perf_counter() - t_last) / max(n_done, 1)
                t_last = time.perf_counter()
                iter_last = iteration
                print(
                    f"    iter {iteration}: loss {loss_avg.val():.4f} "
                    f"token_acc {acc_avg.val():.3f} "
                    f"({cfg.train.batch_size / dt:.0f} crops/s)",
                    flush=True,
                )

            if hit_val:
                next_val = (
                    (iteration // cfg.train.validation_steps + 1)
                    * cfg.train.validation_steps
                )
                val_acc = run_validation(state)
                if verbose:
                    print(f"  - iter {iteration}: {val_acc}% | "
                          f"Best: {best_accuracy}%", flush=True)
                if val_acc > best_accuracy:
                    best_accuracy = val_acc
                    log.append(iter=iteration, cost_avg=loss_avg.val(),
                               val_acc=val_acc, train_acc=acc_avg.val())
                    ckpt_dir = os.path.join(cfg.results_dir, "models",
                                            cfg.experiment)
                    save_checkpoint(ckpt_dir, state)
                    if verbose:
                        print("  - New best model saved")
                    loss_avg.reset()
                    acc_avg.reset()

            if cfg.train.iteration_limit and iteration >= cfg.train.iteration_limit:
                if verbose:
                    print(f"--- Iteration limit reached: {iteration}")
                stop = True
                break

    if verbose:
        print("--- Finished Training")
    return state
