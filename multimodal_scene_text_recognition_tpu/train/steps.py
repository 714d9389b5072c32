"""Jitted train / eval steps with mesh shardings.

The reference's per-batch work (training_functions.py:78-97: forward,
CE loss with ignore_index=0, backward, clip, step) compiles here into ONE
XLA program; the greedy validation decode (training_functions.py:176) is a
second program (the model's scan decode).  Data parallelism comes from
sharding the batch over the mesh 'data' axis — XLA inserts the grad
all-reduce (replacing nn.DataParallel's scatter/gather, model.py:115).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.charset import GO_ID, PAD_ID
from ..parallel import mesh as mesh_lib
from .state import TrainState


def prep_image(image: jnp.ndarray) -> jnp.ndarray:
    """Accept uint8 crops on the wire (data.pipeline ships uint8 — 4x less
    host->device traffic than f32); convert to f32 [0,1] on device."""
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) / 255.0
    return image


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    counts_pad: bool = True,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Reference loss semantics: CrossEntropyLoss(ignore_index=0) — [GO]
    positions are masked, [PAD] positions are *counted*
    (training_functions.py:36; SURVEY.md §7.1 documents the quirk).
    ``counts_pad=False`` additionally masks [PAD].
    """
    mask = targets != GO_ID
    if not counts_pad:
        mask &= targets != PAD_ID
    if label_smoothing > 0:
        n = logits.shape[-1]
        onehot = jax.nn.one_hot(targets, n)
        soft = onehot * (1 - label_smoothing) + label_smoothing / n
        losses = optax.softmax_cross_entropy(logits, soft)
    else:
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    mask = mask.astype(losses.dtype)
    return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def ctc_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """CTC loss over per-column logits (blank = 0, chars shifted +1 — the
    layout of core.charset.CTCCodec / reference utils.py:5-52).

    The reference ships CTC converters but never wires a CTC criterion;
    here the recipe is end-to-end: ``train.loss=ctc`` +
    ``model.decoder=linear`` + ``model.label_codec=ctc`` routes
    make_train_step / train.loop / cli through this loss, and validation
    decodes with the CTCCodec's greedy best-path collapse.

    logits: [B, T, C]; labels: [B, L] (0-padded); label_lengths: [B].

    Rows with no feasible CTC alignment — a label needs
    ``len + adjacent-repeat-count`` frames (repeats force a blank between
    them), which can exceed T=26 columns for long repeat-heavy words — are
    masked out of the mean: optax returns ~1e5 (−log eps) for them, and one
    such row would otherwise swamp the batch gradient.
    """
    B, T, _ = logits.shape
    logit_paddings = jnp.zeros((B, T), logits.dtype)
    L = labels.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    valid = pos < label_lengths[:, None]
    label_paddings = 1.0 - valid.astype(logits.dtype)
    repeats = jnp.sum(
        (labels[:, 1:] == labels[:, :-1]) & (labels[:, 1:] != 0) & valid[:, 1:],
        axis=1,
    )
    feasible = (label_lengths + repeats) <= T
    losses = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=0
    )
    w = feasible.astype(losses.dtype)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


def ctc_collapse(ids: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Greedy best-path collapse on device: remove repeats, then blanks.

    ``ids`` [B, T] per-column argmax -> [B, out_len] 0-padded collapsed
    rows (the device-side twin of core.charset.CTCCodec.decode)."""
    prev = jnp.pad(ids[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    keep = (ids != 0) & (ids != prev)
    pos = jnp.where(keep, jnp.cumsum(keep, axis=1) - 1, out_len)
    out = jnp.zeros((ids.shape[0], out_len), ids.dtype)
    return jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(out, pos, ids)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    counts_pad: bool = True,
    label_smoothing: float = 0.0,
    donate: bool = True,
    jit_compile: bool = True,
    loss: str = "ce",
) -> Callable:
    """Build the train step: (state, batch, rng) -> (state, metrics).

    ``loss="ctc"`` trains per-column logits (linear decoder + CTCCodec
    labels) with :func:`ctc_loss`; the reported ``token_acc`` is then the
    collapsed-sequence exact-match rate.  ``jit_compile=False`` returns the
    raw python function (for re-jitting with explicit shardings in
    :func:`shard_train_step`)."""
    if loss not in ("ce", "ctc"):
        raise ValueError(f"unknown train loss {loss!r}")

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        text_in = batch["text"][:, :-1]
        targets = batch["text"][:, 1:]
        image = prep_image(batch["image"])

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image,
                text_in,
                batch["overlap"],
                batch["scene"],
                batch["ious"],
                train=True,
                rngs={"dropout": rng, "semantics": rng},
                mutable=["batch_stats"],
            )
            if loss == "ctc":
                labels = batch["text"]  # [B, L], 0-padded CTCCodec rows
                lengths = jnp.sum(labels != 0, axis=1)
                l = ctc_loss(logits, labels, lengths)
            else:
                l = cross_entropy(logits, targets, counts_pad,
                                  label_smoothing)
            return l, (logits, updates.get("batch_stats", state.batch_stats))

        (loss_val, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # greedy teacher-forced train accuracy bookkeeping
        # (training_functions.py:100-114 does this with a host loop; here it
        # stays on device)
        pred_ids = jnp.argmax(logits, axis=-1)
        if loss == "ctc":
            collapsed = ctc_collapse(pred_ids, batch["text"].shape[1])
            token_acc = jnp.mean(
                jnp.all(collapsed == batch["text"], axis=1).astype(jnp.float32)
            )
        else:
            valid = targets != GO_ID
            token_acc = jnp.sum((pred_ids == targets) & valid) / jnp.maximum(
                jnp.sum(valid), 1
            )

        metrics = {
            "loss": loss_val,
            "token_acc": token_acc,
            "grad_norm": optax.global_norm(grads),
        }
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            metrics,
        )

    if not jit_compile:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_device_data_train_step(
    model,
    tx: optax.GradientTransformation,
    counts_pad: bool = True,
    label_smoothing: float = 0.0,
    loss: str = "ce",
) -> Callable:
    """Train step(s) over a device-resident dataset:
    (state, data, idx [K, B] i32, rng) -> (state, metrics stacked [K]).

    ``data`` is the whole packed corpus already in HBM (uint8 images); the
    batch gather happens inside the jitted program, so the only per-step
    host->device transfer is the index block.  With ``steps_per_call`` K>1
    a ``lax.scan`` runs K optimizer steps per dispatch — on a tunneled or
    PCIe-attached chip the per-call dispatch latency otherwise dominates.
    TPU-idiomatic replacement for a host data loader when the corpus fits
    in HBM (a 500k-crop packed synthetic set is ~1.6 GB of a v5e's 16 GB).
    """
    inner = make_train_step(
        model, tx, counts_pad, label_smoothing, jit_compile=False, loss=loss
    )

    def multi_step(state: TrainState, data: Dict[str, jnp.ndarray], idx, rng):
        def body(st, idx_row):
            batch = {k: jnp.take(v, idx_row, axis=0) for k, v in data.items()}
            return inner(st, batch, rng)  # inner folds rng by st.step

        return jax.lax.scan(body, state, idx)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_eval_step(model) -> Callable:
    """Jitted greedy decode: (variables, batch) -> predicted ids [B, T]."""

    def eval_step(variables, batch):
        logits = model.apply(
            variables,
            prep_image(batch["image"]),
            None,
            batch["overlap"],
            batch["scene"],
            batch["ious"],
            train=False,
        )
        return jnp.argmax(logits, axis=-1)

    return jax.jit(eval_step)


def shard_eval_step(model, mesh: Mesh, variables) -> Tuple[Callable, Any]:
    """Mesh-sharded greedy decode: batch over 'data', params per TP rules.

    Returns (eval_step, placed_variables); eval_step(variables, batch) ->
    ids.  Multi-chip inference counterpart of :func:`shard_train_step`.
    """
    var_sh = {
        "params": mesh_lib.param_shardings(mesh, variables["params"]),
        "batch_stats": jax.tree.map(
            lambda _: NamedSharding(mesh, P()), variables["batch_stats"]
        ),
    }
    batch_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    def eval_step(variables, batch):
        logits = model.apply(
            variables, prep_image(batch["image"]), None, batch["overlap"],
            batch["scene"], batch["ious"], train=False,
        )
        return jnp.argmax(logits, axis=-1)

    jitted = jax.jit(
        eval_step,
        in_shardings=(var_sh, batch_sh),
        out_shardings=NamedSharding(mesh, P(mesh_lib.DATA_AXIS)),
    )
    placed = jax.device_put(variables, var_sh)
    return jitted, placed


def shard_beam_step(
    model, mesh: Mesh, variables, beam_size: int = 2
) -> Tuple[Callable, Any]:
    """Mesh-sharded batched beam search: batch over 'data', params per TP
    rules — the beam counterpart of :func:`shard_eval_step`, so the
    [B*K]-flattened ancestry beam is exercised under SPMD partitioning
    too (the beam axis rides inside each data shard; only B is split).

    Returns (beam_step, placed_variables); beam_step(variables, batch) ->
    token ids [B, T].
    """
    from ..models.model import SceneTextModel

    var_sh = {
        "params": mesh_lib.param_shardings(mesh, variables["params"]),
        "batch_stats": jax.tree.map(
            lambda _: NamedSharding(mesh, P()), variables["batch_stats"]
        ),
    }
    batch_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    def beam_step(variables, batch):
        ids, _scores = model.apply(
            variables, prep_image(batch["image"]), batch["overlap"],
            batch["scene"], batch["ious"], beam_size,
            method=SceneTextModel.beam_decode,
        )
        return ids

    jitted = jax.jit(
        beam_step,
        in_shardings=(var_sh, batch_sh),
        out_shardings=NamedSharding(mesh, P(mesh_lib.DATA_AXIS)),
    )
    placed = jax.device_put(variables, var_sh)
    return jitted, placed


def shard_train_step(
    raw_train_step: Callable, mesh: Mesh, state: TrainState
) -> Tuple[Callable, TrainState]:
    """Jit a raw train step with explicit mesh shardings and move the state
    onto the mesh (params TP-sharded per parallel/mesh.py rules, batch DP).

    Pass the output of ``make_train_step(..., jit_compile=False)``."""
    state_sh = TrainState(
        step=NamedSharding(mesh, P()),
        params=mesh_lib.param_shardings(mesh, state.params),
        batch_stats=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), state.batch_stats
        ),
        opt_state=jax.tree.map(
            lambda x: NamedSharding(
                mesh,
                mesh_lib.param_spec(x, mesh.shape[mesh_lib.MODEL_AXIS]),
            ),
            state.opt_state,
        ),
    )
    batch_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    rng_sh = NamedSharding(mesh, P())

    jitted = jax.jit(
        raw_train_step,
        in_shardings=(state_sh, batch_sh, rng_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    placed = jax.device_put(state, state_sh)
    return jitted, placed
