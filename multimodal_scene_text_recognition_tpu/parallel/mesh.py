"""Device mesh + sharding rules — the reference's multi-device story, TPU-native.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference: model.py:115): replicate the module, scatter the batch, gather
outputs, reduce grads to a primary GPU.  The TPU equivalent (SURVEY.md §5.8)
is a ``jax.sharding.Mesh`` with the batch sharded over a ``data`` axis and
XLA emitting the gradient all-reduce over ICI under ``jit``.

Beyond DP parity, a second ``model`` axis gives Megatron-style tensor
parallelism over the transformer FF kernels and attention projections
(capability the reference lacks — nearly free over ICI):
  * 2-D kernels whose output dim is divisible and large  -> P(None, 'model')
  * 2-D kernels whose input dim is divisible and large   -> P('model', None)
  * everything else replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host initialization (SURVEY.md §5.8): join this process to a
    multi-host run over DCN via ``jax.distributed.initialize`` so that
    ``jax.devices()`` spans every host's chips and the same
    :func:`make_mesh` + ``jit`` programs scale data-parallel across hosts.

    Single-process is the default and requires no call; with
    ``num_processes`` absent/1 (and no cluster env to auto-detect) this is
    a no-op so CLI entry points can call it unconditionally.  On TPU pods
    all three arguments are auto-detected from the environment — call with
    no arguments.  Returns the process count.

    Launch recipe (one command per host, standard JAX multi-host;
    multi-host is strictly opt-in so single-chip/tunneled environments
    never trip auto-detection):

        # TPU pod slice — jax auto-detects peers; opt in per host with:
        MSTR_MULTIHOST=1 python -m multimodal_scene_text_recognition_tpu.cli train ...
        # generic cluster — explicit coordinator:
        JAX_COORDINATOR=host0:1234 NPROC=2 PROC_ID=<0|1> python -m ... train

    Replaces the reference's single-process DataParallel boundary
    (reference: model.py:115) at the multi-host scale the reference never
    reaches.  Per-host input sharding: each process feeds its local shard
    of the global batch (jax.make_array_from_process_local_data); the
    train loop's device-resident data path already gathers by index, so
    each host holds only its slice of the corpus.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR")
    if num_processes is None and os.environ.get("NPROC"):
        num_processes = int(os.environ["NPROC"])
    if process_id is None and os.environ.get("PROC_ID"):
        process_id = int(os.environ["PROC_ID"])

    pod_opt_in = os.environ.get("MSTR_MULTIHOST") == "1"
    if not coordinator_address and not pod_opt_in and (
        num_processes is None or num_processes <= 1
    ):
        return 1  # single-process: nothing to initialize

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


def make_mesh(
    n_devices: Optional[int] = None,
    model_axis: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    grid = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Minimum size of a kernel dimension before sharding it over the model axis.
# The big FF kernels (512 x 2048) qualify; tiny heads/norms stay replicated.
_TP_MIN_DIM = 1024


def param_spec(value: Any, model_size: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter leaf."""
    shape = getattr(value, "shape", ())
    if model_size <= 1 or len(shape) != 2:
        return P()
    d_in, d_out = shape
    if d_out >= _TP_MIN_DIM and d_out % model_size == 0:
        return P(None, MODEL_AXIS)  # column parallel (e.g. ff1 kernel)
    if d_in >= _TP_MIN_DIM and d_in % model_size == 0:
        return P(MODEL_AXIS, None)  # row parallel (e.g. ff2 kernel)
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Sharding pytree for a param tree under the given mesh."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda v: NamedSharding(mesh, param_spec(v, model_size)), params
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the batch axis sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
