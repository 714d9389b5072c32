"""Checkpointing: Orbax full-state save/restore + torch `.pth` import shim.

The reference saves bare ``state_dict`` weights on new-best validation and
reloads with ``strict=False`` after deleting the semantic-embedding key so
vocab/table changes survive (reference: model.py:118-123,
training_functions.py:129-133).  Here:
  * :func:`save_checkpoint` / :func:`restore_checkpoint` — Orbax, full train
    state (params + batch_stats + optimiser + step), resumable — an upgrade
    the reference lacks (start_iter=0 hardcoded, training_functions.py:51).
  * :func:`import_torch_checkpoint` — maps a reference ``.pth`` state dict
    (DataParallel ``module.`` prefixes) onto our param tree, skipping the
    semantic embed table exactly like the reference loader, tolerating
    missing/extra keys (strict=False semantics).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, state) -> None:
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def restore_checkpoint(path: str, template) -> Any:
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


# ---------------------------------------------------------------------------
# Compact params bundle (git-committable serving weights)
# ---------------------------------------------------------------------------
#
# The Orbax checkpoint carries the full train state (~900 MB at 75M params:
# f32 params + Adam m/v) and lives outside version control; a disk reset
# between build sessions loses it.  The bundle stores only what serving
# needs — params + batch_stats + step — as fp16 npz (~150 MB), small enough
# to commit.  fp16 keeps 10 mantissa bits (more than bf16's 7); arrays that
# would overflow fp16 range stay f32.  Restore casts back to the template
# dtype; optimizer state is left at init, so bundles serve eval/serving,
# not training resume (use the Orbax dir for that).


def _flat_key(path_keys) -> str:
    parts = []
    for k in path_keys:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def save_params_bundle(path: str, state, dtype: str = "float16") -> None:
    """Write params + batch_stats + step as a compact npz."""
    import numpy as np

    flat = {"__step__": np.asarray(int(state.step), np.int64)}
    for prefix, tree in (("params", state.params),
                         ("batch_stats", state.batch_stats)):
        leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
        for path_keys, leaf in leaves:
            arr = np.asarray(jax.device_get(leaf))
            if dtype and arr.dtype.kind == "f":
                lim = np.finfo(np.dtype(dtype)).max * 0.9
                arr = (arr.astype(dtype) if np.all(np.abs(arr) < lim)
                       else arr.astype(np.float32))
            flat[f"{prefix}.{_flat_key(path_keys)}"] = arr
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)


def restore_params_bundle(path: str, template):
    """Restore a :func:`save_params_bundle` npz into ``template``'s
    params/batch_stats (cast to the template leaf dtypes)."""
    import numpy as np

    data = np.load(path)

    def rebuild(prefix, tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        vals = []
        for path_keys, leaf in leaves:
            key = f"{prefix}.{_flat_key(path_keys)}"
            arr = data[key]
            want = np.asarray(leaf)
            if arr.shape != want.shape:
                raise ValueError(
                    f"bundle/{key}: shape {arr.shape} != template {want.shape}")
            vals.append(arr.astype(want.dtype))
        return jax.tree_util.tree_unflatten(treedef, vals)

    return template.replace(
        params=rebuild("params", template.params),
        batch_stats=rebuild("batch_stats", template.batch_stats),
        step=int(data["__step__"]),
    )


# ---------------------------------------------------------------------------
# torch .pth import (full key mapping lives in train/torch_import.py)
# ---------------------------------------------------------------------------


def import_torch_checkpoint(
    pth_path: str,
    variables: Dict,
    skip_semantic_embed: bool = True,
    strict: bool = False,
) -> Tuple[Dict, Dict[str, int]]:
    """Load a reference `.pth` into a variables dict {'params', 'batch_stats'}.

    Replicates reference get_model() semantics (model.py:118-123): the
    semantic embed table is skipped, unmatched keys are ignored
    (strict=False).  Returns (new_variables, stats).
    """
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    from .torch_import import convert_state_dict

    return convert_state_dict(sd, variables,
                              skip_semantic_embed=skip_semantic_embed,
                              strict=strict)
