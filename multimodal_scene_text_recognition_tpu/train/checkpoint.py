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
