"""Attention-score introspection for the fusion MLPs.

Capability parity with the reference's PRINT_ATTENTION_SCORES path
(reference: config.py:43, encoders.py:110-123, decoders.py:160-174): dump
the column-x-object relevance softmax as a table, limited to 25 objects,
scores x100 rounded to 2 dp.

The scores are sown into the 'intermediates' collection during apply; this
module collects and formats them without any device round-trips inside the
model (the reference prints from inside forward on the primary replica).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def collect_attention_scores(model, variables, batch) -> Dict[str, np.ndarray]:
    """Run an eval forward collecting fusion-relevance scores.

    Returns {site_name: [B, T, O] array} for every enabled fusion site
    (pre_encoder_scores / pre_decoder_scores).
    """
    _, inter = model.apply(
        variables,
        batch["image"],
        None,
        batch["overlap"],
        batch["scene"],
        batch["ious"],
        train=False,
        mutable=["intermediates"],
    )

    out: Dict[str, np.ndarray] = {}

    def walk(node, path=()):
        if isinstance(node, (tuple, list)):
            if node:
                out["/".join(path)] = np.asarray(node[0])
            return
        if hasattr(node, "items"):
            for k, v in node.items():
                walk(v, path + (str(k),))

    walk(inter.get("intermediates", {}))
    return out


def format_scores(
    scores: np.ndarray,
    sample: int = 0,
    max_rows: int = 26,
    max_objs: int = 25,
):
    """Pretty table matching the reference dump (encoders.py:115-123):
    rows = sequence positions, cols = first <=25 objects, values = % x100."""
    import pandas as pd

    s = np.asarray(scores)[sample]  # [T, O]
    s = s[:max_rows, :max_objs]
    return pd.DataFrame(np.round(s * 100, 2))


def print_attention_scores(model, variables, batch, sample: int = 0) -> None:
    for site, scores in collect_attention_scores(model, variables, batch).items():
        print(f"--- {site}")
        print(format_scores(scores, sample))
