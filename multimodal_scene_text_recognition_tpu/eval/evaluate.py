"""Evaluation: greedy validation, per-sample records, error-diff study.

Capability parity with the reference harness:
  * :func:`validate` — greedy decode over a loader, exact-match word accuracy
    (%, 5 dp, case-sensitive, '[s]'-pruned), optional per-sample DataFrame,
    sample printing (reference: training_functions.py:150-207).
  * :func:`error_diff_eval` — the "corrections" study: given a baseline
    model's error ids, count how many this model fixes, with human-readable
    object-tag introspection (reference: training_functions.py:210-269,
    evaluate.py:109-164).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Set

import numpy as np

from ..core.charset import AttnCodec
from ..core.metrics import EvalResult, PredRecord
from ..data.pipeline import device_batch


def validate(
    eval_step: Callable,
    variables,
    batches: Iterable[Dict[str, np.ndarray]],
    codec: AttnCodec,
    print_samples: bool = False,
    return_records: bool = False,
    device_put=None,
) -> EvalResult:
    """Run greedy validation (reference: training_functions.py:150-207)."""
    correct = 0
    total = 0
    records: List[PredRecord] = []

    for batch in batches:
        dev = device_batch(batch, device_put)
        pred_ids = np.asarray(eval_step(variables, dev))
        preds = codec.decode(pred_ids)
        valid = batch.get("valid", np.ones(len(batch["labels"]), bool))

        if print_samples and total == 0:
            print("  - Ground truth:", batch["labels"][0])
            print("  - Prediction:  ", preds[0], "\n")

        for anno_id, label, pred, ok in zip(
            batch["anno_id"], batch["labels"], preds, valid
        ):
            if not ok:
                continue
            is_correct = label == pred
            correct += int(is_correct)
            total += 1
            if return_records:
                records.append(
                    PredRecord(int(anno_id), label, pred, is_correct)
                )

    score = round(correct * 100 / max(total, 1), 5)
    return EvalResult(score, records if return_records else None)


def load_class_labels(class_labels_dir: str, source: str) -> List[str]:
    """Detector class-id -> label list (reference: training_functions.py:
    223-224; assets vendored under assets/features/)."""
    path = os.path.join(class_labels_dir, f"{source.lower()}_classes.txt")
    with open(path) as f:
        return f.read().splitlines()


def tags_for(ids: Sequence[int], class_labels: List[str]) -> List[str]:
    """ids are shifted +1 at vector build so 0 = padding
    (reference: coco_dataset.py:278,298; lookup training_functions.py:237-240)."""
    return [class_labels[int(i) - 1] for i in ids if int(i) != 0]


def error_diff_eval(
    eval_step: Callable,
    variables,
    batches: Iterable[Dict[str, np.ndarray]],
    codec: AttnCodec,
    base_error_ids: Set[str],
    class_labels: Optional[List[str]] = None,
    semantic_vector: str = "overlap",
    print_sem: bool = False,
    device_put=None,
) -> Dict[str, object]:
    """Differential eval: of the samples a baseline got wrong, how many does
    this model correct (reference: training_functions.py:210-269)?

    Unlike the reference's one-image-at-a-time loop, whole batches run
    through the jitted decode and the baseline-error filter applies on host.
    """
    corrected = 0
    total = 0
    detail = []

    for batch in batches:
        dev = device_batch(batch, device_put)
        pred_ids = np.asarray(eval_step(variables, dev))
        preds = codec.decode(pred_ids)
        valid = batch.get("valid", np.ones(len(batch["labels"]), bool))

        for i, (anno_id, label, pred, ok) in enumerate(
            zip(batch["anno_id"], batch["labels"], preds, valid)
        ):
            if not ok or str(int(anno_id)) not in base_error_ids:
                continue
            total += 1
            tags = None
            if class_labels is not None:
                vec = (
                    batch["overlap"][i]
                    if semantic_vector == "overlap"
                    else batch["scene"][i]
                )
                tags = tags_for(vec, class_labels)
                if print_sem:
                    print(tags)
            if label == pred:
                corrected += 1
                if print_sem:
                    print(label, pred)
            detail.append(
                {"anno_id": int(anno_id), "label": label, "pred": pred,
                 "corrected": label == pred, "tags": tags}
            )

    return {
        "corrected": corrected,
        "total": total,
        "correction_rate": corrected / max(total, 1),
        "detail": detail,
    }
