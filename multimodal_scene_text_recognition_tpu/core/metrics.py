"""Metrics: exact-match word accuracy and running averages.

Reference semantics: case-sensitive exact string match after pruning the
prediction at the first '[s]', percent rounded to 5 dp
(reference: training_functions.py:186-202); running loss average
(reference: utils.py:152-172).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence


class Averager:
    """Running mean (reference: utils.py:152-172)."""

    def __init__(self) -> None:
        self.reset()

    def add(self, value: float, count: int = 1) -> None:
        self.total += float(value) * count
        self.n += count

    def reset(self) -> None:
        self.total = 0.0
        self.n = 0

    def val(self) -> float:
        return self.total / self.n if self.n else 0.0


def word_accuracy(
    preds: Sequence[str],
    targets: Sequence[str],
    case_sensitive: bool = True,
) -> float:
    """Exact-match word accuracy in percent, rounded to 5 dp
    (reference: training_functions.py:186-202).  ``case_sensitive=False``
    is the legacy loop's second metric (reference: train.py:123-124)."""
    assert len(preds) == len(targets)
    if not targets:
        return 0.0
    if not case_sensitive:
        preds = [p.lower() for p in preds]
        targets = [t.lower() for t in targets]
    correct = sum(p == t for p, t in zip(preds, targets))
    return round(correct * 100 / len(targets), 5)


def char_accuracy(preds: Sequence[str], targets: Sequence[str]) -> float:
    """Mean per-word character accuracy (normalised prefix-free match) —
    a finer progress signal than exact match (not in the reference)."""
    assert len(preds) == len(targets)
    if not targets:
        return 0.0
    total = 0.0
    for p, t in zip(preds, targets):
        if not t:
            total += float(p == t)
            continue
        m = sum(a == b for a, b in zip(p, t))
        total += m / max(len(p), len(t))
    return round(total * 100 / len(targets), 5)


@dataclass
class PredRecord:
    anno_id: int
    ground_truth: str
    prediction: str
    correct: bool


@dataclass
class EvalResult:
    """validate() output: score plus optional per-sample records
    (reference: training_functions.py:150-207)."""

    accuracy: float
    records: Optional[List[PredRecord]] = field(default=None)

    def to_dataframe(self):
        import pandas as pd

        return pd.DataFrame([r.__dict__ for r in (self.records or [])])
