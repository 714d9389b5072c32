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


def word_accuracy(preds: Sequence[str], targets: Sequence[str]) -> float:
    """Exact-match word accuracy in percent, rounded to 5 dp
    (reference: training_functions.py:186-202)."""
    assert len(preds) == len(targets)
    if not targets:
        return 0.0
    correct = sum(p == t for p, t in zip(preds, targets))
    return round(correct * 100 / len(targets), 5)


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
