"""Class-tag -> token-id sequences for the BERT semantic embedder.

Capability parity with the reference's (dead-code) bert tokenization path
(reference: coco_dataset.py:331-344 get_bert_tokens: join tag labels with
' [SEP] ', bert-tokenize, pad to a fixed length).  A zero-egress build
cannot fetch the hub wordpiece vocab, so the vocabulary here is built
deterministically from the detector class-label files themselves (one token
per class label + specials) — self-contained and stable across runs.  Hub
vocabularies can be swapped in via ``TagTokenizer(vocab=...)``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

PAD, CLS, SEP, UNK = "[PAD]", "[CLS]", "[SEP]", "[UNK]"
SPECIALS = [PAD, CLS, SEP, UNK]


class TagTokenizer:
    """Word-level tokenizer over detector class labels."""

    def __init__(self, class_labels: Sequence[str],
                 vocab: Optional[Dict[str, int]] = None):
        if vocab is not None:
            self.vocab = dict(vocab)
        else:
            self.vocab = {t: i for i, t in enumerate(SPECIALS)}
            for label in class_labels:
                for word in label.strip().lower().split():
                    if word not in self.vocab:
                        self.vocab[word] = len(self.vocab)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode_tags(
        self,
        tags: Sequence[str],
        max_len: int = 64,
        encode_frequency: bool = False,
        counts: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        """[CLS] tag1 [SEP] tag2 [SEP] ... padded to max_len (the reference's
        sentence layout, coco_dataset.py:334-340; frequency repetition via
        ``encode_frequency``)."""
        ids: List[int] = [self.vocab[CLS]]
        unk = self.vocab[UNK]
        reps = counts if (encode_frequency and counts) else [1] * len(tags)
        for tag, n in zip(tags, reps):
            for _ in range(int(n)):
                for word in tag.strip().lower().split():
                    ids.append(self.vocab.get(word, unk))
                ids.append(self.vocab[SEP])
        if len(ids) > 1:
            ids.pop()  # strip trailing [SEP] (reference: sentence[:-7])
        ids = ids[:max_len]
        out = np.zeros(max_len, np.int32)
        out[: len(ids)] = ids
        return out


def tokenizer_from_class_file(path: str) -> TagTokenizer:
    with open(path) as f:
        return TagTokenizer(f.read().splitlines())
