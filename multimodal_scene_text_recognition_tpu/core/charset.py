"""Label codecs: text <-> index conversion.

Rebuilds the reference converters (reference: utils.py:5-149) as pure
host-side numpy — no device placement inside the codec (the reference pushes
tensors to the primary CUDA device at utils.py:37,141; here batches are
device-put once by the input pipeline).

``AttnCodec`` vocabulary layout (reference: utils.py:108-116):
    0 = [GO], 1 = [s], 2 = [PAD], 3.. = charset (94 printable by default)

Encode semantics (reference: utils.py:118-141): output width is
``max_len + 2`` (leading [GO], trailing [s], remainder [PAD]=2).
Decode semantics (reference: utils.py:143-149 + the caller-side pruning at
training_functions.py:186-189): join symbols then cut at the first '[s]'.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

GO_ID = 0
EOS_ID = 1
PAD_ID = 2
NUM_SPECIAL = 3

GO = "[GO]"
EOS = "[s]"
PAD = "[PAD]"


class AttnCodec:
    """Attention-decoder codec with [GO]/[s]/[PAD] specials."""

    def __init__(self, chars: str, max_text_length: int = 25):
        self.chars = chars
        self.max_text_length = max_text_length
        self.itos: List[str] = [GO, EOS, PAD] + list(chars)
        self.stoi = {c: i for i, c in enumerate(self.itos)}

    @property
    def num_classes(self) -> int:
        return len(self.itos)

    @property
    def seq_width(self) -> int:
        # [GO] + max_len chars + [s]
        return self.max_text_length + 2

    def encode(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Encode a batch of strings.

        Returns ``(tokens[int32, B x (max_len+2)], lengths[int32, B])`` where
        ``lengths`` counts chars + the [s] token (reference: utils.py:129).
        """
        B = len(texts)
        out = np.full((B, self.seq_width), PAD_ID, dtype=np.int32)
        out[:, 0] = GO_ID
        lengths = np.zeros((B,), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.stoi[c] for c in t]
            n = len(ids)
            if n > self.max_text_length:
                raise ValueError(
                    f"text longer than max_text_length={self.max_text_length}: {t!r}"
                )
            out[i, 1 : 1 + n] = ids
            out[i, 1 + n] = EOS_ID
            lengths[i] = n + 1
        return out, lengths

    def decode(self, indices: np.ndarray) -> List[str]:
        """Decode index rows to strings, pruned at the first [s].

        ``indices`` is [B, T] of predicted class ids (no [GO] column).
        Fuses the reference's two-stage decode (utils.py:143-149 symbol join,
        then '[s]'-find pruning at training_functions.py:186-189).
        """
        indices = np.asarray(indices)
        out = []
        for row in indices:
            chars = []
            for i in row:
                i = int(i)
                if i == EOS_ID:
                    break
                chars.append(self.itos[i])
            out.append("".join(chars))
        return out

    def decode_raw(self, indices: np.ndarray) -> List[str]:
        """Symbol-join without pruning (exact reference utils.py:143-149)."""
        indices = np.asarray(indices)
        return ["".join(self.itos[int(i)] for i in row) for row in indices]


class CTCCodec:
    """CTC codec: blank=0, chars shifted +1 (reference: utils.py:5-52).

    Drop-in codec for the CTC training recipe (``train.loss=ctc`` +
    ``model.decoder=linear`` + ``model.label_codec=ctc``): ``encode``
    matches AttnCodec's call signature so PackedSamples/Batcher work
    unchanged, and ``decode`` greedy-collapses raw per-column argmax rows
    (remove repeats, then blanks) when no lengths are given — the standard
    CTC best-path decode the reference's converter supports but never wires.
    """

    def __init__(self, chars: str, max_text_length: int = 25):
        self.chars = chars
        self.max_text_length = max_text_length
        self.itos = ["[CTCblank]"] + list(chars)
        self.stoi = {c: i + 1 for i, c in enumerate(chars)}

    @property
    def num_classes(self) -> int:
        return len(self.itos)

    def encode(
        self, texts: Sequence[str], max_len: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        max_len = self.max_text_length if max_len is None else max_len
        B = len(texts)
        out = np.zeros((B, max_len), dtype=np.int32)
        lengths = np.zeros((B,), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.stoi[c] for c in t]
            if len(ids) > max_len:
                raise ValueError(
                    f"text longer than max_text_length={max_len}: {t!r}")
            out[i, : len(ids)] = ids
            lengths[i] = len(ids)
        return out, lengths

    def decode(
        self, indices: np.ndarray, lengths: Optional[Sequence[int]] = None
    ) -> List[str]:
        indices = np.asarray(indices)
        if lengths is None:
            # greedy best-path collapse over full rows (validation decode)
            lengths = [indices.shape[1]] * indices.shape[0]
        texts = []
        for row, l in zip(indices, lengths):
            chars = []
            prev = -1
            for i in row[: int(l)]:
                i = int(i)
                if i != 0 and i != prev:
                    chars.append(self.itos[i])
                prev = i
            texts.append("".join(chars))
        return texts


def check_text(text: str, chars: str, max_len: int = 25) -> bool:
    """Charset/length filter for training annotations
    (reference: coco_dataset.py:264-272)."""
    if len(text) > max_len:
        return False
    return all(c in chars for c in text)
