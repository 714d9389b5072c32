"""Serving recognizer tests."""

import numpy as np

from multimodal_scene_text_recognition_tpu import api
from multimodal_scene_text_recognition_tpu.eval.serve import Recognizer
from tests.test_api import TINY_CFG


def test_recognizer_greedy_and_beam():
    bundle = api.get_model(cfg=TINY_CFG)
    rec = Recognizer.from_bundle(bundle, batch_sizes=(2, 4))
    rng = np.random.default_rng(0)
    # mixed sizes and dtypes; more crops than the largest bucket
    crops = [rng.random((32, 100), dtype=np.float32) for _ in range(3)]
    crops += [rng.integers(0, 256, (20, 60), dtype=np.uint8).astype(np.float32)
              for _ in range(3)]
    texts = rec.recognize(crops)
    assert len(texts) == 6
    assert all(isinstance(t, str) for t in texts)

    texts2, scores = rec.recognize(crops[:2], beam_size=3, return_scores=True)
    assert len(texts2) == 2 and len(scores) == 2

    # semantics pass-through
    sem = {
        "overlap": rng.integers(0, 50, (6, 15)).astype(np.int32),
        "scene": rng.integers(0, 50, (6, 52)).astype(np.int32),
        "ious": np.full((6, 52), -1000.0, np.float32),
    }
    texts3 = rec.recognize(crops, semantics=sem)
    assert len(texts3) == 6
