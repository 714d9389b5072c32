"""Reference-shaped API facade tests."""

import dataclasses

import pytest

from multimodal_scene_text_recognition_tpu import api
from multimodal_scene_text_recognition_tpu.core.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)

TINY_CFG = Config(
    model=ModelConfig(
        enc_layers=1, dec_layers=1, ff_dim=64, hidden_dim=64, embed_dim=32,
        lstm_hidden=32, num_heads=4, compute_dtype="float32", dropout=0.0,
    ),
    train=TrainConfig(batch_size=8, epochs=1, validation_steps=4, seed=0),
    data=DataConfig(synthetic_train_size=32, synthetic_val_size=16),
)


def test_get_model_train_validate(tmp_path, capsys):
    cfg = dataclasses.replace(TINY_CFG, results_dir=str(tmp_path))
    bundle = api.get_model(cfg=cfg)
    assert "Training from scratch" in capsys.readouterr().out

    acc0 = api.validate(bundle)
    assert isinstance(acc0, float)

    bundle = api.train(bundle, dataset="synthetic", validation_steps=4,
                       iteration_limit=4)
    assert int(bundle.state.step) == 4

    acc, df = api.validate(bundle, return_dataframe=True)
    assert len(df) == 16
    assert set(df.columns) >= {"anno_id", "ground_truth", "prediction", "correct"}


def test_get_dataset_dispatch():
    train, val = api.get_dataset("synthetic", TINY_CFG)
    assert len(train) == 32 and len(val) == 16
    with pytest.raises(ValueError):
        api.get_dataset("nope")
