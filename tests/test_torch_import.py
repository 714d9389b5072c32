"""Checkpoint-import tests: reference-shaped state dicts -> our param tree.

The torch state dict is fabricated key-by-key with the reference's exact
naming/shapes (no torch modules involved), then converted and spot-checked.
"""

import numpy as np
import pytest

import jax

from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
from multimodal_scene_text_recognition_tpu.models.model import build_model
from multimodal_scene_text_recognition_tpu.train.torch_import import (
    convert_state_dict,
    torch_key_for,
    _walk,
)

CFG = ModelConfig(compute_dtype="float32")  # full-size reference dims


def init_variables(cfg=CFG):
    import jax.numpy as jnp

    model = build_model(cfg)
    B = 1
    rng = jax.random.PRNGKey(0)
    return model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((B, 32, 100, 1)),
        jnp.zeros((B, 26), jnp.int32),
        jnp.zeros((B, 15), jnp.int32),
        jnp.zeros((B, 52), jnp.int32),
        jnp.full((B, 52), -1000.0),
        train=True,
    )


def fabricate_state_dict(variables, prefix="module."):
    """Build a torch-style state dict covering every mappable leaf."""
    rng = np.random.default_rng(0)
    sd = {}
    for collection in ("params", "batch_stats"):
        for path, value in _walk(variables[collection]):
            km = torch_key_for(collection, tuple(path))
            if km is None:
                continue
            tkey, transform = km
            arr = np.asarray(value)
            if isinstance(tkey, tuple):
                # multi-source packing (Oscar BERT q/k/v): our [E, 3E]
                # kernel / [3E] bias -> 3 torch [E, E] / [E] tensors
                n = len(tkey)
                for k in tkey:
                    shape = ((arr.shape[1] // n, arr.shape[0])
                             if transform.__name__ == "_t_qkv_w"
                             else (arr.shape[0] // n,))
                    sd[prefix + k] = rng.standard_normal(shape).astype(
                        np.float32)
                continue
            # invert the transform to get the torch-side shape
            if transform.__name__ == "_t_linear":
                shape = arr.shape[::-1]
            elif transform.__name__ == "_t_conv":
                shape = (arr.shape[3], arr.shape[2], arr.shape[0], arr.shape[1])
            else:
                shape = arr.shape
            sd[prefix + tkey] = rng.standard_normal(shape).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def variables():
    return init_variables()


def test_full_coverage_transformer_model(variables):
    sd = fabricate_state_dict(variables)
    new_vars, stats = convert_state_dict(sd, variables)

    # every fabricated key loads except the semantic embed (reference skip)
    assert stats["skipped"] == ["get_semantic_vectors.embed.weight"]
    assert stats["loaded"] == len(sd) - 1
    # (keys are reported module.-stripped)
    assert stats["unused_torch_keys"] == ["get_semantic_vectors.embed.weight"]
    # nothing mappable went missing on our side except intentionally
    # unmapped components (none for the default transformer model)
    mappable_missing = [
        m for m in stats["missing"] if "semantic" not in m
    ]
    assert mappable_missing == []


def test_transforms_applied(variables):
    sd = fabricate_state_dict(variables)
    new_vars, _ = convert_state_dict(sd, variables)

    # Linear transpose
    ours = np.asarray(new_vars["params"]["decoder"]["hid_to_emb"]["kernel"])
    theirs = sd["module.decoder.hid_to_emb.weight"]
    np.testing.assert_array_equal(ours, theirs.T)

    # Conv OIHW -> HWIO
    ours = np.asarray(
        new_vars["params"]["feature_extractor"]["stem0_conv"]["kernel"]
    )
    theirs = sd["module.FeatureExtraction.ConvNet.conv0_1.weight"]
    np.testing.assert_array_equal(ours, theirs.transpose(2, 3, 1, 0))

    # BN running stats land in batch_stats
    ours = np.asarray(
        new_vars["batch_stats"]["feature_extractor"]["stem0_bn"]["mean"]
    )
    theirs = sd["module.FeatureExtraction.ConvNet.bn0_1.running_mean"]
    np.testing.assert_array_equal(ours, theirs)

    # MHA packed projection transpose
    ours = np.asarray(
        new_vars["params"]["encoder"]["layer0"]["self_attn"]["w_qkv"]
    )
    theirs = sd["module.encoder.encoder.layers.0.self_attn.in_proj_weight"]
    np.testing.assert_array_equal(ours, theirs.T)

    # semantic embed untouched (reference: model.py:121 deletes the key)
    orig = np.asarray(variables["params"]["semantic"]["embed"]["embedding"])
    kept = np.asarray(new_vars["params"]["semantic"]["embed"]["embedding"])
    np.testing.assert_array_equal(orig, kept)


def test_lstm_paths_covered():
    cfg = ModelConfig(encoder="lstm", decoder="lstm", compute_dtype="float32")
    variables = init_variables(cfg)
    sd = fabricate_state_dict(variables)
    assert "module.encoder.0.rnn.weight_ih_l0" in sd
    assert "module.encoder.0.rnn.weight_ih_l0_reverse" in sd
    assert "module.decoder.attention_cell.rnn.weight_ih" in sd
    assert "module.decoder.generator.weight" in sd
    new_vars, stats = convert_state_dict(sd, variables)
    assert stats["loaded"] == len(sd) - 1  # minus skipped semantic embed
    ours = np.asarray(new_vars["params"]["encoder"]["l0"]["fwd"]["w_ih"])
    np.testing.assert_array_equal(
        ours, sd["module.encoder.0.rnn.weight_ih_l0"].T
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(encoder="lstm", decoder="lstm"),
        dict(decoder="linear"),
        dict(pre_encoder_mlp=True),
        dict(pre_decoder_mlp=True),
        dict(cls_decoder_init=True),
        dict(post_decoder_mlp=True),
        dict(
            pre_encoder_mlp=True,
            pre_decoder_mlp=True,
            cls_decoder_init=True,
            multihead_pre_target=True,
            multihead_pre_memory=True,
            multihead_post_memory=True,
            post_decoder_mlp=True,
        ),
        dict(semantic_vector="scene"),
        dict(semantic_vector="combined"),
        dict(encoder="oscar"),
    ],
)
def test_zero_unmapped_params_per_combo(kw):
    """Every param of every loadable config combo must have a torch-key
    mapping (reference loads all matching keys via strict=False,
    model.py:118-123 — incl. the fusion MLPs/MHAs, decoders.py:121-137,
    370-392; encoders.py:85-90)."""
    cfg = ModelConfig(
        compute_dtype="float32", enc_layers=1, dec_layers=1, **kw
    )
    variables = init_variables(cfg)
    unmapped = []
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for path, _ in _walk(variables[collection]):
            if torch_key_for(collection, tuple(path)) is None:
                unmapped.append(collection + "/" + "/".join(path))
    # Bert/Oscar embedder internals aside, the semantic 'combine' Linear and
    # embeds are mapped; everything else must be too.
    assert unmapped == [], unmapped


def test_shape_mismatch_raises(variables):
    sd = {"module.decoder.hid_to_emb.weight": np.zeros((7, 7), np.float32)}
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_state_dict(sd, variables)


def test_strict_mode_raises(variables):
    with pytest.raises(KeyError):
        convert_state_dict({}, variables, strict=True)
