"""Full-model numerical parity against the actual reference implementation.

Imports the reference package from /root/reference AT TEST TIME (read-only;
nothing is copied), builds its torch Model on CPU, converts its state_dict
through our `.pth` importer, and asserts the decoded outputs match.

This is the checkpoint-parity north star (BASELINE.md): a converted
reference checkpoint must reproduce the reference's decoded strings.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout unavailable"
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        config = importlib.import_module("config")
        model_mod = importlib.import_module("model")

        # compat shim: current torch's nn.TransformerEncoder passes
        # is_causal to layers; the reference's custom layer predates it
        enc_mod = importlib.import_module("modules.encoders")
        orig_forward = enc_mod.TransformerEncoderLayer.forward

        def patched(self, src, src_mask=None, src_key_padding_mask=None,
                    is_causal=False):
            return orig_forward(self, src, src_mask, src_key_padding_mask)

        enc_mod.TransformerEncoderLayer.forward = patched
        yield config, model_mod
    finally:
        sys.path.remove(REFERENCE)


def make_inputs(B=2, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((B, 32, 100, 1), dtype=np.float32)
    overlap = rng.integers(0, 100, (B, 15)).astype(np.int64)
    scene = rng.integers(0, 100, (B, 52)).astype(np.int64)
    ious = np.full((B, 52), -1000.0, np.float32)
    return img, overlap, scene, ious


def test_default_transformer_model_parity(ref_modules):
    """Reference default config (TF encoder + TF decoder, linear overlap
    semantics): greedy decodes must match after state-dict conversion."""
    import torch

    _, model_mod = ref_modules
    torch.manual_seed(0)
    ref = model_mod.Model()
    ref.eval()

    # DataParallel prefix like a saved reference checkpoint (model.py:115)
    sd = {"module." + k: v for k, v in ref.state_dict().items()}

    from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
    from multimodal_scene_text_recognition_tpu.models.model import build_model
    from multimodal_scene_text_recognition_tpu.train.torch_import import (
        convert_state_dict,
    )

    cfg = ModelConfig(compute_dtype="float32", dropout=0.0)
    ours = build_model(cfg)
    img, overlap, scene, ious = make_inputs()
    rng = jax.random.PRNGKey(0)
    variables = ours.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(img), jnp.zeros((2, 26), jnp.int32),
        jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
        jnp.asarray(ious), train=True,
    )
    # keep the semantic embed too — full-parity conversion
    new_vars, stats = convert_state_dict(sd, variables,
                                         skip_semantic_embed=False)
    assert stats["skipped"] == []
    assert not [m for m in stats["missing"] if "semantic" not in m]

    with torch.no_grad():
        ref_logits = ref(
            torch.from_numpy(img).permute(0, 3, 1, 2),  # NCHW
            torch.zeros(2, 26, dtype=torch.long),
            torch.from_numpy(overlap),
            torch.from_numpy(scene),
            torch.from_numpy(ious),
            is_train=False,
        ).numpy()  # [B, 25, C]

    our_logits = np.asarray(
        ours.apply(
            {"params": new_vars["params"],
             "batch_stats": new_vars["batch_stats"]},
            jnp.asarray(img), None,
            jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
            jnp.asarray(ious), train=False,
        )
    )

    assert ref_logits.shape == our_logits.shape
    np.testing.assert_array_equal(
        ref_logits.argmax(-1), our_logits.argmax(-1)
    )
    np.testing.assert_allclose(ref_logits, our_logits, atol=2e-3, rtol=1e-3)


def _run_parity(ref_modules, ref_flags, our_kw, seed=2):
    """Build the reference Model with ``ref_flags`` flipped, convert its
    state dict, assert identical greedy decodes + close logits."""
    import torch

    config, model_mod = ref_modules
    saved = {k: getattr(config, k) for k in ref_flags}
    for k in ref_flags:
        setattr(config, k, True)
    try:
        torch.manual_seed(seed)
        ref = model_mod.Model()
        ref.eval()
        sd = {"module." + k: v for k, v in ref.state_dict().items()}

        from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
        from multimodal_scene_text_recognition_tpu.models.model import build_model
        from multimodal_scene_text_recognition_tpu.train.torch_import import (
            convert_state_dict,
        )

        cfg = ModelConfig(compute_dtype="float32", dropout=0.0, **our_kw)
        ours = build_model(cfg)
        img, overlap, scene, ious = make_inputs(seed=seed)
        rng = jax.random.PRNGKey(0)
        variables = ours.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(img), jnp.zeros((2, 26), jnp.int32),
            jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
            jnp.asarray(ious), train=True,
        )
        new_vars, stats = convert_state_dict(sd, variables,
                                             skip_semantic_embed=False)
        # every fusion param must come from the checkpoint — no silent
        # random init (round-1 gap: fusion keys fell through to `missing`)
        assert not [m for m in stats["missing"] if "semantic" not in m], (
            stats["missing"]
        )
        assert stats["unused_torch_keys"] == [], stats["unused_torch_keys"]

        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(img).permute(0, 3, 1, 2),
                torch.zeros(2, 26, dtype=torch.long),
                torch.from_numpy(overlap),
                torch.from_numpy(scene),
                torch.from_numpy(ious),
                is_train=False,
            ).numpy()

        our_logits = np.asarray(
            ours.apply(
                {"params": new_vars["params"],
                 "batch_stats": new_vars["batch_stats"]},
                jnp.asarray(img), None,
                jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
                jnp.asarray(ious), train=False,
            )
        )
        assert ref_logits.shape == our_logits.shape
        np.testing.assert_array_equal(
            ref_logits.argmax(-1), our_logits.argmax(-1)
        )
        np.testing.assert_allclose(ref_logits, our_logits, atol=2e-3, rtol=1e-3)
    finally:
        for k, v in saved.items():
            setattr(config, k, v)


def test_pre_encoder_mlp_parity(ref_modules):
    """PRE_ENCODER_MLP fusion path (reference: encoders.py:83-113, 126-133)."""
    _run_parity(ref_modules, ["PRE_ENCODER_MLP"],
                dict(pre_encoder_mlp=True), seed=2)


def test_pre_decoder_mlp_parity(ref_modules):
    """PRE_DECODER_MLP fusion path (reference: decoders.py:121-123, 190-193)."""
    _run_parity(ref_modules, ["PRE_DECODER_MLP"],
                dict(pre_decoder_mlp=True), seed=3)


def test_cls_decoder_init_parity(ref_modules):
    """CLS_DECODER_INIT fusion path (reference: decoders.py:125-130, 241-243)."""
    _run_parity(ref_modules, ["CLS_DECODER_INIT"],
                dict(cls_decoder_init=True), seed=4)


def test_post_decoder_mlp_parity(ref_modules):
    """POST_DECODER_MLP logit fusion (reference: decoders.py:133-137, 267-273)."""
    _run_parity(ref_modules, ["POST_DECODER_MLP"],
                dict(post_decoder_mlp=True), seed=5)


def test_distilbert_embedder_import_parity():
    """Offline DistilBERT weight import (reference: semantic_vectors.py:55-70
    wraps pretrained DistilBERT; zero-egress here, so the torch model is
    built locally from config — same architecture, random weights).  Our
    BertEmbedding must reproduce the torch hidden states bit-close after
    ``import_distilbert``."""
    import torch
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(0)
    bert = DistilBertModel(DistilBertConfig()).eval()

    from multimodal_scene_text_recognition_tpu.models.semantic import (
        BertEmbedding,
    )
    from multimodal_scene_text_recognition_tpu.train.torch_import import (
        import_distilbert,
    )

    B, T = 2, 12
    rng_np = np.random.default_rng(0)
    tokens = rng_np.integers(0, 30522, (B, T))

    module = BertEmbedding()
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.asarray(tokens, jnp.int32), None, None,
    )
    new_vars, stats = import_distilbert(bert.state_dict(), variables)
    # every DistilBERT key must land (nothing silently dropped)
    assert stats["unused_torch_keys"] == [], stats["unused_torch_keys"]
    # only our 768->embed_dim proj stays at init
    assert all("proj" in m for m in stats["missing"]), stats["missing"]

    with torch.no_grad():
        hidden = bert(torch.from_numpy(tokens)).last_hidden_state.numpy()
    pw = np.asarray(new_vars["params"]["proj"]["kernel"])
    pb = np.asarray(new_vars["params"]["proj"]["bias"])
    expected = hidden @ pw + pb

    ours = np.asarray(
        module.apply({"params": new_vars["params"]},
                     jnp.asarray(tokens, jnp.int32), None, None)
    )
    np.testing.assert_allclose(ours, expected, atol=2e-4, rtol=1e-4)


def test_scene_mode_parity(ref_modules):
    """SEMANTIC_VECTOR='scene' (embed(scene) x softmax(ious) weighting,
    reference: semantic_vectors.py:38-43), consumed through the
    PRE_ENCODER_MLP fusion so the scene semantics actually reach the
    logits (with no fusion flag the semantic branch is computed but unused,
    reference model.py:96-102, and parity would be vacuous)."""
    import torch

    config, model_mod = ref_modules
    saved = {"SEMANTIC_VECTOR": config.SEMANTIC_VECTOR,
             "PRE_ENCODER_MLP": config.PRE_ENCODER_MLP}
    config.SEMANTIC_VECTOR = "scene"
    config.PRE_ENCODER_MLP = True
    try:
        torch.manual_seed(6)
        ref = model_mod.Model()
        ref.eval()
        sd = {"module." + k: v for k, v in ref.state_dict().items()}

        from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
        from multimodal_scene_text_recognition_tpu.models.model import build_model
        from multimodal_scene_text_recognition_tpu.train.torch_import import (
            convert_state_dict,
        )

        cfg = ModelConfig(semantic_vector="scene", pre_encoder_mlp=True,
                          compute_dtype="float32", dropout=0.0)
        ours = build_model(cfg)
        img, overlap, scene, ious = make_inputs(seed=6)
        # real iou weights on the first objects, -1000 padding after — the
        # softmax weighting must be non-trivial for the test to mean much
        rng_np = np.random.default_rng(6)
        ious[:, :10] = rng_np.random((2, 10), dtype=np.float32) + 1.0

        rng = jax.random.PRNGKey(0)
        variables = ours.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(img), jnp.zeros((2, 26), jnp.int32),
            jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
            jnp.asarray(ious), train=True,
        )
        new_vars, stats = convert_state_dict(sd, variables,
                                             skip_semantic_embed=False)
        assert not [m for m in stats["missing"] if "semantic" not in m]
        assert stats["unused_torch_keys"] == [], stats["unused_torch_keys"]

        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(img).permute(0, 3, 1, 2),
                torch.zeros(2, 26, dtype=torch.long),
                torch.from_numpy(overlap),
                torch.from_numpy(scene),
                torch.from_numpy(ious),
                is_train=False,
            ).numpy()

        our_logits = np.asarray(
            ours.apply(
                {"params": new_vars["params"],
                 "batch_stats": new_vars["batch_stats"]},
                jnp.asarray(img), None,
                jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
                jnp.asarray(ious), train=False,
            )
        )
        assert ref_logits.shape == our_logits.shape
        np.testing.assert_array_equal(
            ref_logits.argmax(-1), our_logits.argmax(-1)
        )
        np.testing.assert_allclose(ref_logits, our_logits, atol=2e-3,
                                   rtol=1e-3)
    finally:
        for k, v in saved.items():
            setattr(config, k, v)


def test_oscar_model_parity(ref_modules):
    """ENCODER='Oscar' (reference: encoders.py:34-66 — hid_to_bert ->
    BertModel over inputs_embeds -> bert_to_hid; OSCAR_ENCODER stays False,
    the reference default, since the True path crashes on the 512-vs-256
    concat).  Converted BertModel weights must reproduce the logits."""
    import torch

    config, model_mod = ref_modules
    old_enc = config.ENCODER
    config.ENCODER = "Oscar"
    try:
        torch.manual_seed(7)
        ref = model_mod.Model()
        ref.eval()
        sd = {"module." + k: v for k, v in ref.state_dict().items()}

        from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
        from multimodal_scene_text_recognition_tpu.models.model import build_model
        from multimodal_scene_text_recognition_tpu.train.torch_import import (
            convert_state_dict,
        )

        cfg = ModelConfig(encoder="oscar", compute_dtype="float32",
                          dropout=0.0)
        ours = build_model(cfg)
        img, overlap, scene, ious = make_inputs(seed=7)
        rng = jax.random.PRNGKey(0)
        variables = ours.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(img), jnp.zeros((2, 26), jnp.int32),
            jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
            jnp.asarray(ious), train=True,
        )
        new_vars, stats = convert_state_dict(sd, variables,
                                             skip_semantic_embed=False)
        assert not [m for m in stats["missing"] if "semantic" not in m], (
            stats["missing"]
        )
        # word embeddings / pooler / position_ids are legitimately unused
        # (filtered); nothing else may be silently dropped
        assert stats["unused_torch_keys"] == [], stats["unused_torch_keys"]

        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(img).permute(0, 3, 1, 2),
                torch.zeros(2, 26, dtype=torch.long),
                torch.from_numpy(overlap),
                torch.from_numpy(scene),
                torch.from_numpy(ious),
                is_train=False,
            ).numpy()

        our_logits = np.asarray(
            ours.apply(
                {"params": new_vars["params"],
                 "batch_stats": new_vars["batch_stats"]},
                jnp.asarray(img), None,
                jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
                jnp.asarray(ious), train=False,
            )
        )
        assert ref_logits.shape == our_logits.shape
        np.testing.assert_array_equal(
            ref_logits.argmax(-1), our_logits.argmax(-1)
        )
        np.testing.assert_allclose(ref_logits, our_logits, atol=2e-3,
                                   rtol=1e-3)
    finally:
        config.ENCODER = old_enc


@pytest.fixture(scope="module")
def ref_coco_dataset():
    """Import the reference's coco_dataset.py for geometry parity.

    The environment lacks its heavyweight deps, so the test injects exact
    minimal stand-ins: ``lmdb`` (imported but unused by the geometry
    functions), a rectangle-only ``shapely.geometry.Polygon`` (the
    reference only ever constructs axis-aligned rects via get_all_coords,
    coco_dataset.py:379-384, for which intersection/union areas are exact
    closed forms), and an offline BertTokenizer.from_pretrained (the
    module-level hub fetch at coco_dataset.py:21 feeds only the dead
    get_bert_tokens helper)."""
    import types

    class _RectPolygon:
        def __init__(self, coords):
            xs = [c[0] for c in coords]
            ys = [c[1] for c in coords]
            self.x1, self.x2 = min(xs), max(xs)
            self.y1, self.y2 = min(ys), max(ys)

        @property
        def area(self):
            return (self.x2 - self.x1) * (self.y2 - self.y1)

        def intersection(self, other):
            x1, x2 = max(self.x1, other.x1), min(self.x2, other.x2)
            y1, y2 = max(self.y1, other.y1), min(self.y2, other.y2)
            if x2 <= x1 or y2 <= y1:
                return _RectPolygon([[0, 0], [0, 0], [0, 0], [0, 0]])
            return _RectPolygon([[x1, y1], [x2, y1], [x2, y2], [x1, y2]])

        def union(self, other):
            # only .area is read (coco_dataset.py:369)
            inter = self.intersection(other).area
            u = self.area + other.area - inter
            out = _RectPolygon([[0, 0], [0, 0], [0, 0], [0, 0]])
            out.x1, out.y1, out.x2, out.y2 = 0.0, 0.0, u, 1.0
            return out

    shapely = types.ModuleType("shapely")
    shapely_geometry = types.ModuleType("shapely.geometry")
    shapely_geometry.Polygon = _RectPolygon
    shapely.geometry = shapely_geometry

    import transformers

    saved_fp = transformers.BertTokenizer.from_pretrained
    transformers.BertTokenizer.from_pretrained = classmethod(
        lambda cls, name, *a, **k: None)
    # torchvision: only ToTensor/Resize factories are touched, inside the
    # Dataset classes' __init__ — never by the geometry functions under test
    torchvision = types.ModuleType("torchvision")
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_transforms.ToTensor = lambda *a, **k: None
    tv_transforms.Resize = lambda *a, **k: None
    tv_transforms.Compose = lambda fs: fs
    torchvision.transforms = tv_transforms

    injected = {"lmdb": types.ModuleType("lmdb"),
                "shapely": shapely, "shapely.geometry": shapely_geometry,
                "torchvision": torchvision,
                "torchvision.transforms": tv_transforms}
    saved_mods = {k: sys.modules.get(k) for k in injected}
    sys.modules.update(injected)
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        config = importlib.import_module("config")
        coco_dataset = importlib.import_module("coco_dataset")
        yield config, coco_dataset
    finally:
        sys.path.remove(REFERENCE)
        transformers.BertTokenizer.from_pretrained = saved_fp
        for k, v in saved_mods.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _random_annos(seed, n_obj=40):
    rng = np.random.default_rng(seed)
    anno = {
        "bbox": [float(v) for v in rng.uniform(5, 60, 2)]
        + [float(v) for v in rng.uniform(5, 40, 2)],
    }
    anno["area"] = (anno["bbox"][2] * anno["bbox"][3]
                    * float(rng.uniform(0.3, 1.6)))
    objects = [
        {
            "class": int(rng.integers(0, 12)),  # repeats force unique logic
            "bbox": [float(v) for v in rng.uniform(0, 70, 2)]
            + [float(v) for v in rng.uniform(1, 80, 2)],
        }
        for _ in range(n_obj)
    ]
    return anno, objects


@pytest.mark.parametrize("assignment", ["resize", "0.25", "0.50", "0.75",
                                        "1.001"])
def test_overlap_assignment_geometry_parity(ref_coco_dataset, assignment):
    """Our vectorised overlap geometry == the reference's per-object
    shapely loop for both the resize-containment and the numeric-IoU
    assignment modes (reference: coco_dataset.py:275-290, 346-377 — incl.
    the iou+1 quirk, which makes thresholds <= 1 accept every box and is
    only selective above 1.0)."""
    config, cd = ref_coco_dataset
    from multimodal_scene_text_recognition_tpu.data.geometry import (
        overlap_vector,
    )

    saved = config.SEMANTIC_ASSIGNMENT
    config.SEMANTIC_ASSIGNMENT = assignment
    try:
        for seed in range(8):
            anno, objects = _random_annos(seed)
            ref_vec = cd.get_overlap_vec(anno, objects)
            ours = overlap_vector(
                anno["bbox"], anno["area"],
                np.asarray([o["class"] for o in objects]),
                np.asarray([o["bbox"] for o in objects]),
                assignment=assignment,
            )
            assert ours == ref_vec, (seed, assignment)
    finally:
        config.SEMANTIC_ASSIGNMENT = saved


def test_iou_score_parity(ref_coco_dataset):
    """Box-arithmetic IoU == reference shapely polygon IoU (+1 shift,
    reference: coco_dataset.py:361-373)."""
    _, cd = ref_coco_dataset
    from multimodal_scene_text_recognition_tpu.data.geometry import iou_xywh

    for seed in range(8):
        anno, objects = _random_annos(seed, n_obj=16)
        ref_scores = [cd.get_iou_score(anno, o) for o in objects]
        ours = iou_xywh(
            np.asarray([o["bbox"] for o in objects], np.float64),
            np.asarray(anno["bbox"], np.float64),
        ) + 1.0
        np.testing.assert_allclose(ours, ref_scores, rtol=1e-12)


def test_scene_vec_parity(ref_coco_dataset):
    """Scene vector: all unique +1-shifted classes, rel-scores hardcoded 1
    (reference: coco_dataset.py:292-312)."""
    _, cd = ref_coco_dataset
    from multimodal_scene_text_recognition_tpu.data.geometry import (
        scene_vector,
    )

    for seed in range(8):
        anno, objects = _random_annos(seed)
        ref_classes, ref_scores = cd.get_scene_vec(anno, objects)
        ours_classes, ours_scores = scene_vector(
            np.asarray([o["class"] for o in objects]))
        assert ours_classes == ref_classes
        assert ours_scores == ref_scores


def test_lstm_model_parity(ref_modules):
    """Reference LSTM encoder + LSTM-attention decoder variant."""
    import torch

    config, model_mod = ref_modules
    old_enc, old_dec = config.ENCODER, config.DECODER
    config.ENCODER, config.DECODER = "LSTM", "LSTM"
    try:
        torch.manual_seed(1)
        ref = model_mod.Model()
        ref.eval()
        sd = {"module." + k: v for k, v in ref.state_dict().items()}

        from multimodal_scene_text_recognition_tpu.core.config import ModelConfig
        from multimodal_scene_text_recognition_tpu.models.model import build_model
        from multimodal_scene_text_recognition_tpu.train.torch_import import (
            convert_state_dict,
        )

        cfg = ModelConfig(encoder="lstm", decoder="lstm",
                          compute_dtype="float32", dropout=0.0)
        ours = build_model(cfg)
        img, overlap, scene, ious = make_inputs(seed=1)
        rng = jax.random.PRNGKey(0)
        variables = ours.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(img), jnp.zeros((2, 26), jnp.int32),
            jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
            jnp.asarray(ious), train=True,
        )
        new_vars, stats = convert_state_dict(sd, variables,
                                             skip_semantic_embed=False)
        assert not [m for m in stats["missing"] if "semantic" not in m]

        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(img).permute(0, 3, 1, 2),
                torch.zeros(2, 26, dtype=torch.long),
                torch.from_numpy(overlap),
                torch.from_numpy(scene),
                torch.from_numpy(ious),
                is_train=False,
            ).numpy()  # [B, 26, C]

        our_logits = np.asarray(
            ours.apply(
                {"params": new_vars["params"],
                 "batch_stats": new_vars["batch_stats"]},
                jnp.asarray(img), None,
                jnp.asarray(overlap, jnp.int32), jnp.asarray(scene, jnp.int32),
                jnp.asarray(ious), train=False,
            )
        )
        assert ref_logits.shape == our_logits.shape
        np.testing.assert_array_equal(
            ref_logits.argmax(-1), our_logits.argmax(-1)
        )
        np.testing.assert_allclose(ref_logits, our_logits, atol=2e-3, rtol=1e-3)
    finally:
        config.ENCODER, config.DECODER = old_enc, old_dec
