"""Data-layer tests: geometry golden cases, COCO-Text index, TextOCR parse,
balanced mixing, keep-ratio collate (SURVEY.md §4 Unit)."""

import json
import os

import numpy as np
import pytest

from multimodal_scene_text_recognition_tpu.core.config import Config, ModelConfig
from multimodal_scene_text_recognition_tpu.data import geometry
from multimodal_scene_text_recognition_tpu.data.cocotext import (
    COCOTextIndex,
    build_cocotext_annotations,
    get_cocotext_datasets,
)
from multimodal_scene_text_recognition_tpu.data.lmdb_data import (
    BalancedMixture,
    ConcatSamples,
    keep_ratio_resize,
)
from multimodal_scene_text_recognition_tpu.data.synthetic import make_dataset


# ---------------------------------------------------------------------------
# geometry (reference: coco_dataset.py:275-384)
# ---------------------------------------------------------------------------


def test_rescale_bbox_identity_when_area_matches():
    bbox = [10, 20, 4, 6]
    out = geometry.rescale_bbox_by_mask_area(bbox, 24.0)  # area == w*h
    np.testing.assert_allclose(out, bbox)


def test_rescale_bbox_shrinks_about_center():
    out = geometry.rescale_bbox_by_mask_area([0, 0, 10, 10], 50.0)  # s=0.5
    np.testing.assert_allclose(out, [2.5, 2.5, 5, 5])


def test_overlap_vector_resize_containment():
    # text box [10,10,4,4] area 16 (scale 1); objects: one containing, one not
    classes = np.array([7, 3, 7])  # duplicate class 7 -> unique
    boxes = np.array([
        [8, 8, 10, 10],   # contains -> kept
        [11, 11, 1, 1],   # inside text box, does not contain -> dropped
        [0, 0, 100, 100], # contains -> duplicate class, kept once
    ])
    vec = geometry.overlap_vector([10, 10, 4, 4], 16.0, classes, boxes, "resize")
    assert vec == [8]  # class 7 + 1, unique, first-occurrence order


def test_overlap_vector_iou_threshold_quirk():
    """The reference compares (iou + 1) >= threshold (coco_dataset.py:373),
    so thresholds <= 1 keep everything — quirk preserved."""
    classes = np.array([1, 2])
    boxes = np.array([[0, 0, 10, 10], [100, 100, 5, 5]])
    vec = geometry.overlap_vector([0, 0, 10, 10], 100.0, classes, boxes, "0.5")
    assert vec == [2, 3]  # both pass because iou+1 >= 0.5 always
    vec = geometry.overlap_vector([0, 0, 10, 10], 100.0, classes, boxes, "1.5")
    assert vec == [2]  # only the exact-overlap box has iou+1 >= 1.5


def test_iou_xywh_golden():
    boxes = np.array([[0, 0, 2, 2], [1, 1, 2, 2], [5, 5, 1, 1]], np.float64)
    ref = np.array([0, 0, 2, 2], np.float64)
    iou = geometry.iou_xywh(boxes, ref)
    np.testing.assert_allclose(iou, [1.0, 1 / 7, 0.0], atol=1e-9)


def test_scene_vector_unique_shifted():
    scene, scores = geometry.scene_vector(np.array([0, 5, 0, 2]))
    assert scene == [1, 6, 3]
    assert scores == [1.0, 1.0, 1.0]


def test_pad_semantic_vectors():
    ov, sc, ious = geometry.pad_semantic_vectors([3, 4], [9])
    assert ov.shape == (15,) and sc.shape == (52,) and ious.shape == (52,)
    assert ov[:3].tolist() == [3, 4, 0]
    assert sc[0] == 9
    assert (ious == -1000.0).all()


# ---------------------------------------------------------------------------
# COCO-Text index + annotation build
# ---------------------------------------------------------------------------


def make_cocotext_json(tmp_path):
    data = {
        "imgs": {
            "1": {"id": 1, "set": "train", "file_name": "img1.jpg"},
            "2": {"id": 2, "set": "val", "file_name": "img2.jpg"},
        },
        "imgToAnns": {"1": [10, 11], "2": [12]},
        "anns": {
            "10": {"id": 10, "image_id": 1, "bbox": [0, 0, 10, 10],
                   "area": 80.0, "legibility": "legible",
                   "language": "english", "utf8_string": "hello"},
            "11": {"id": 11, "image_id": 1, "bbox": [5, 5, 4, 4],
                   "area": 10.0, "legibility": "illegible",
                   "language": "english", "utf8_string": "xx"},
            "12": {"id": 12, "image_id": 2, "bbox": [1, 1, 5, 5],
                   "area": 20.0, "legibility": "legible",
                   "language": "english", "utf8_string": "world"},
        },
        "cats": {},
    }
    p = tmp_path / "cocotext.json"
    p.write_text(json.dumps(data))
    tags = {
        "1": {"vinvl": [{"class": 4, "bbox": [0, 0, 50, 50]}]},
        "2": {"vinvl": [{"class": 9, "bbox": [0, 0, 100, 100]},
                        {"class": 9, "bbox": [2, 2, 1, 1]}]},
    }
    t = tmp_path / "tags.json"
    t.write_text(json.dumps(tags))
    return str(p), str(t)


def test_cocotext_index_queries(tmp_path):
    api, _ = make_cocotext_json(tmp_path)
    idx = COCOTextIndex(api)
    assert set(idx.anns) == {10, 11, 12}
    assert idx.train == [1] and idx.val == [2]
    assert sorted(idx.get_ann_ids(img_ids=[1])) == [10, 11]
    assert idx.get_ann_ids(props=[("legibility", "legible")]) == [10, 12]
    assert idx.get_ann_ids(area_range=[15, 100]) == [10, 12]
    assert idx.get_img_ids(props=[("utf8_string", "world")]) == [2]
    assert idx.load_anns(10)[0]["utf8_string"] == "hello"
    assert idx.load_imgs([2])[0]["file_name"] == "img2.jpg"


def test_show_annotations_bbox_and_mask(tmp_path):
    """showAnns parity: filled bbox patches and mask-polygon rendering
    (reference: coco_text.py:170-198)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from multimodal_scene_text_recognition_tpu.data.cocotext import (
        show_annotations,
    )

    anns = [
        {"bbox": [0, 0, 10, 10], "utf8_string": "hello",
         "mask": [0, 0, 10, 0, 10, 10, 0, 10]},
        {"bbox": [5, 5, 4, 4], "utf8_string": "xx",
         "mask": [5, 5, 9, 5, 9, 9]},
    ]
    fig, ax = plt.subplots()
    out = show_annotations(anns, ax=ax)
    assert out is ax
    assert len(ax.collections) == 1          # one PatchCollection
    assert len(ax.texts) == 2                # per-ann transcription labels
    plt.close(fig)

    fig, ax = plt.subplots()
    show_annotations(anns, ax=ax, show_mask=True)
    paths = ax.collections[0].get_paths()
    assert len(paths) == 2
    # first polygon: 4 mask vertices + the reference's synthetic (0,0)
    # closepoly vertex (coco_text.py:184)
    assert len(paths[0].vertices) == 5
    plt.close(fig)

    assert show_annotations([], ax=None) is None


def test_cocotext_load_results(tmp_path):
    api, _ = make_cocotext_json(tmp_path)
    idx = COCOTextIndex(api)
    res_file = tmp_path / "res.json"
    res_file.write_text(json.dumps(
        [{"image_id": 1, "utf8_string": "pred", "bbox": [0, 0, 1, 1]}]
    ))
    res = idx.load_results(str(res_file))
    assert len(res.anns) == 1
    assert res.img_to_anns[1] == [1]


def test_build_cocotext_annotations(tmp_path):
    api, tags = make_cocotext_json(tmp_path)
    cfg = Config(model=ModelConfig(semantic_source="vinvl"))
    cfg = Config(
        model=cfg.model,
        data=cfg.data.__class__(
            cocotext_api_path=api,
            cocotext_object_tags_path=tags,
            cocotext_image_path=str(tmp_path),
        ),
    )
    train = build_cocotext_annotations(cfg, "train")
    val = build_cocotext_annotations(cfg, "val")
    # ann 11 dropped (illegible)
    assert [a.anno_id for a in train] == [10]
    assert [a.anno_id for a in val] == [12]
    # overlap: class 4 box [0,0,50,50] contains rescaled text box -> [5]
    assert train[0].overlap == [5]
    assert train[0].scene == [5]
    # val image has duplicate class 9 -> unique [10]
    assert val[0].overlap == [10]
    assert val[0].scene == [10]
    assert train[0].image_path.endswith("img1.jpg")


def test_anno_filter(tmp_path):
    api, tags = make_cocotext_json(tmp_path)
    cfg = Config(
        data=Config().data.__class__(
            cocotext_api_path=api, cocotext_object_tags_path=tags,
            cocotext_image_path=str(tmp_path),
        )
    )
    out = build_cocotext_annotations(cfg, "train", anno_filter=[11, 12])
    assert out == []  # 10 filtered out; 11 illegible; 12 is val


# ---------------------------------------------------------------------------
# TextOCR
# ---------------------------------------------------------------------------


def test_build_textocr_annotations(tmp_path):
    from multimodal_scene_text_recognition_tpu.data.textocr import (
        build_textocr_annotations,
    )

    data = {
        "imgs": {
            "a": {"id": "a", "set": "train", "file_name": "a.jpg"},
            "b": {"id": "b", "set": "train", "file_name": "b.jpg"},
        },
        "anns": {
            "a1": {"image_id": "a", "bbox": [0, 0, 4, 4], "area": 16.0,
                   "utf8_string": "ok"},
            "a2": {"image_id": "a", "bbox": [0, 0, 4, 4], "area": 16.0,
                   "utf8_string": "."},  # illegible marker
            "b1": {"image_id": "b", "bbox": [0, 0, 4, 4], "area": 16.0,
                   "utf8_string": "skipme"},  # image b has no object tags
        },
    }
    (tmp_path / "TextOCR_train.json").write_text(json.dumps(data))
    (tmp_path / "tags.json").write_text(json.dumps(
        {"a": {"vinvl": [{"class": 1, "bbox": [-1, -1, 50, 50]}]}}
    ))
    cfg = Config(
        data=Config().data.__class__(
            textocr_anno_path=str(tmp_path) + "/",
            textocr_image_path=str(tmp_path) + "/",
            textocr_object_tags_path=str(tmp_path / "tags.json"),
        )
    )
    out = build_textocr_annotations(cfg, "train")
    assert len(out) == 1
    assert out[0].label == "ok"
    assert out[0].overlap == [2]


# ---------------------------------------------------------------------------
# mixing + collate capabilities (reference dataset.py)
# ---------------------------------------------------------------------------


def test_concat_samples():
    a = make_dataset(3, seed=0)
    b = make_dataset(2, seed=1)
    c = ConcatSamples([a, b])
    assert len(c) == 5
    assert c[3].label == b[0].label


def test_balanced_mixture_quotas():
    a = make_dataset(10, seed=0)
    b = make_dataset(4, seed=1)
    mix = BalancedMixture([a, b], ratios=[0.5, 0.5], batch_size=8, seed=0)
    batch = mix.next_batch()
    assert len(batch) == 8
    # 4 from each source; small source b rewinds across batches
    for _ in range(5):
        assert len(mix.next_batch()) == 8


def test_keep_ratio_resize_pads_right():
    img = np.ones((16, 16, 1), np.float32) * 0.5
    out = keep_ratio_resize(img, 32, 100)
    assert out.shape == (32, 100, 1)
    np.testing.assert_allclose(out[:, :32], 0.5, atol=0.02)
    # border replication fills the rest with the last column's value
    np.testing.assert_allclose(
        out[:, 32:], np.broadcast_to(out[:, 31:32], out[:, 32:].shape), atol=0.02
    )


# ---------------------------------------------------------------------------
# bert tag tokenizer
# ---------------------------------------------------------------------------


def test_tag_tokenizer():
    from multimodal_scene_text_recognition_tpu.data.bert_tokens import (
        TagTokenizer,
    )

    tok = TagTokenizer(["traffic light", "person", "car"])
    ids = tok.encode_tags(["person", "traffic light"], max_len=10)
    assert ids.shape == (10,)
    v = tok.vocab
    assert ids[0] == v["[CLS]"]
    assert list(ids[1:6]) == [v["person"], v["[SEP]"], v["traffic"],
                              v["light"], 0]
    # unknown tags hit [UNK]
    ids2 = tok.encode_tags(["zebra"], max_len=4)
    assert ids2[1] == v["[UNK]"]
    # frequency encoding repeats tags
    ids3 = tok.encode_tags(["car"], max_len=8, encode_frequency=True,
                           counts=[2])
    assert list(ids3[:4]) == [v["[CLS]"], v["car"], v["[SEP]"], v["car"]]


def test_tokenizer_from_class_file():
    from multimodal_scene_text_recognition_tpu.data.bert_tokens import (
        tokenizer_from_class_file,
    )

    tok = tokenizer_from_class_file("assets/features/coco_classes.txt")
    assert tok.vocab_size > 80
    ids = tok.encode_tags(["person", "car"], max_len=8)
    assert (ids[:4] > 0).all()


def test_native_crop_loader_matches_pil(tmp_path):
    from PIL import Image

    from multimodal_scene_text_recognition_tpu.data.cocotext import (
        load_crop,
        load_crop_native,
    )

    # smooth gradient page: PIL's area-weighted BILINEAR and our 2-tap
    # bilinear agree on smooth content (they differ materially only on
    # high-frequency noise)
    yy, xx = np.mgrid[0:200, 0:300]
    page = ((yy * 255 / 200 + xx * 255 / 300) / 2).astype(np.uint8)
    p = str(tmp_path / "page.png")
    Image.fromarray(page).save(p)
    bbox = [40.0, 30.0, 120.0, 60.0]
    a = load_crop(p, bbox)
    b = load_crop_native(p, bbox)
    assert a.shape == b.shape == (32, 100, 1)
    assert np.abs(a - b).mean() < 0.01


def test_make_packed_dataset_cache_roundtrip(tmp_path):
    """Cached corpora load straight into PackedSamples (uint8 end-to-end),
    and the packed object satisfies the sample-sequence protocol."""
    from multimodal_scene_text_recognition_tpu.core.charset import AttnCodec
    from multimodal_scene_text_recognition_tpu.data.pipeline import (
        Batcher,
        PackedSamples,
    )
    from multimodal_scene_text_recognition_tpu.data.synthetic import (
        make_packed_dataset,
    )

    codec = AttnCodec("".join(chr(33 + i) for i in range(94)), 25)
    d = str(tmp_path)
    p1 = make_packed_dataset(codec, 96, seed=7, cache_dir=d)   # renders+saves
    p2 = make_packed_dataset(codec, 96, seed=7, cache_dir=d)   # loads npz
    assert isinstance(p2, PackedSamples)
    assert p2.image.dtype == np.uint8
    assert p1.labels == p2.labels
    assert np.array_equal(p1.text, p2.text)
    assert np.abs(p1.image.astype(int) - p2.image.astype(int)).max() <= 1

    # PackedSamples.from_samples short-circuits on packed input
    assert PackedSamples.from_samples(p2, codec) is p2

    # sample-like views + uint8-preserving collate
    s = p2[3]
    assert s.label == p2.labels[3] and s.image.dtype == np.uint8
    batch = Batcher(codec, 8).collate([p2[i] for i in range(8)])
    assert batch["image"].dtype == np.uint8
