"""CLI entry points: train / validate / evaluate.

Replaces the reference's edit-config.py-and-rerun workflow (run.py / train.py
/ evaluate.py have no argument parsing; run.py:5-7 is an abandoned argv
check).  Every config switch is addressable as a dotted override:

    python -m multimodal_scene_text_recognition_tpu.cli train \
        --set model.encoder=lstm --set train.batch_size=96 \
        --dataset synthetic

    python -m multimodal_scene_text_recognition_tpu.cli validate \
        --checkpoint results/models/exp --records out.csv

    python -m multimodal_scene_text_recognition_tpu.cli evaluate \
        --checkpoint results/models/exp --base-errors results/base_error_ids.txt
"""

from __future__ import annotations

import argparse
import sys

from .core.charset import AttnCodec
from .core.config import Config, apply_overrides


def _load_dataset(cfg: Config, split_sizes=None):
    name = cfg.data.dataset
    if name == "synthetic":
        from .data.synthetic import (
            make_dataset,
            make_packed_dataset,
            random_vocab,
        )

        n_train = cfg.data.synthetic_train_size
        n_val = cfg.data.synthetic_val_size
        if split_sizes:
            n_train, n_val = split_sizes
        vocab = None
        if cfg.data.synthetic_vocab_size > 0:
            vocab = random_vocab(cfg.data.synthetic_vocab_size,
                                 seed=cfg.train.seed)
        cache = cfg.data.synthetic_cache_dir or None
        if cache:
            # packed path: uint8 arrays end-to-end, no per-sample objects
            from .train.loop import build_codec

            codec = build_codec(cfg)
            return (
                make_packed_dataset(codec, n_train, seed=cfg.train.seed,
                                    vocab_words=vocab, cache_dir=cache),
                make_packed_dataset(codec, n_val, seed=cfg.train.seed + 1,
                                    vocab_words=vocab, cache_dir=cache),
            )
        return (
            make_dataset(n_train, seed=cfg.train.seed, vocab_words=vocab),
            make_dataset(n_val, seed=cfg.train.seed + 1, vocab_words=vocab),
        )
    if name == "cocotext":
        from .data.cocotext import get_cocotext_datasets

        try:
            return get_cocotext_datasets(cfg)
        except FileNotFoundError as e:
            raise SystemExit(
                f"cocotext dataset unavailable: {e}\n"
                "The COCO-Text annotation JSONs and MS-COCO images are "
                "stripped from this mirror (reference "
                ".MISSING_LARGE_BLOBS:1-4).  To run the real-data parity "
                "eval, mount them and point the config at the files:\n"
                "  --set data.cocotext_api_path=/path/COCO_Text_2014.json \\\n"
                "  --set data.cocotext_object_tags_path=/path/"
                "coco_object_tags.json \\\n"
                "  --set data.cocotext_image_path=/path/train2014/\n"
                "then: cli validate --dataset cocotext --checkpoint ref.pth"
            ) from e
    if name == "textocr":
        from .data.textocr import get_textocr_datasets

        try:
            return get_textocr_datasets(cfg)
        except FileNotFoundError as e:
            raise SystemExit(
                f"textocr dataset unavailable: {e}\n"
                "TextOCR annotations/images are stripped from this mirror; "
                "mount them and set data.textocr_anno_path / "
                "data.textocr_image_path / data.textocr_object_tags_path "
                "(see core/config.py DataConfig)."
            ) from e
    if name == "synth":
        from .data.lmdb_data import get_synth_datasets

        return get_synth_datasets(cfg)
    raise ValueError(f"unknown dataset {name!r}")


def _build(cfg: Config):
    from .models.model import build_model

    return build_model(cfg.model)


def _restore(cfg: Config, model, sample_batch):
    """Restore a checkpoint (orbax dir or reference .pth) into variables."""
    import jax

    from .data.pipeline import device_batch
    from .train.state import create_train_state, make_optimizer

    rng = jax.random.PRNGKey(cfg.train.seed)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, tx, sample_batch, rng)
    if cfg.saved_model:
        if cfg.saved_model.endswith((".pt", ".pth")):
            from .train.checkpoint import import_torch_checkpoint

            variables, stats = import_torch_checkpoint(
                cfg.saved_model, state.variables()
            )
            print(f"  - imported torch checkpoint: {stats}")
            state = state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
            )
        else:
            from .train.checkpoint import restore_checkpoint

            state = restore_checkpoint(cfg.saved_model, state)
            print(f"  - restored checkpoint from {cfg.saved_model}")
    return state


def _recognize(args):
    """Folder-of-images inference (RawImageFolder + serving Recognizer)."""
    cfg = Config()
    if args.checkpoint:
        cfg = apply_overrides(cfg, {"saved_model": args.checkpoint})
    cfg = apply_overrides(cfg, args.set)

    from .data.raw import RawImageFolder
    from .eval.serve import Recognizer

    model = _build(cfg)
    folder = RawImageFolder(args.images, cfg.model.img_h, cfg.model.img_w)
    if not len(folder):
        print("no images found")
        return 1

    from .data.pipeline import Batcher, batches, device_batch
    from .core.charset import AttnCodec

    codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
    batcher = Batcher(codec, min(len(folder), 64))
    sample = device_batch(
        next(iter(batches(folder, batcher, shuffle=False, drop_last=False)))
    )
    state = _restore(cfg, model, sample)
    rec = Recognizer(model, state.variables(), cfg)
    crops = [folder[i].image for i in range(len(folder))]
    texts = rec.recognize(crops, beam_size=args.beam)
    for i, t in enumerate(texts):
        print(f"{folder.paths[i]}\t{t}")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mstr-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--set", action="append", default=[],
                       help="config override key=value (repeatable)")
        p.add_argument("--dataset", default=None)
        p.add_argument("--checkpoint", default=None,
                       help="orbax dir or reference .pth")
        p.add_argument("--experiment", default=None)

    p_train = sub.add_parser("train")
    common(p_train)
    p_val = sub.add_parser("validate")
    common(p_val)
    p_val.add_argument("--records", default=None,
                       help="write per-sample prediction CSV here")
    p_val.add_argument("--dump-attention", action="store_true",
                       help="print fusion attention-score tables for the "
                            "first batch (reference PRINT_ATTENTION_SCORES)")
    p_eval = sub.add_parser("evaluate")
    common(p_eval)
    p_eval.add_argument("--base-errors", required=False,
                        help="file of anno ids a baseline got wrong")
    p_eval.add_argument("--print-sem", action="store_true")
    p_rec = sub.add_parser("recognize",
                           help="recognize a folder of word-crop images")
    common(p_rec)
    p_rec.add_argument("images", help="directory of crop images")
    p_rec.add_argument("--beam", type=int, default=0,
                       help="beam size (0 = greedy)")

    args = parser.parse_args(argv)

    if args.cmd == "recognize":
        return _recognize(args)

    cfg = Config()
    if args.experiment:
        cfg = apply_overrides(cfg, {"experiment": args.experiment})
    if args.dataset:
        cfg = apply_overrides(cfg, {"data.dataset": args.dataset})
    if args.checkpoint:
        cfg = apply_overrides(cfg, {"saved_model": args.checkpoint})
    cfg = apply_overrides(cfg, args.set)

    # multi-host: no-op single-process; joins the jax.distributed cluster
    # when launched with the recipe in parallel/mesh.init_distributed
    from .parallel.mesh import init_distributed

    n_proc = init_distributed()
    if n_proc > 1:
        print(f"  - distributed: {n_proc} processes, "
              f"{len(__import__('jax').devices())} global devices")

    model = _build(cfg)
    from .train.loop import build_codec

    codec = build_codec(cfg)
    train_samples, val_samples = _load_dataset(cfg)

    from .data.pipeline import Batcher, batches, device_batch

    batcher = Batcher(codec, cfg.train.batch_size)
    # head slice via integer indexing (dataset classes are Sequence-like but
    # not sliceable)
    head = [val_samples[i]
            for i in range(min(len(val_samples), cfg.train.batch_size))]
    sample = device_batch(
        next(iter(batches(head, batcher, shuffle=False, drop_last=False)))
    )
    state = _restore(cfg, model, sample)

    if args.cmd == "train":
        from .train.loop import train as train_loop

        train_loop(cfg, model, train_samples, val_samples, state=state)
        return 0

    from .eval.evaluate import validate as run_validate
    from .train.steps import make_eval_step

    eval_step = make_eval_step(model)

    if args.cmd == "validate":
        if args.dump_attention:
            from .eval.attention import print_attention_scores

            first = device_batch(
                next(iter(batches(val_samples, batcher, shuffle=False,
                                  drop_last=False)))
            )
            print_attention_scores(model, state.variables(), first)
        result = run_validate(
            eval_step, state.variables(),
            batches(val_samples, batcher, shuffle=False, drop_last=False),
            codec, print_samples=True, return_records=bool(args.records),
        )
        print(f"val accuracy: {result.accuracy}%")
        if args.records:
            result.to_dataframe().to_csv(args.records, index=False)
            print(f"wrote {args.records}")
        return 0

    if args.cmd == "evaluate":
        from .eval.evaluate import error_diff_eval, load_class_labels

        base_errors = set()
        if args.base_errors:
            with open(args.base_errors) as f:
                base_errors = set(f.read().splitlines())
        labels = None
        try:
            labels = load_class_labels(
                cfg.data.class_labels_dir, cfg.model.semantic_source
            )
        except OSError:
            pass
        out = error_diff_eval(
            eval_step, state.variables(),
            batches(val_samples, batcher, shuffle=False, drop_last=False),
            codec, base_errors, class_labels=labels,
            semantic_vector=cfg.model.semantic_vector,
            print_sem=args.print_sem,
        )
        print(f"Corrected: {out['corrected']} / {out['total']}")
        return 0


if __name__ == "__main__":
    sys.exit(main())
