"""Reference-shaped convenience API.

A user of the reference interacts with five functions (SURVEY.md §1):
``get_model`` (model.py:109), ``train`` / ``validate`` / ``evaluate`` /
``get_dataset`` (training_functions.py).  This facade provides the same
verbs over the TPU stack so migration is mechanical; the full-control path
is the underlying modules (train/loop.py, eval/evaluate.py, cli.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .core.charset import AttnCodec
from .core.config import Config


@dataclass
class ModelBundle:
    """Model + variables + config — what reference code treats as 'model'."""

    model: object
    state: object
    cfg: Config

    @property
    def variables(self):
        return self.state.variables()


def get_model(saved_model: Optional[str] = None, cfg: Optional[Config] = None) -> ModelBundle:
    """Build the configured model; optionally load an orbax checkpoint or a
    reference `.pth` (reference: model.py:109-128)."""
    import jax
    import jax.numpy as jnp

    from .models.model import build_model
    from .train.state import create_train_state, make_optimizer

    cfg = cfg or Config(saved_model=saved_model)
    if saved_model:
        cfg = Config(**{**cfg.__dict__, "saved_model": saved_model})
    model = build_model(cfg.model)

    # shape-only init batch straight from config — no renderer/font/data
    # dependency just to initialise parameters
    m = cfg.model
    B = min(cfg.train.batch_size, 8)
    sample = {
        "image": jnp.zeros((B, m.img_h, m.img_w, 1), jnp.float32),
        "text": jnp.zeros((B, m.max_text_length + 2), jnp.int32),
        "overlap": jnp.zeros((B, m.max_overlap_objs), jnp.int32),
        "scene": jnp.zeros((B, m.max_scene_objs), jnp.int32),
        "ious": jnp.full((B, m.max_scene_objs), -1000.0, jnp.float32),
    }
    rng = jax.random.PRNGKey(cfg.train.seed)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, tx, sample, rng)

    if cfg.saved_model:
        if cfg.saved_model.endswith((".pt", ".pth")):
            from .train.checkpoint import import_torch_checkpoint

            variables, stats = import_torch_checkpoint(
                cfg.saved_model, state.variables()
            )
            print(f"  - Loading model from: {cfg.saved_model} ({stats['loaded']} tensors)")
            state = state.replace(
                params=variables["params"], batch_stats=variables["batch_stats"]
            )
        elif cfg.saved_model.endswith(".npz"):
            # compact fp16 params bundle (train/checkpoint.save_params_bundle)
            from .train.checkpoint import restore_params_bundle

            state = restore_params_bundle(cfg.saved_model, state)
            print(f"  - Loading params bundle: {cfg.saved_model}")
        else:
            from .train.checkpoint import restore_checkpoint

            state = restore_checkpoint(cfg.saved_model, state)
            print(f"  - Loading model from: {cfg.saved_model}")
    else:
        print("  - Training from scratch (no pretrained weights provided)")
    return ModelBundle(model, state, cfg)


def get_dataset(name: str, cfg: Optional[Config] = None):
    """Dataset dispatch (reference: training_functions.py:16-28)."""
    cfg = cfg or Config()
    if name in ("synthetic",):
        from .data.synthetic import make_dataset

        return (
            make_dataset(cfg.data.synthetic_train_size, seed=cfg.train.seed),
            make_dataset(cfg.data.synthetic_val_size, seed=cfg.train.seed + 1),
        )
    if name == "cocotext":
        from .data.cocotext import get_cocotext_datasets

        return get_cocotext_datasets(cfg)
    if name == "textocr":
        from .data.textocr import get_textocr_datasets

        return get_textocr_datasets(cfg)
    if name == "synth":
        from .data.lmdb_data import get_synth_datasets

        return get_synth_datasets(cfg)
    if name == "cocotext_single_image_val":
        from .data.cocotext import (
            CocoTextSamples,
            build_cocotext_annotations,
        )

        return CocoTextSamples(build_cocotext_annotations(cfg, "val"), cfg)
    raise ValueError(f"unknown dataset {name!r}")


def train(bundle: ModelBundle, dataset: str = "synthetic",
          validation_steps: int = 2000, iteration_limit: Optional[int] = None):
    """Train (reference: training_functions.py:30-148)."""
    import dataclasses

    from .train.loop import train as train_loop

    cfg = bundle.cfg
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            validation_steps=validation_steps,
            iteration_limit=iteration_limit,
        ),
    )
    train_samples, val_samples = get_dataset(dataset, cfg)
    bundle.state = train_loop(cfg, bundle.model, train_samples, val_samples,
                              state=bundle.state)
    return bundle


def validate(bundle: ModelBundle, dataset: str = "synthetic",
             print_samples: bool = False, return_dataframe: bool = False):
    """Greedy validation (reference: training_functions.py:150-207).
    Returns the accuracy, or (accuracy, DataFrame) like run_validation."""
    from .data.pipeline import Batcher, batches
    from .eval.evaluate import validate as run
    from .train.steps import make_eval_step

    cfg = bundle.cfg
    codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
    _, val_samples = get_dataset(dataset, cfg)
    batcher = Batcher(codec, cfg.train.batch_size)
    result = run(
        make_eval_step(bundle.model), bundle.variables,
        batches(val_samples, batcher, shuffle=False, drop_last=False),
        codec, print_samples=print_samples, return_records=return_dataframe,
    )
    if return_dataframe:
        return result.accuracy, result.to_dataframe()
    return result.accuracy


run_validation = validate  # reference alias (training_functions.py:146-148)


def evaluate(bundle: ModelBundle, base_errors_path: str,
             dataset: str = "cocotext", print_sem: bool = False):
    """Error-correction differential eval (reference: training_functions.py:
    210-269)."""
    from .data.pipeline import Batcher, batches
    from .eval.evaluate import error_diff_eval, load_class_labels
    from .train.steps import make_eval_step

    cfg = bundle.cfg
    codec = AttnCodec(cfg.model.chars, cfg.model.max_text_length)
    _, val_samples = get_dataset(dataset, cfg)
    with open(base_errors_path) as f:
        base_errors = set(f.read().splitlines())
    try:
        labels = load_class_labels(cfg.data.class_labels_dir,
                                   cfg.model.semantic_source)
    except OSError:
        labels = None
    batcher = Batcher(codec, cfg.train.batch_size)
    return error_diff_eval(
        make_eval_step(bundle.model), bundle.variables,
        batches(val_samples, batcher, shuffle=False, drop_last=False),
        codec, base_errors, class_labels=labels,
        semantic_vector=cfg.model.semantic_vector, print_sem=print_sem,
    )
