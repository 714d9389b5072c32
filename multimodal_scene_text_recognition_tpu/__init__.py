"""TPU-native multimodal scene-text recognition framework.

Top-level convenience surface (the reference-shaped verbs live in
:mod:`.api`; the full-control modules are core/ ops/ models/ data/ train/
eval/ parallel/ utils/).
"""

from .core.config import Config, DataConfig, ModelConfig, ParallelConfig, TrainConfig

__version__ = "0.1.0"

__all__ = [
    "Config",
    "ModelConfig",
    "TrainConfig",
    "DataConfig",
    "ParallelConfig",
    "__version__",
]
