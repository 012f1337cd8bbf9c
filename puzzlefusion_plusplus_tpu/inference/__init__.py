from puzzlefusion_plusplus_tpu.inference.engine import (
    AgglConfig,
    AgglState,
    auto_agglomerate,
    auto_agglomerate_batch,
    connected_components,
)
from puzzlefusion_plusplus_tpu.inference.sampler import (
    FrozenEncoder,
    ddpm_sample,
    extract_features,
    make_frozen_encoder,
)

__all__ = [
    "AgglConfig",
    "AgglState",
    "auto_agglomerate",
    "auto_agglomerate_batch",
    "connected_components",
    "FrozenEncoder",
    "ddpm_sample",
    "extract_features",
    "make_frozen_encoder",
]
