from puzzlefusion_plusplus_tpu.data.datasets import (
    DenoiserDataset,
    VerifierDataset,
    VQVAEDataset,
)
from puzzlefusion_plusplus_tpu.data.loader import Loader
from puzzlefusion_plusplus_tpu.data.synthetic import generate_dataset

__all__ = [
    "DenoiserDataset",
    "VerifierDataset",
    "VQVAEDataset",
    "Loader",
    "generate_dataset",
]
