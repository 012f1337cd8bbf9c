from puzzlefusion_plusplus_tpu.data.datasets import (
    DenoiserDataset,
    VerifierDataset,
    VQVAEDataset,
)
from puzzlefusion_plusplus_tpu.data.loader import Loader, prefetch_batches
from puzzlefusion_plusplus_tpu.data.synthetic import generate_dataset

__all__ = [
    "DenoiserDataset",
    "VerifierDataset",
    "VQVAEDataset",
    "Loader",
    "prefetch_batches",
    "generate_dataset",
]
