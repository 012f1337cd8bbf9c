from puzzlefusion_plusplus_tpu.models.denoiser import DenoiserTransformer
from puzzlefusion_plusplus_tpu.models.verifier import VerifierTransformer
from puzzlefusion_plusplus_tpu.models.vqvae import PN2, VQVAE, VectorQuantizer

__all__ = [
    "DenoiserTransformer",
    "VerifierTransformer",
    "PN2",
    "VQVAE",
    "VectorQuantizer",
]
