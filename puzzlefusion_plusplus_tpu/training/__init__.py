from puzzlefusion_plusplus_tpu.training import denoiser, state, verifier, vqvae  # noqa: F401
