"""puzzlefusion_plusplus_tpu — a TPU-native (JAX/XLA/Pallas/pjit) fracture-assembly framework.

A from-scratch re-design of the capabilities of PuzzleFusion++ (eric-zqwang/puzzlefusion-plusplus,
"Auto-agglomerative 3D Fracture Assembly by Denoise and Verify"):

* ``models.vqvae``     — VQ-VAE fragment autoencoder (PointNet++ SSG encoder, vector-quantized
                         codebook, per-token offset decoder).
* ``models.denoiser``  — SE(3) pose-diffusion transformer with AdaLayerNorm timestep conditioning
                         and dual (part-local / global-validity) attention masks.
* ``models.verifier``  — pairwise-alignment edge transformer.
* ``models.scheduler`` — DDPM scheduler with the piecewise alpha-bar schedule, as pure arrays +
                         functions (jit/scan friendly).
* ``ops``              — TPU kernels & fixed-shape geometry ops: chamfer distance (Pallas),
                         farthest point sampling, ball query, kNN, point-cloud normals.
* ``inference``        — the auto-agglomerative denoise-verify-merge engine as a single jitted
                         program over dense graph state.
* ``data``             — host-side data pipeline: mesh preprocessing, .npz dataset readers with
                         the reference augmentations, synthetic fixtures.
* ``training``         — data-parallel (jax.sharding over ICI) training loops with orbax
                         checkpointing.
* ``parallel``         — device mesh / sharding helpers.

Everything on the compute path is fixed-shape and jit-compatible by construction.
"""

__version__ = "0.1.0"
