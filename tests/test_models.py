"""Model-family forward/shape/grad tests (full reference hyperparameters, tiny batches)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import jit_apply, jit_init

from puzzlefusion_plusplus_tpu.models import (
    DenoiserTransformer,
    VectorQuantizer,
    VerifierTransformer,
    VQVAE,
)

RNG = np.random.default_rng(4)
KEY = jax.random.PRNGKey(0)


class TestVectorQuantizer:
    def test_quantize_roundtrip(self):
        vq = VectorQuantizer(n_e=64, e_dim=16, beta=0.25)
        z = jnp.array(RNG.standard_normal((2, 10, 16)).astype(np.float32))
        params = vq.init(KEY, z)
        loss, z_q, ppl, idx = vq.apply(params, z)
        assert z_q.shape == z.shape
        assert idx.shape == (2, 10)
        assert float(loss) > 0
        assert 1.0 <= float(ppl) <= 64.0
        # straight-through: gradient w.r.t. z is identity for the pass-through part
        g = jax.grad(lambda z: vq.apply(params, z)[1].sum())(z)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-5)

    def test_codes_are_nearest(self):
        vq = VectorQuantizer(n_e=32, e_dim=4, beta=0.25)
        z = jnp.array(RNG.standard_normal((1, 20, 4)).astype(np.float32))
        params = vq.init(KEY, z)
        cb = np.asarray(params["params"]["embedding"])
        _, _, _, idx = vq.apply(params, z)
        d = ((np.asarray(z)[0, :, None, :] - cb[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx)[0], d.argmin(-1))


class TestVQVAE:
    @pytest.fixture(scope="class")
    def model(self):
        m = VQVAE()
        pcs = jnp.array(RNG.standard_normal((2, 300, 3)).astype(np.float32))
        variables = jit_init(m, KEY, pcs, train=False)
        return m, variables, pcs

    def test_forward_shapes(self, model):
        m, variables, pcs = model
        out = jit_apply(m, variables, pcs, train=False)
        assert out["pc_offset"].shape == (2, 25, 40, 3)
        assert out["xyz"].shape == (2, 25, 3)
        assert out["z_q"].shape == (2, 25, 64)
        recon = jit_apply(m, variables, out, method=VQVAE.reconstruction)
        assert recon.shape == (2, 1000, 3)

    def test_encode_shapes(self, model):
        m, variables, pcs = model
        enc = jit_apply(m, variables, pcs, method=VQVAE.encode)
        assert enc["z_q"].shape == (2, 25, 64)
        assert enc["xyz"].shape == (2, 25, 3)

    def test_train_updates_batch_stats(self, model):
        m, variables, pcs = model
        out, mutated = jit_apply(m, variables, pcs, train=True, mutable=("batch_stats",))
        assert "batch_stats" in mutated


class TestDenoiser:
    @pytest.fixture(scope="class")
    def setup(self):
        m = DenoiserTransformer()
        B, P, L = 2, 20, 25
        args = dict(
            x=jnp.array(RNG.standard_normal((B, P, 7)).astype(np.float32)),
            timesteps=jnp.array([10, 500]),
            latent=jnp.array(RNG.standard_normal((B, P, L, 64)).astype(np.float32)),
            xyz=jnp.array(RNG.standard_normal((B, P, L, 3)).astype(np.float32)),
            part_valids=jnp.array((RNG.random((B, P)) > 0.3).astype(np.float32)),
            scale=jnp.array(RNG.random((B, P, 1)).astype(np.float32)),
            ref_part=jnp.zeros((B, P), bool).at[:, 0].set(True),
        )
        variables = jit_init(m, KEY, **args, train=False)
        return m, variables, args

    def test_forward_shape(self, setup):
        m, variables, args = setup
        out = jit_apply(m, variables, **args, train=False)
        assert out.shape == (2, 20, 7)
        assert bool(jnp.isfinite(out).all())

    def test_deterministic_eval(self, setup):
        m, variables, args = setup
        o1 = jit_apply(m, variables, **args, train=False)
        o2 = jit_apply(m, variables, **args, train=False)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_dropout_train_mode(self, setup):
        m, variables, args = setup
        o1 = jit_apply(m, variables, **args, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
        o2 = jit_apply(m, variables, **args, train=True,
                       rngs={"dropout": jax.random.PRNGKey(2)})
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6

    def test_invalid_parts_dont_affect_valid_output(self, setup):
        """Global attention masks padded parts; perturbing their latents must not change
        valid parts' outputs."""
        m, variables, args = setup
        out1 = jit_apply(m, variables, **args, train=False)
        invalid = np.asarray(args["part_valids"]) == 0
        latent2 = np.asarray(args["latent"]).copy()
        latent2[invalid] += 100.0
        args2 = dict(args, latent=jnp.array(latent2))
        out2 = jit_apply(m, variables, **args2, train=False)
        valid = ~invalid
        np.testing.assert_allclose(
            np.asarray(out1)[valid], np.asarray(out2)[valid], atol=1e-4
        )


class TestVerifier:
    def test_forward_and_mask(self):
        m = VerifierTransformer()
        B, E = 2, 190
        feats = jnp.array(RNG.standard_normal((B, E, 7)).astype(np.float32))
        idx = jnp.array(RNG.integers(0, 20, (B, E, 2)))
        valids = jnp.array((RNG.random((B, E)) > 0.5).astype(np.float32))
        variables = jit_init(m, KEY, feats, idx, valids, train=False)
        logits = jit_apply(m, variables, feats, idx, valids, train=False)
        assert logits.shape == (B, E, 1)
        # invalid edges as keys must not influence valid edges' logits
        feats2 = np.asarray(feats).copy()
        feats2[np.asarray(valids) == 0] += 50.0
        logits2 = jit_apply(m, variables, jnp.array(feats2), idx, valids, train=False)
        vmask = np.asarray(valids) == 1
        np.testing.assert_allclose(
            np.asarray(logits)[vmask], np.asarray(logits2)[vmask], atol=1e-4
        )


def test_cached_grouping_indices_match_uncached():
    """FPS/ball-query indices are rotation-invariant: encoding with a cache built on the
    unrotated cloud must equal the uncached encode of the rotated cloud."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from puzzlefusion_plusplus_tpu.inference.sampler import (
        build_feature_cache,
        extract_features,
        make_frozen_encoder,
    )
    from puzzlefusion_plusplus_tpu.models.vqvae import VQVAE

    ae = VQVAE(n_embeddings=32, embedding_dim=16, num_point=25, num_dim=64,
               sa_npoints=(32, 16), sa_nsamples=(8, 8, 8))
    v = jit_init(ae, jax.random.key(0), jnp.zeros((1, 128, 3)), train=False)
    enc = make_frozen_encoder(ae, v["params"], v.get("batch_stats", {}))
    rng = np.random.default_rng(0)
    pcs = jnp.asarray(rng.normal(size=(1, 4, 128, 3)).astype(np.float32))
    valids = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    noisy = jnp.asarray(rng.normal(size=(1, 4, 7)).astype(np.float32))
    # jit + persistent cache: these eager forwards cost ~35 s of per-op dispatch here
    cache = jax.jit(build_feature_cache, static_argnums=0)(enc, pcs, valids)
    l1, x1 = jax.jit(extract_features, static_argnums=0)(enc, pcs, valids, noisy)
    l2, x2 = jax.jit(extract_features, static_argnums=0)(enc, pcs, valids, noisy, cache)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
