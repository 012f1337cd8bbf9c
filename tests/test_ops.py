"""Geometry-op numerics: chamfer / FPS / ball query / kNN / normals vs brute-force oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu import ops

RNG = np.random.default_rng(1)


def brute_nn(x, y):
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    return d.min(-1), d.argmin(-1)


class TestChamfer:
    def test_nn_distance_matches_bruteforce(self):
        x = RNG.standard_normal((3, 100, 3)).astype(np.float32)
        y = RNG.standard_normal((3, 130, 3)).astype(np.float32)
        d, idx = ops.nn_distance(jnp.array(x), jnp.array(y))
        bd, bidx = brute_nn(x, y)
        np.testing.assert_allclose(np.asarray(d), bd, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), bidx)

    def test_chamfer_mean_symmetric_zero(self):
        x = RNG.standard_normal((2, 50, 3)).astype(np.float32)
        cd = ops.chamfer_distance_mean(jnp.array(x), jnp.array(x))
        np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-5)

    def test_gradients(self):
        x = jnp.array(RNG.standard_normal((2, 20, 3)).astype(np.float32))
        y = jnp.array(RNG.standard_normal((2, 25, 3)).astype(np.float32))

        def loss(x, y):
            return ops.chamfer_distance_mean(x, y).sum()

        gx, gy = jax.grad(loss, argnums=(0, 1))(x, y)
        # numerical check on a few coordinates
        eps = 1e-3
        for b, n, c in [(0, 3, 1), (1, 7, 2)]:
            xp = x.at[b, n, c].add(eps)
            xm = x.at[b, n, c].add(-eps)
            num = (loss(xp, y) - loss(xm, y)) / (2 * eps)
            np.testing.assert_allclose(gx[b, n, c], num, rtol=2e-2, atol=1e-3)
        for b, m, c in [(0, 5, 0), (1, 11, 1)]:
            yp = y.at[b, m, c].add(eps)
            ym = y.at[b, m, c].add(-eps)
            num = (loss(x, yp) - loss(x, ym)) / (2 * eps)
            np.testing.assert_allclose(gy[b, m, c], num, rtol=2e-2, atol=1e-3)

    def test_default_reduction(self):
        x = RNG.standard_normal((4, 30, 3)).astype(np.float32)
        y = RNG.standard_normal((4, 30, 3)).astype(np.float32)
        got = ops.chamfer_distance_default(jnp.array(x), jnp.array(y))
        fwd, _ = brute_nn(x, y)
        bwd, _ = brute_nn(y, x)
        want = (fwd.sum(-1) + bwd.sum(-1)).mean()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


class TestFPS:
    def brute_fps(self, xyz, npoint, mask=None):
        N = xyz.shape[0]
        if mask is None:
            mask = np.ones(N, bool)
        dist = np.where(mask, 1e10, -1e10)
        farthest = int(np.argmax(mask))
        out = []
        for _ in range(npoint):
            out.append(farthest)
            d = ((xyz - xyz[farthest]) ** 2).sum(-1)
            d = np.where(mask, d, -1e10)
            dist = np.minimum(dist, d)
            farthest = int(np.argmax(dist))
        return np.array(out)

    def test_matches_bruteforce(self):
        xyz = RNG.standard_normal((2, 64, 3)).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.array(xyz), 16))
        for b in range(2):
            np.testing.assert_array_equal(idx[b], self.brute_fps(xyz[b], 16))

    def test_masked(self):
        xyz = RNG.standard_normal((1, 64, 3)).astype(np.float32)
        mask = np.zeros((1, 64), bool)
        mask[0, 10:40] = True
        idx = np.asarray(ops.farthest_point_sample(jnp.array(xyz), 8, jnp.array(mask)))
        assert ((idx >= 10) & (idx < 40)).all()
        np.testing.assert_array_equal(idx[0], self.brute_fps(xyz[0], 8, mask[0]))

    def test_starts_at_first_point(self):
        xyz = RNG.standard_normal((3, 32, 3)).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.array(xyz), 4))
        assert (idx[:, 0] == 0).all()


class TestBallQuery:
    def test_matches_reference_semantics(self):
        # reference keeps the nsample LOWEST-INDEX in-radius points, backfilled by first hit
        xyz = RNG.standard_normal((2, 40, 3)).astype(np.float32)
        new_xyz = xyz[:, :10]
        radius, k = 0.8, 6
        got = np.asarray(ops.query_ball_point(radius, k, jnp.array(xyz), jnp.array(new_xyz)))
        for b in range(2):
            for s in range(10):
                d = ((xyz[b] - new_xyz[b, s]) ** 2).sum(-1)
                hits = np.where(d <= radius**2)[0]
                want = list(hits[:k])
                if len(want) == 0:
                    want = [0] * k
                while len(want) < k:
                    want.append(want[0])
                np.testing.assert_array_equal(got[b, s], np.array(want))


class TestKNN:
    def test_matches_bruteforce(self):
        q = RNG.standard_normal((2, 15, 3)).astype(np.float32)
        p = RNG.standard_normal((2, 30, 3)).astype(np.float32)
        d, idx = ops.knn_points(jnp.array(q), jnp.array(p), 4)
        bd = ((q[:, :, None] - p[:, None]) ** 2).sum(-1)
        order = np.argsort(bd, axis=-1, kind="stable")[..., :4]
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(bd, order, -1), atol=1e-4
        )
        # indices may tie-swap; distances are canonical. check sets on a few rows
        assert set(np.asarray(idx)[0, 0].tolist()) == set(order[0, 0].tolist())


class TestNormals:
    def test_plane_normals(self):
        # points on the z=0 plane -> normals +-z
        pts = RNG.standard_normal((1, 200, 3)).astype(np.float32)
        pts[..., 2] = 0.0
        n = np.asarray(ops.estimate_pointcloud_normals(jnp.array(pts), 20))
        np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-4)
        np.testing.assert_allclose(n[..., :2], 0.0, atol=1e-4)

    def test_sphere_normals_point_inward(self):
        # disambiguation flips toward the neighborhood majority (center of a sphere patch)
        u = RNG.standard_normal((1, 500, 3))
        sphere = (u / np.linalg.norm(u, axis=-1, keepdims=True)).astype(np.float32)
        n = np.asarray(ops.estimate_pointcloud_normals(jnp.array(sphere), 20))
        cosang = np.sum(n * sphere, axis=-1)
        # radial alignment, consistent inward orientation
        assert (np.abs(cosang) > 0.95).mean() > 0.98
        assert (cosang < 0).mean() > 0.95

    def test_analytic_eigvec_matches_eigh(self):
        """Closed-form smallest eigenvector == LAPACK eigh up to sign (random SPD-ish and
        near-planar covariances — the analytic path replaces the 660 ms batched eigh)."""
        from puzzlefusion_plusplus_tpu.ops.normals import smallest_eigvec_sym3x3

        m = RNG.standard_normal((4096, 5, 3)).astype(np.float32)
        m[:2048, :, 2] *= 1e-2  # near-planar neighborhoods (small third eigenvalue)
        cov = np.einsum("bki,bkj->bij", m, m)
        v_an = np.asarray(smallest_eigvec_sym3x3(jnp.asarray(cov)))
        w, v = np.linalg.eigh(cov)
        v_ref = v[..., 0]
        dot = np.abs(np.sum(v_an * v_ref, axis=-1))
        # well-conditioned cases (simple smallest eigenvalue) must match tightly
        gap = (w[:, 1] - w[:, 0]) / np.maximum(w[:, 2], 1e-12)
        good = gap > 1e-3
        assert good.mean() > 0.95
        np.testing.assert_array_less(0.999, dot[good] + 1e-9)
        # every output is a unit vector regardless of conditioning
        np.testing.assert_allclose(np.linalg.norm(v_an, axis=-1), 1.0, atol=1e-3)

    def test_normals_analytic_vs_eigh_full(self):
        pts = RNG.standard_normal((2, 300, 3)).astype(np.float32)
        n_a = np.asarray(ops.estimate_pointcloud_normals(jnp.array(pts), 20))
        n_e = np.asarray(
            ops.estimate_pointcloud_normals(jnp.array(pts), 20, method="eigh")
        )
        dot = np.abs(np.sum(n_a * n_e, axis=-1))
        assert (dot > 0.999).mean() > 0.98


class TestGrouping:
    def test_sample_and_group_shapes(self):
        xyz = jnp.array(RNG.standard_normal((2, 128, 3)).astype(np.float32))
        feats = jnp.array(RNG.standard_normal((2, 128, 8)).astype(np.float32))
        fps_idx = ops.farthest_point_sample(xyz, 32)
        new_xyz, new_pts = ops.sample_and_group(32, 0.4, 16, xyz, feats, fps_idx)
        assert new_xyz.shape == (2, 32, 3)
        assert new_pts.shape == (2, 32, 16, 11)
        # grouped coords are recentered: center point itself appears as ~0 offset
        new_xyz2, new_pts2 = ops.sample_and_group(32, 100.0, 16, xyz, None, fps_idx)
        assert np.abs(np.asarray(new_pts2)).max() < 200.0


class TestFusedCachedSAInterpret:
    """CPU (Pallas interpret-mode) parity for the hot inference kernel
    (ops/sa_fused_pallas.py::sa_stage_fused_cached) against a plain-jnp reference —
    the on-hardware parity lives in tests/test_pallas_tpu.py; this covers the kernel's
    tiling/padding math (s_pad centers, per-tile 128-aligned index slices) on every
    CI run."""

    @staticmethod
    def _reference(g_rel, w_eff, feats, gidx, k1f, b1, w2, b2, w3, b3):
        h = jnp.einsum("mskd,mdc->mskc", g_rel, w_eff)
        if feats is not None:
            proj = jnp.einsum("mnd,dc->mnc", feats, k1f)  # [M, N2, C1]
            M = proj.shape[0]
            gathered = jax.vmap(lambda p, i: p[i])(proj, gidx)  # [M, S, K, C1]
            h = h + gathered
        h = jax.nn.relu(h + b1)
        h = jax.nn.relu(jnp.einsum("mskc,ce->mske", h, w2) + b2)
        h = jax.nn.relu(jnp.einsum("mskc,ce->mske", h, w3) + b3)
        return h.max(axis=2)

    def test_stage1_no_feats(self):
        from puzzlefusion_plusplus_tpu.ops.sa_fused_pallas import sa_stage_fused_cached

        M, S, K, C1, C2, C3 = 3, 16, 32, 8, 8, 16  # S < centers-per-tile -> s_pad path
        g = jnp.asarray(RNG.standard_normal((M, S, K, 3)).astype(np.float32))
        w_eff = jnp.asarray(RNG.standard_normal((M, 3, C1)).astype(np.float32))
        b1 = jnp.asarray(RNG.standard_normal(C1).astype(np.float32))
        w2 = jnp.asarray(RNG.standard_normal((C1, C2)).astype(np.float32))
        b2 = jnp.asarray(RNG.standard_normal(C2).astype(np.float32))
        w3 = jnp.asarray(RNG.standard_normal((C2, C3)).astype(np.float32))
        b3 = jnp.asarray(RNG.standard_normal(C3).astype(np.float32))
        out = sa_stage_fused_cached(g, w_eff, None, None, None, b1, w2, b2, w3, b3,
                                    interpret=True)
        ref = self._reference(g, w_eff, None, None, None, b1, w2, b2, w3, b3)
        assert out.shape == (M, S, C3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_stage2_with_feature_gather(self):
        from puzzlefusion_plusplus_tpu.ops.sa_fused_pallas import sa_stage_fused_cached

        M, S, K, N2, D, C1, C2, C3 = 2, 40, 32, 24, 8, 8, 8, 16
        g = jnp.asarray(RNG.standard_normal((M, S, K, 3)).astype(np.float32))
        w_eff = jnp.asarray(RNG.standard_normal((M, 3, C1)).astype(np.float32))
        feats = jnp.asarray(RNG.standard_normal((M, N2, D)).astype(np.float32))
        gidx = jnp.asarray(RNG.integers(0, N2, size=(M, S, K)).astype(np.int32))
        k1f = jnp.asarray(RNG.standard_normal((D, C1)).astype(np.float32))
        b1 = jnp.asarray(RNG.standard_normal(C1).astype(np.float32))
        w2 = jnp.asarray(RNG.standard_normal((C1, C2)).astype(np.float32))
        b2 = jnp.asarray(RNG.standard_normal(C2).astype(np.float32))
        w3 = jnp.asarray(RNG.standard_normal((C2, C3)).astype(np.float32))
        b3 = jnp.asarray(RNG.standard_normal(C3).astype(np.float32))
        out = sa_stage_fused_cached(g, w_eff, feats, gidx, k1f, b1, w2, b2, w3, b3,
                                    interpret=True)
        ref = self._reference(g, w_eff, feats, gidx, k1f, b1, w2, b2, w3, b3)
        assert out.shape == (M, S, C3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def _stage2_inputs(self, N2):
        M, S, K, D, C1, C2, C3 = 2, 40, 32, 8, 8, 8, 16
        g = jnp.asarray(RNG.standard_normal((M, S, K, 3)).astype(np.float32))
        w_eff = jnp.asarray(RNG.standard_normal((M, 3, C1)).astype(np.float32))
        feats = jnp.asarray(RNG.standard_normal((M, N2, D)).astype(np.float32))
        gidx = jnp.asarray(RNG.integers(0, N2, size=(M, S, K)).astype(np.int32))
        k1f = jnp.asarray(RNG.standard_normal((D, C1)).astype(np.float32))
        b1 = jnp.asarray(RNG.standard_normal(C1).astype(np.float32))
        w2 = jnp.asarray(RNG.standard_normal((C1, C2)).astype(np.float32))
        b2 = jnp.asarray(RNG.standard_normal(C2).astype(np.float32))
        w3 = jnp.asarray(RNG.standard_normal((C2, C3)).astype(np.float32))
        b3 = jnp.asarray(RNG.standard_normal(C3).astype(np.float32))
        return g, w_eff, feats, gidx, k1f, b1, w2, b2, w3, b3

    def test_stage2_dynamic_gather_matches_onehot_and_reference(self):
        """'dynamic' gather (chunked VPU take_along_axis, VERDICT r3 #4) must equal the
        onehot-matmul path and the plain-jnp reference (interpret mode is exact f32)."""
        from puzzlefusion_plusplus_tpu.ops.sa_fused_pallas import sa_stage_fused_cached

        args = self._stage2_inputs(N2=24)  # pads to N2p=128; rows=2048 -> 16 chunks
        out_dyn = sa_stage_fused_cached(*args, interpret=True, gather_impl="dynamic")
        out_oh = sa_stage_fused_cached(*args, interpret=True, gather_impl="onehot")
        np.testing.assert_array_equal(np.asarray(out_dyn), np.asarray(out_oh))
        ref = self._reference(*args)
        np.testing.assert_allclose(np.asarray(out_dyn), np.asarray(ref), atol=2e-4)

    def test_stage2_int8_gather_quantized_parity(self):
        """'int8' gather (quantized one-hot operands on the MXU int8 path — the second
        half of the named 18% follow-up, VERDICT r4 #6) must match the reference to 8-bit
        quantization tolerance, and stage-1 calls (no feature gather) must silently fall
        back to onehot."""
        from puzzlefusion_plusplus_tpu.ops.sa_fused_pallas import sa_stage_fused_cached

        args = self._stage2_inputs(N2=24)
        out_i8 = sa_stage_fused_cached(*args, interpret=True, gather_impl="int8")
        ref = self._reference(*args)
        # quantization error on the gathered projection is bounded by colmax/254 per
        # element; it propagates through relu+2 matmuls — tolerance scaled accordingly
        g, w_eff, feats, gidx, k1f = args[:5]
        proj = jnp.einsum("mnd,dc->mnc", feats, k1f)
        step = (jnp.max(jnp.abs(proj), axis=1) / 254.0).max()  # max half-ulp
        w2n = float(jnp.abs(args[6]).sum(axis=0).max())
        w3n = float(jnp.abs(args[8]).sum(axis=0).max())
        tol = float(step) * w2n * w3n + 2e-4
        np.testing.assert_allclose(np.asarray(out_i8), np.asarray(ref), atol=tol)
        err = np.abs(np.asarray(out_i8) - np.asarray(ref)).max()
        assert err > 0  # it IS quantized (guards against silently running f32)

        M, S, K, C1, C2, C3 = 3, 16, 32, 8, 8, 16
        g1 = jnp.asarray(RNG.standard_normal((M, S, K, 3)).astype(np.float32))
        w1 = jnp.asarray(RNG.standard_normal((M, 3, C1)).astype(np.float32))
        b1 = jnp.asarray(RNG.standard_normal(C1).astype(np.float32))
        w2 = jnp.asarray(RNG.standard_normal((C1, C2)).astype(np.float32))
        b2 = jnp.asarray(RNG.standard_normal(C2).astype(np.float32))
        w3 = jnp.asarray(RNG.standard_normal((C2, C3)).astype(np.float32))
        b3 = jnp.asarray(RNG.standard_normal(C3).astype(np.float32))
        out1 = sa_stage_fused_cached(g1, w1, None, None, None, b1, w2, b2, w3, b3,
                                     interpret=True, gather_impl="int8")
        ref1 = self._reference(g1, w1, None, None, None, b1, w2, b2, w3, b3)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=2e-4)

    def test_stage2_dynamic_gather_falls_back_when_table_does_not_tile(self):
        """N2p=384 does not divide rows=2048: the dispatcher silently uses onehot so every
        shape stays correct regardless of the requested impl."""
        from puzzlefusion_plusplus_tpu.ops.sa_fused_pallas import sa_stage_fused_cached

        args = self._stage2_inputs(N2=300)  # N2p=384
        out = sa_stage_fused_cached(*args, interpret=True, gather_impl="dynamic")
        ref = self._reference(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_ball_select_counting_matches_topk():
    """The MXU counting formulation of ball-query selection (grouping.py::
    _ball_select_counting, the TPU path) must be bit-identical to the top_k selection
    across hit densities, including zero-hit and all-hit rows."""
    from puzzlefusion_plusplus_tpu.ops.grouping import (
        _ball_select_counting,
        _ball_select_topk,
        square_distance,
    )

    rng = np.random.default_rng(3)
    for B, N, S, K, r in ((2, 333, 64, 16, 0.05), (1, 1000, 128, 32, 0.2),
                          (3, 64, 8, 8, 5.0)):
        x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.3)
        c = x[:, :S]
        in_ball = square_distance(c, x) <= r * r
        a = _ball_select_counting(in_ball, K)
        b = _ball_select_topk(in_ball, K)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMaskedPairwiseNNInterpret:
    """CPU interpret-mode parity for the masked pairwise-NN kernel
    (ops/chamfer_pallas.py::masked_pairwise_nn) that the engine's interpenetration filter
    uses on TPU — inactive pairs must hold a BIG sentinel, active pairs the exact NN
    distances, and vmap (the engine batches merge_geometry) must compose."""

    def _oracle(self, pts, mask):
        d = np.sum(
            (pts[:, None, :, None, :] - pts[None, :, None, :, :]) ** 2, axis=-1
        )  # [P, P, N, M]
        return d.min(-1), mask

    def test_parity_and_sentinel(self):
        from puzzlefusion_plusplus_tpu.ops.chamfer_pallas import masked_pairwise_nn

        rng = np.random.default_rng(5)
        P, N = 5, 300  # N not a tile multiple -> padding paths
        pts = (rng.normal(size=(P, N, 3)) * 0.3).astype(np.float32)
        mask = np.zeros((P, P), bool)
        mask[0, 1] = mask[1, 0] = mask[2, 4] = mask[4, 2] = True
        out = np.asarray(masked_pairwise_nn(jnp.asarray(pts), jnp.asarray(mask),
                                            interpret=True))
        nn, m = self._oracle(pts, mask)
        np.testing.assert_allclose(out[m], nn[m], atol=1e-4)
        assert (out[~m] >= 1e12).all()

    def test_vmap_composes(self):
        from puzzlefusion_plusplus_tpu.ops.chamfer_pallas import masked_pairwise_nn

        rng = np.random.default_rng(6)
        B, P, N = 2, 3, 256
        pts = (rng.normal(size=(B, P, N, 3)) * 0.3).astype(np.float32)
        mask = rng.random((B, P, P)) < 0.5
        mask &= ~np.eye(P, dtype=bool)[None]
        out = np.asarray(
            jax.vmap(lambda p, m: masked_pairwise_nn(p, m, interpret=True))(
                jnp.asarray(pts), jnp.asarray(mask)
            )
        )
        for b in range(B):
            nn, m = self._oracle(pts[b], mask[b])
            np.testing.assert_allclose(out[b][m], nn[m], atol=1e-4)
            assert (out[b][~m] >= 1e12).all()
