"""Native host-core parity tests (C++ via ctypes vs numpy/jax oracles)."""

import numpy as np
import pytest

from puzzlefusion_plusplus_tpu.utils import native


def test_native_builds():
    # the library must build in this image (g++ is part of the baked toolchain);
    # if unavailable the numpy fallbacks keep everything working, but flag it
    assert native.available(), "native core failed to build — check g++ in the image"


def test_nn_distance_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 257, 3)).astype(np.float32)
    y = rng.normal(size=(3, 119, 3)).astype(np.float32)
    d, i = native.nn_distance_cpu(x, y)
    dref = np.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(d, dref.min(-1), atol=1e-4)
    np.testing.assert_array_equal(i, dref.argmin(-1))


def test_fps_parity_with_jax():
    import jax.numpy as jnp

    from puzzlefusion_plusplus_tpu.ops.fps import farthest_point_sample_xla

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 300, 3)).astype(np.float32)
    mask = rng.random((2, 300)) > 0.25
    f = native.fps_cpu(x, 48, mask)
    fref = np.asarray(farthest_point_sample_xla(jnp.asarray(x), 48, jnp.asarray(mask)))
    np.testing.assert_array_equal(f, fref)


def test_augment_parity():
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(2)
    pcs = rng.normal(size=(5, 200, 3)).astype(np.float32)
    rots = R.random(5, random_state=rng).as_matrix().astype(np.float32)
    out, c, s = native.augment_parts_cpu(pcs, rots, normalize=True)
    ref_c = pcs.mean(1)
    ref = np.einsum("pij,pnj->pni", rots, pcs - ref_c[:, None])
    ref_s = np.abs(ref).reshape(5, -1).max(-1)
    np.testing.assert_allclose(c, ref_c, atol=1e-5)
    np.testing.assert_allclose(s, ref_s, atol=1e-5)
    np.testing.assert_allclose(out, ref / ref_s[:, None, None], atol=1e-5)


def test_dataset_uses_native_with_same_semantics(tmp_path):
    """The dataset's native-accelerated augmentation must keep the pose round-trip
    property: applying the emitted GT pose to the local cloud re-assembles the shape."""
    from scipy.spatial.transform import Rotation as R

    from puzzlefusion_plusplus_tpu.data import DenoiserDataset, generate_dataset

    root = str(tmp_path)
    generate_dataset(root, num_shapes=1, seed=3, split="train", min_parts=3, max_parts=3,
                     with_matching=False, with_verifier=False)
    ds = DenoiserDataset(root + "/pc_data/train", mode="train", multiple_ref_parts=False)
    it = ds.get(0, np.random.default_rng(0))
    P = int(it["num_parts"])
    ref = int(np.where(it["ref_part"][:P])[0][0])
    pc_ref = it["part_pcs"][ref] * it["part_scale"][ref]
    q = it["part_rots"][ref]
    posed = R.from_quat(q[[1, 2, 3, 0]]).apply(pc_ref) + it["part_trans"][ref]
    assert np.abs(posed.mean(0)).max() < 1e-4  # ref part recentered at origin
