"""Data pipeline tests: synthetic generator schemas, dataset readers, augmentation invariants."""

import numpy as np
import pytest

from puzzlefusion_plusplus_tpu.data import (
    DenoiserDataset,
    Loader,
    VerifierDataset,
    VQVAEDataset,
    generate_dataset,
)
from puzzlefusion_plusplus_tpu.data.synthetic import cd_histogram, fracture_shape


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    generate_dataset(root, num_shapes=4, seed=0, split="train")
    generate_dataset(root, num_shapes=3, seed=1, split="val")
    return root


def test_fracture_shape_structure():
    rng = np.random.default_rng(0)
    s = fracture_shape(rng, num_parts=5)
    assert s["part_pcs_gt"].shape == (5, 1000, 3)
    assert s["graph"].shape == (5, 5)
    assert np.array_equal(s["graph"], s["graph"].T) and not s["graph"].diagonal().any()
    # fracture graph of a Voronoi partition must be connected
    reach = np.linalg.matrix_power(s["graph"].astype(int) + np.eye(5, dtype=int), 5)
    assert (reach > 0).all()
    assert s["ref_part"].sum() == 1


def test_cd_histogram_semantics():
    src = np.zeros((10, 3))
    tgt = np.zeros((10, 3))
    h = cd_histogram(src, tgt)  # all distances exactly 0 -> left edge is bin 0, dropped
    assert h.sum() == 0
    tgt2 = tgt + 1e-3  # squared dist 3e-6 per direction, summed 6e-6 -> bin (1e-3, 5e-3]? no:
    h2 = cd_histogram(src, tgt2)  # 6e-6 falls in (0, 1e-3] -> first kept bin
    assert h2[0] == 10 and h2[1:].sum() == 0
    far = tgt + 100.0
    assert cd_histogram(src, far).sum() == 0  # beyond last edge -> dropped


def test_vqvae_dataset(data_root):
    ds = VQVAEDataset(data_root + "/pc_data/train")
    rng = np.random.default_rng(0)
    it = ds.get(0, rng)
    P = int(it["num_parts"])
    assert it["part_pcs"].shape == (20, 1000, 3)
    # normalized to [-1, 1] with max-abs exactly 1 per shape... per part
    for i in range(P):
        assert np.abs(it["part_pcs"][i]).max() == pytest.approx(1.0, abs=1e-5)
    assert np.abs(it["part_pcs"][P:]).max() == 0  # padded parts zero


def test_denoiser_dataset_pose_roundtrip(data_root):
    ds = DenoiserDataset(data_root + "/pc_data/train", mode="train", multiple_ref_parts=False)
    rng = np.random.default_rng(0)
    it = ds.get(0, rng)
    P = int(it["num_parts"])
    from scipy.spatial.transform import Rotation as R

    # applying the GT pose to the scaled local cloud must re-assemble the rotated shape:
    # per-part point sets posed by (trans, quat) should tile the recentred whole
    posed = []
    for i in range(P):
        pc = it["part_pcs"][i] * it["part_scale"][i]
        q = it["part_rots"][i]
        rot = R.from_quat(q[[1, 2, 3, 0]])
        posed.append(rot.apply(pc) + it["part_trans"][i])
    posed = np.concatenate(posed)
    # reference part sits at origin
    ref = int(np.where(it["ref_part"][:P])[0][0])
    pc_ref = it["part_pcs"][ref] * it["part_scale"][ref]
    q = it["part_rots"][ref]
    center = (R.from_quat(q[[1, 2, 3, 0]]).apply(pc_ref) + it["part_trans"][ref]).mean(0)
    assert np.abs(center).max() < 1e-4
    # shape stays within the original bounding scale
    assert np.abs(posed).max() < 2.0


def test_denoiser_test_mode_dense_matching(data_root):
    ds = DenoiserDataset(
        data_root + "/pc_data/val", mode="test",
        matching_data_path=data_root + "/matching_data",
    )
    assert len(ds) > 0
    rng = np.random.default_rng(0)
    it = ds.get(0, rng)
    P = int(it["num_parts"])
    E = int(it["match_edge_valid"].sum())
    assert E > 0
    # corr indices stay within each part's area point count
    for e in range(E):
        b, a = it["match_edges"][e]
        k = it["corr_count"][e]
        assert (it["corr_src"][e, :k] < it["n_area"][a]).all()
        assert (it["corr_tgt"][e, :k] < it["n_area"][b]).all()
    # at GT pose, matched points must be close: pose area points by GT and measure
    from scipy.spatial.transform import Rotation as R

    world = np.zeros_like(it["area_pts"])
    for i in range(P):
        n = it["n_area"][i]
        rot = R.from_quat(it["part_rots"][i][[1, 2, 3, 0]])
        world[i, :n] = rot.apply(it["area_pts"][i, :n]) + it["part_trans"][i]
    e = 0
    b, a = it["match_edges"][e]
    k = it["corr_count"][e]
    src = world[a][it["corr_src"][e, :k]]
    tgt = world[b][it["corr_tgt"][e, :k]]
    assert np.linalg.norm(src - tgt, axis=-1).mean() < 0.06


def test_verifier_dataset(data_root):
    ds = VerifierDataset(data_root + "/verifier_data", mode="train")
    rng = np.random.default_rng(0)
    it = ds.get(0, rng)
    assert it["edge_features"].shape == (190, 7)
    ne = int(it["num_edges"])
    rows = it["edge_features"][:ne]
    nonzero = rows[:, 6] > 0
    assert np.allclose(rows[nonzero, :6].sum(1), 1.0, atol=1e-5)  # row-normalized histograms


def test_loader_determinism_and_shapes(data_root):
    ds = VQVAEDataset(data_root + "/pc_data/train")
    l1 = Loader(ds, batch_size=2, seed=7)
    l2 = Loader(ds, batch_size=2, seed=7)
    b1, b2 = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(b1["part_pcs"], b2["part_pcs"])
    assert b1["part_pcs"].shape == (2, 20, 1000, 3)


def test_loader_custom_order(data_root):
    """Custom serving order (part-count-sorted bucketing, run_inference)."""
    ds = VQVAEDataset(data_root + "/pc_data/train")
    n = len(ds)
    order = np.arange(n)[::-1].copy()
    l_fwd = Loader(ds, batch_size=1, shuffle=False, drop_last=False)
    l_rev = Loader(ds, batch_size=1, shuffle=False, drop_last=False, order=order)
    fwd = [b["data_id"][0] for b in l_fwd]
    rev = [b["data_id"][0] for b in l_rev]
    assert rev == fwd[::-1]
    # shuffle permutes WITHIN the custom order's index set (dropping index 0 here)
    l_shuf = Loader(ds, batch_size=1, shuffle=True, drop_last=False, order=order[: n - 1])
    seen = sorted(b["data_id"][0] for b in l_shuf)
    assert seen == sorted(fwd[1:])


def test_matching_npz_kdtree_equals_bruteforce():
    """make_matching_data_npz's cKDTree NN queries must reproduce the dense-distance
    semantics: critical = any adjacent-fragment NN distance < threshold; correspondences =
    NN pairs across critical sets under the same threshold."""
    from puzzlefusion_plusplus_tpu.data.synthetic import make_matching_data_npz

    rng = np.random.default_rng(3)
    s = fracture_shape(rng, num_parts=4)
    m = make_matching_data_npz(s, np.random.default_rng(5))

    # brute-force recomputation of the critical sets from the saved area clouds
    n_pcs = m["n_pcs"]
    offs = np.concatenate([[0], np.cumsum(n_pcs)])
    parts = [m["gt_pcs"][offs[i] : offs[i + 1]] for i in range(len(n_pcs))]
    thr = 0.04
    for i in range(len(parts)):
        near = np.zeros(len(parts[i]), dtype=bool)
        for j in range(len(parts)):
            if i == j or not s["graph"][i, j]:
                continue
            d = np.linalg.norm(parts[i][:, None, :] - parts[j][None], axis=-1).min(axis=1)
            near |= d < thr
        expect = np.where(near)[0]
        got = m["critical_pcs_idx"][offs[i] : offs[i] + m["n_critical_pcs"][i]]
        np.testing.assert_array_equal(np.sort(got), expect)

    # every correspondence pair must be within threshold; in the originally-computed
    # direction (e1 < e0, the first of the two stored orientations) the target must also
    # be the true nearest neighbor of its source
    def crit(p):
        return parts[p][m["critical_pcs_idx"][offs[p] : offs[p] + m["n_critical_pcs"][p]]]

    assert len(m["edges"]) > 0
    for (e0, e1), pair in zip(m["edges"], m["correspondence"]):
        # pair[:, 0] indexes e1's critical set, pair[:, 1] indexes e0's (synthetic.py:197-203)
        src_set, tgt_set = crit(e1), crit(e0)
        for a, b in pair:
            d = np.linalg.norm(src_set[a] - tgt_set, axis=-1)
            assert d[b] < thr
            if e1 < e0:
                assert d[b] <= d.min() + 1e-12


class _StubDS:
    """Minimal loader-compatible dataset: item i is {'data_id': i}."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get(self, i, rng):
        return {"data_id": np.int64(i)}


def test_loader_len_respects_custom_order():
    ds = _StubDS(10)
    l = Loader(ds, batch_size=2, shuffle=False, drop_last=True, order=np.arange(7))
    assert len(l) == 3 == sum(1 for _ in l)


@pytest.mark.parametrize("bucketed", [False, True])
def test_loader_multihost_equal_counts_and_disjoint(bucketed):
    """SPMD contract: every host steps the same number of times per epoch and hosts serve
    disjoint samples — including bucket/sample distributions where per-host sample striding
    would give hosts different batch counts."""
    n = 23
    ds = _StubDS(n)
    # lopsided buckets: sizes 13 and 10 with batch_size 4 -> 3 + 2 = 5 global batches
    key = (np.arange(n) < 13).astype(np.int64) if bucketed else None
    loaders = [
        Loader(ds, batch_size=4, shuffle=True, drop_last=True, seed=7,
               process_index=p, process_count=2, bucket_key=key)
        for p in range(2)
    ]
    per_host = [list(l) for l in loaders]
    assert len(per_host[0]) == len(per_host[1]) == len(loaders[0])
    seen = [int(x) for batches in per_host for b in batches for x in b["data_id"]]
    assert len(seen) == len(set(seen))  # disjoint across hosts
    if bucketed:
        for batches in per_host:
            for b in batches:  # batches never cross buckets
                assert len(set(key[b["data_id"]])) == 1


def test_prefetch_batches_matches_plain_iteration(tmp_path):
    """prefetch_batches must preserve batch order/content exactly (single producer thread
    drives the same iterator, so the shared loader rng sequence is unchanged), propagate
    producer exceptions, and survive early consumer exit without deadlocking."""
    from puzzlefusion_plusplus_tpu.data import generate_dataset
    from puzzlefusion_plusplus_tpu.data.datasets import VQVAEDataset
    from puzzlefusion_plusplus_tpu.data.loader import Loader, prefetch_batches

    root = str(tmp_path)
    generate_dataset(root, num_shapes=6, seed=2, split="train", min_parts=2, max_parts=3,
                     n_points=64, with_matching=False, with_verifier=False)
    ds = VQVAEDataset(root + "/pc_data/train", max_num_part=4)

    plain = list(Loader(ds, 2, seed=5))
    pref = list(prefetch_batches(Loader(ds, 2, seed=5), depth=2))
    assert len(plain) == len(pref)
    for a, b in zip(plain, pref):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    # early exit: take one batch and leave; the producer must stop (no deadlock on exit)
    gen = prefetch_batches(Loader(ds, 2, seed=5), depth=1)
    next(gen)
    gen.close()

    # producer exception propagates to the consumer
    def boom():
        yield {"x": np.zeros(1)}
        raise RuntimeError("producer failed")

    it = prefetch_batches(boom(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_prefetch_batches_slow_consumer_terminates():
    """Regression: with a consumer slower than the producer the queue is full when the
    producer exhausts; the end-of-iteration sentinel must still reach the consumer (a
    put_nowait there silently dropped it and every epoch end deadlocked in q.get())."""
    import threading
    import time

    from puzzlefusion_plusplus_tpu.data.loader import prefetch_batches

    got: list[int] = []

    def consume():
        for item in prefetch_batches(iter(range(6)), depth=1):
            time.sleep(0.05)  # queue is full by the time the producer finishes
            got.append(item)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "prefetch_batches deadlocked at producer exhaustion"
    assert got == list(range(6))

    # same shape for the error path: exception raised while the queue is full
    def boom_fast():
        yield 0
        yield 1
        raise RuntimeError("late producer failure")

    out: list[object] = []

    def consume_err():
        try:
            for item in prefetch_batches(boom_fast(), depth=1):
                time.sleep(0.05)
                out.append(item)
        except RuntimeError as e:
            out.append(str(e))

    t2 = threading.Thread(target=consume_err, daemon=True)
    t2.start()
    t2.join(timeout=30)
    assert not t2.is_alive(), "prefetch_batches deadlocked on late producer failure"
    assert out == [0, 1, "late producer failure"]
