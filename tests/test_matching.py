"""Matching subsystem tests: Sinkhorn, alignment solvers, piece-aware ops, model forward,
and a training step on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import jit_apply, jit_init

from puzzlefusion_plusplus_tpu.matching import ops as mops
from puzzlefusion_plusplus_tpu.matching.alignment import (
    global_alignment,
    ransac_transform,
    weighted_horn,
)
from puzzlefusion_plusplus_tpu.matching.sinkhorn import hungarian, sinkhorn_log


def random_rotation(rng):
    from scipy.spatial.transform import Rotation as R

    return R.random(random_state=rng).as_matrix()


def test_sinkhorn_doubly_stochastic_masked():
    rng = np.random.default_rng(0)
    s = rng.normal(size=(2, 8, 8)).astype(np.float32)
    n = jnp.asarray([5, 8])
    m = sinkhorn_log(jnp.asarray(s), n, n, max_iter=50, tau=0.2)
    m = np.asarray(m)
    # valid rows/cols sum to ~1; padded region exactly 0
    np.testing.assert_allclose(m[0, :5, :5].sum(1), 1.0, atol=1e-3)
    np.testing.assert_allclose(m[1].sum(0), 1.0, atol=1e-3)
    assert m[0, 5:].sum() == 0 and m[0, :, 5:].sum() == 0


def test_hungarian_matches_argmax_on_permutation():
    rng = np.random.default_rng(1)
    perm = rng.permutation(6)
    scores = np.full((1, 6, 6), -1.0, np.float32)
    scores[0, np.arange(6), perm] = 1.0
    out = np.asarray(hungarian(jnp.asarray(scores), jnp.asarray([6]), jnp.asarray([6])))
    assert (np.argmax(out[0], axis=1) == perm).all()


def test_weighted_horn_recovers_rigid_transform():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(50, 3))
    R_gt = random_rotation(rng)
    t_gt = rng.normal(size=3)
    tgt = src @ R_gt.T + t_gt
    r, t = weighted_horn(jnp.asarray(src), jnp.asarray(tgt), jnp.ones(50))
    np.testing.assert_allclose(np.asarray(r), R_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-5)


def test_weighted_horn_ignores_zero_weight_outliers():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(30, 3))
    R_gt = random_rotation(rng)
    tgt = src @ R_gt.T
    tgt_noisy = tgt.copy()
    tgt_noisy[:5] += 100.0  # gross outliers with zero weight
    w = np.ones(30)
    w[:5] = 0
    r, _ = weighted_horn(jnp.asarray(src), jnp.asarray(tgt_noisy), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r), R_gt, atol=1e-5)


def test_ransac_transform_with_outliers():
    rng = np.random.default_rng(4)
    src = rng.normal(size=(64, 3)).astype(np.float32)
    R_gt = random_rotation(rng).astype(np.float32)
    t_gt = rng.normal(size=3).astype(np.float32)
    tgt = src @ R_gt.T + t_gt
    tgt[::4] += rng.normal(size=(16, 3)) * 5  # 25% outliers
    r, t = ransac_transform(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(64, bool), jax.random.key(0)
    )
    np.testing.assert_allclose(np.asarray(r), R_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)


@pytest.mark.parametrize("method", ["mst", "chordal"])
def test_global_alignment_roundtrip(method):
    """Chain of known relative transforms -> recovered global poses match (up to gauge)."""
    rng = np.random.default_rng(5)
    n = 5
    globals_gt = [np.eye(4)]
    for _ in range(n - 1):
        m = np.eye(4)
        m[:3, :3] = random_rotation(rng)
        m[:3, 3] = rng.normal(size=3)
        globals_gt.append(m)
    globals_gt = np.stack(globals_gt)
    edges, rels = [], []
    for a in range(n):
        for b in range(a + 1, n):
            # T_ab maps b into a's frame: global_b = global_a @ T_ab
            edges.append([a, b])
            rels.append(np.linalg.inv(globals_gt[a]) @ globals_gt[b])
    out = global_alignment(n, np.asarray(edges), np.stack(rels), np.ones(len(edges)),
                           method=method)
    # gauge-fix to node 0 and compare
    fix = globals_gt[0] @ np.linalg.inv(out[0])
    out = fix[None] @ out
    np.testing.assert_allclose(out, globals_gt, atol=1e-4)


def test_piece_ids_and_masks():
    n_pcs = jnp.asarray([[3, 2, 0]])
    pid = mops.piece_ids(n_pcs, 7)
    # the padded tail after a zero-size piece counts past every cumsum -> id P (= 3)
    np.testing.assert_array_equal(np.asarray(pid)[0], [0, 0, 0, 1, 1, 3, 3])
    valid = mops.valid_point_mask(pid, jnp.asarray([2]))
    np.testing.assert_array_equal(np.asarray(valid)[0], [1, 1, 1, 1, 1, 0, 0])
    cross = mops.diagonal_square_mask(pid, jnp.asarray([2]))
    c = np.asarray(cross)[0]
    assert c[0, 3] and not c[0, 1] and not c[0, 5] and not c[0, 0]


def test_fracture_point_labels():
    # two pieces: points 0/1 near each other across pieces, point 2 far
    gt = jnp.asarray([[[0, 0, 0], [0.01, 0, 0], [5, 5, 5], [0, 0, 0.01]]], jnp.float32)
    n_pcs = jnp.asarray([[2, 2]])
    pid = mops.piece_ids(n_pcs, 4)
    labels = mops.fracture_point_labels(gt, pid, jnp.asarray([2]),
                                        jnp.full((1, 4), 0.025))
    np.testing.assert_array_equal(np.asarray(labels)[0], [1, 1, 0, 1])


def test_knn_piece_aware_stays_in_piece():
    rng = np.random.default_rng(6)
    xyz = jnp.asarray(rng.normal(size=(1, 20, 3)).astype(np.float32))
    pid = mops.piece_ids(jnp.asarray([[10, 10]]), 20)
    _, idx = mops.knn_piece_aware(xyz, pid, 4)
    idx = np.asarray(idx)[0]
    assert (idx[:10] < 10).all() and (idx[10:] >= 10).all()


@pytest.fixture(scope="module")
def tiny_jigsaw():
    from puzzlefusion_plusplus_tpu.matching.model import JigsawModel

    model = JigsawModel(pc_feat_dim=32, aff_feat_dim=16, sa_npoints=(32, 16, 8, 4),
                        tf_num_samples=8)
    return model


def test_jigsaw_model_forward(tiny_jigsaw):
    rng = np.random.default_rng(7)
    B, N = 1, 128
    pcs = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    n_pcs = jnp.asarray([[64, 64, 0]])
    pid = mops.piece_ids(n_pcs, N)
    n_valid = jnp.asarray([2])
    labels = jnp.asarray((rng.random((B, N)) < 0.3).astype(np.int32))
    variables = jit_init(tiny_jigsaw, jax.random.key(0), pcs, pid, n_valid, labels,
                         train=False, compute_matching=True)
    out = jit_apply(tiny_jigsaw, variables, pcs, pid, n_valid, labels, train=False,
                    compute_matching=True)
    assert out["cls_logits"].shape == (B, N)
    assert out["ds_mat"].shape == (B, N, N)
    m = np.asarray(out["ds_mat"])
    assert np.isfinite(m).all()
    nc = int(np.asarray(out["n_critical_sum"])[0])
    assert m[0, nc:].sum() == 0  # padded critical slots empty


def test_jigsaw_model_multiclass_head():
    """Multi-class formulation (joint_seg_align_model.py:81-89,170-175): log-softmax logits
    [B, N, K], argmax prediction, rows sum to 1 in prob space."""
    from puzzlefusion_plusplus_tpu.matching.model import JigsawModel

    model = JigsawModel(pc_feat_dim=32, aff_feat_dim=16, sa_npoints=(32, 16, 8, 4),
                        tf_num_samples=8, cls_method="multi", num_classes=2)
    rng = np.random.default_rng(8)
    B, N = 1, 128
    pcs = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    pid = mops.piece_ids(jnp.asarray([[64, 64, 0]]), N)
    n_valid = jnp.asarray([2])
    labels = jnp.asarray((rng.random((B, N)) < 0.3).astype(np.int32))
    variables = jit_init(model, jax.random.key(0), pcs, pid, n_valid, labels,
                         train=False, compute_matching=True)
    out = jit_apply(model, variables, pcs, pid, n_valid, labels, train=False,
                    compute_matching=True)
    assert out["cls_logits"].shape == (B, N, 2)
    probs = np.exp(np.asarray(out["cls_logits"]))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert set(np.unique(np.asarray(out["cls_pred"]))) <= {0, 1}

    # NLL loss variant runs and is finite through the train-step loss
    from puzzlefusion_plusplus_tpu.matching.train import loss_fn

    batch = {
        "part_pcs": pcs, "gt_pcs": pcs, "piece_id": pid,
        "part_valids": jnp.asarray([[1.0, 1.0, 0.0]]),
        "critical_label_thresholds": jnp.full((B, N), 0.025),
    }
    total, (metrics, *_) = loss_fn(
        variables["params"], variables.get("batch_stats", {}), model, batch,
        0.0, 0.0, False, jax.random.key(1),
    )
    assert np.isfinite(float(total))
    assert np.isfinite(float(metrics["cls_loss"]))


def test_cls_pos_weight_reweights_bce(tiny_jigsaw):
    """cls_pos_weight=1 is exact reference BCE parity; >1 shifts the loss toward the
    positive (fracture-point) terms — an all-negative predictor gets strictly worse."""
    from puzzlefusion_plusplus_tpu.matching.train import loss_fn

    rng = np.random.default_rng(3)
    B, N = 1, 128
    pcs = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    pid = mops.piece_ids(jnp.asarray([[64, 64, 0]]), N)
    variables = jit_init(tiny_jigsaw, jax.random.key(2), pcs, pid, jnp.asarray([2]),
                         jnp.zeros((B, N), jnp.int32), train=False, compute_matching=True)
    # bias the cls head strongly negative: every point predicted non-critical
    params = jax.tree.map(jnp.asarray, variables["params"])
    params["cls_head"]["bias"] = params["cls_head"]["bias"] - 10.0
    batch = {
        "part_pcs": pcs, "gt_pcs": pcs, "piece_id": pid,
        "part_valids": jnp.asarray([[1.0, 1.0, 0.0]]),
        "critical_label_thresholds": jnp.full((B, N), 0.2),
    }
    args = (variables.get("batch_stats", {}), tiny_jigsaw, batch, 0.0, 0.0, False,
            jax.random.key(1))
    _, (m1, *_) = loss_fn(params, *args)  # default weight
    _, (m1b, *_) = loss_fn(params, *args, cls_pos_weight=1.0)
    np.testing.assert_allclose(float(m1["cls_loss"]), float(m1b["cls_loss"]))
    _, (m4, *_) = loss_fn(params, *args, cls_pos_weight=4.0)
    assert float(m4["cls_loss"]) > float(m1["cls_loss"])


def test_matching_training_step(tmp_path):
    from puzzlefusion_plusplus_tpu.data import generate_dataset
    from puzzlefusion_plusplus_tpu.matching.train import make_model, train_matching

    root = str(tmp_path)
    generate_dataset(root, num_shapes=2, seed=0, split="train", min_parts=2, max_parts=3,
                     with_matching=False, with_verifier=False)
    model = make_model(pc_feat_dim=32, aff_feat_dim=16, sa_npoints=(32, 16, 8, 4))
    state = train_matching(
        root + "/pc_data/train", out_dir=root + "/out", epochs=1, batch_size=1,
        num_points=160, mat_epoch=0, rig_epoch=0, max_steps=2, model=model,
        max_num_part=4,
    )
    assert int(state.step) == 2


def test_horn_numpy_matches_weighted_horn():
    """The host Kabsch used by offline RANSAC (matching/generate.py::_horn_numpy) must
    agree with the jax weighted_horn solver on weighted problems."""
    from puzzlefusion_plusplus_tpu.matching.generate import _horn_numpy
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(11)
    src = rng.normal(size=(64, 3))
    r_true = R.from_rotvec(rng.normal(size=3)).as_matrix()
    tgt = src @ r_true.T + np.array([0.3, -0.1, 0.2])
    w = rng.uniform(0.1, 1.0, size=64)
    r_np, t_np = _horn_numpy(src, tgt, w)
    r_jx, t_jx = weighted_horn(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    np.testing.assert_allclose(r_np, np.asarray(r_jx), atol=1e-5)
    np.testing.assert_allclose(t_np, np.asarray(t_jx), atol=1e-5)
    np.testing.assert_allclose(r_np, r_true, atol=1e-6)


def test_rigid_loss_pairs_matches_dense_reference():
    """The factored rigid loss (no per-pair [Nc, Nc] matrices) must reproduce the dense
    per-pair formulation it replaced (round-2 review: the dense form vmapped to
    [190, 5000, 5000] and OOMed at reference scale)."""
    from puzzlefusion_plusplus_tpu.matching.model import rigid_loss_pairs

    rng = np.random.default_rng(5)
    B, Nc, P = 2, 48, 4
    ds_mat = jnp.asarray(jax.nn.softmax(rng.normal(size=(B, Nc, Nc)), axis=-1))
    pts = jnp.asarray(rng.normal(size=(B, Nc, 3)), jnp.float32)
    pid = jnp.asarray(rng.integers(0, P, size=(B, Nc)))
    slot = jnp.asarray(rng.uniform(size=(B, Nc)) < 0.8)

    def dense(ds_mat, pts, pid, slot):  # the pre-refactor formulation
        from puzzlefusion_plusplus_tpu.matching.alignment import weighted_horn as wh
        total, count = 0.0, 0.0
        for b in range(B):
            for i in range(P):
                for j in range(i + 1, P):
                    src_m = np.asarray((pid[b] == i) & slot[b])
                    tgt_m = np.asarray((pid[b] == j) & slot[b])
                    m = (np.asarray(ds_mat[b]) * src_m[:, None] * tgt_m[None, :]
                         + (np.asarray(ds_mat[b]) * tgt_m[:, None] * src_m[None, :]).T)
                    w_row = m.sum(1)
                    tgt_soft = m @ np.asarray(pts[b])
                    denom = np.maximum(w_row[:, None], 1e-9)
                    r, t = wh(pts[b], jnp.asarray(tgt_soft / denom), jnp.asarray(w_row))
                    aligned = (np.asarray(pts[b]) @ np.asarray(r).T + np.asarray(t)) * w_row[:, None]
                    resid = ((aligned - tgt_soft) ** 2).sum()
                    total += resid * m.sum()
                    count += max(src_m.sum(), 1) * (m.sum() > 0)
        return total / max(count, 1.0)

    got = float(rigid_loss_pairs(ds_mat, pts, pid, slot, P))
    want = dense(ds_mat, pts, pid, slot)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_matching_val_topk_retention(tmp_path):
    """val_data_dir wires Hungarian-F1 validation + top-k retention on mat_f1 (reference
    ModelCheckpoint top-10 on val/mat_f1, train_matching.py:41-49) and auto-resume."""
    import os

    from puzzlefusion_plusplus_tpu.data import generate_dataset
    from puzzlefusion_plusplus_tpu.matching.train import make_model, train_matching

    root = str(tmp_path)
    generate_dataset(root, num_shapes=2, seed=0, split="train", min_parts=2, max_parts=3,
                     with_matching=False, with_verifier=False)
    generate_dataset(root, num_shapes=1, seed=1, split="val", min_parts=2, max_parts=3,
                     with_matching=False, with_verifier=False)
    model = make_model(pc_feat_dim=32, aff_feat_dim=16, sa_npoints=(32, 16, 8, 4))
    kw = dict(out_dir=root + "/out", batch_size=1, num_points=160, mat_epoch=0,
              rig_epoch=99, model=model, max_num_part=4,
              val_data_dir=root + "/pc_data/val", val_every=1)
    state = train_matching(root + "/pc_data/train", epochs=1, **kw)
    ckpt = root + "/out/ckpt"
    assert os.path.exists(os.path.join(ckpt, "topk.json"))
    steps1 = {d for d in os.listdir(ckpt) if d.startswith("step_")}
    assert steps1
    # resume: second call continues the step counter instead of re-training epoch 0
    state2 = train_matching(root + "/pc_data/train", epochs=2, **kw)
    assert int(state2.step) > int(state.step)
    steps2 = {d for d in os.listdir(ckpt) if d.startswith("step_")}
    assert steps1 <= steps2 or len(steps2) >= len(steps1)  # no silent overwrite of retained


def test_oracle_f1_mutual_pairs_is_one():
    """Perfectly mutual NN pairs across two pieces -> the Hungarian oracle hits every
    argmin row: ceiling 1.0 (matching/oracle.py)."""
    from puzzlefusion_plusplus_tpu.matching.oracle import oracle_f1_single

    k = 5
    p0 = np.stack([np.zeros(k), np.arange(k, dtype=np.float64), np.zeros(k)], -1)
    p1 = p0 + np.array([0.01, 0.0, 0.0])  # each point's cross-NN is its twin
    gt = np.concatenate([p0, p1]).astype(np.float32)
    pid = np.concatenate([np.zeros(k, np.int32), np.ones(k, np.int32)])
    out = oracle_f1_single(gt, pid, threshold=0.025)
    assert out["n_crit"] == 2 * k
    assert out["mutual_nn_frac"] == 1.0
    assert out["oracle_f1"] == 1.0


def test_oracle_f1_non_mutual_below_one():
    """Two piece-1 points share the same piece-0 argmin -> the GT 'permutation' is not
    one-to-one and no assignment can reach F1 1. Expected value by brute force: rows
    {p0->q_near (mutual), q_near->p0, q_far->p0}; the one-to-one oracle satisfies at most
    2 of 3 rows -> 2/3."""
    from puzzlefusion_plusplus_tpu.matching.oracle import oracle_f1_single

    p0 = np.array([[0.0, 0.0, 0.0]])
    q = np.array([[0.01, 0.0, 0.0], [0.012, 0.0, 0.0]])  # both NN -> p0
    gt = np.concatenate([p0, q]).astype(np.float32)
    pid = np.array([0, 1, 1], np.int32)
    out = oracle_f1_single(gt, pid, threshold=0.05)
    assert out["n_crit"] == 3
    assert out["mutual_nn_frac"] == pytest.approx(2.0 / 3.0)
    assert out["oracle_f1"] == pytest.approx(2.0 / 3.0)


def test_oracle_stats_on_synthetic_dir(tmp_path):
    from puzzlefusion_plusplus_tpu.data import generate_dataset
    from puzzlefusion_plusplus_tpu.matching.oracle import oracle_matching_stats

    root = str(tmp_path)
    generate_dataset(root, num_shapes=2, seed=0, split="train", min_parts=2, max_parts=3,
                     n_points=400)
    stats = oracle_matching_stats(root + "/pc_data/train", num_points=300, num_shapes=2)
    assert 0.0 < stats["oracle_f1"] <= 1.0
    assert 0.0 < stats["mutual_nn_frac"] <= 1.0
    assert stats["num_shapes"] == 2


def test_oracle_assignment_ceiling_bounds_oracle():
    """distinct(gt_nn)/n upper-bounds the distance-oracle; both 1.0 when mutual, 2/3 in
    the collision case above."""
    from puzzlefusion_plusplus_tpu.matching.oracle import oracle_f1_single

    p0 = np.array([[0.0, 0.0, 0.0]])
    q = np.array([[0.01, 0.0, 0.0], [0.012, 0.0, 0.0]])
    gt = np.concatenate([p0, q]).astype(np.float32)
    pid = np.array([0, 1, 1], np.int32)
    out = oracle_f1_single(gt, pid, threshold=0.05)
    assert out["assignment_ceiling"] == pytest.approx(2.0 / 3.0)
    assert out["oracle_f1"] <= out["assignment_ceiling"] + 1e-9


def test_pca_canonicalize_rotation_and_translation_invariant():
    """Per-piece sign-disambiguated PCA frames (matching/ops.py::pca_canonicalize): the
    canonical coordinates must be identical whatever SE(3) pose each piece arrives in
    (distinct eigenvalues + nonzero per-axis skew guaranteed by the exponential cloud)."""
    rng = np.random.default_rng(3)
    B, N, P = 2, 96, 4
    n_pcs = jnp.asarray([[48, 48, 0, 0], [32, 32, 32, 0]])
    pid = mops.piece_ids(n_pcs, N)
    n_valid = jnp.asarray([2, 3])
    valid = mops.valid_point_mask(pid, n_valid)
    # skewed, anisotropic pieces: exp samples scaled per axis
    pts = (rng.exponential(size=(B, N, 3)) * np.array([3.0, 2.0, 1.0])).astype(np.float32)

    def repose(x):
        out = np.array(x)
        for b in range(B):
            for p in range(int(n_valid[b])):
                m = np.asarray(pid[b]) == p
                R = random_rotation(rng)
                t = rng.normal(size=3) * 5
                out[b, m] = out[b, m] @ R.T + t
        return out

    canon_a = mops.pca_canonicalize(jnp.asarray(repose(pts)), pid, valid, P)
    canon_b = mops.pca_canonicalize(jnp.asarray(repose(pts)), pid, valid, P)
    np.testing.assert_allclose(np.asarray(canon_a), np.asarray(canon_b), atol=2e-4)
    # canonical frames are zero-mean per piece and padded pieces map to zero
    for b in range(B):
        for p in range(int(n_valid[b])):
            m = np.asarray(pid[b]) == p
            np.testing.assert_allclose(np.asarray(canon_a)[b, m].mean(0), 0.0, atol=1e-5)


def test_jigsaw_model_canonicalize_flag_invariant_forward():
    """With canonicalize_inputs=True the model's cls logits and affinity matrix must be
    invariant to per-piece re-posing of the input cloud (eval mode, same labels)."""
    from puzzlefusion_plusplus_tpu.matching.model import JigsawModel

    rng = np.random.default_rng(11)
    model = JigsawModel(pc_feat_dim=32, aff_feat_dim=16, sa_npoints=(32, 16, 8, 4),
                        tf_num_samples=8, canonicalize_inputs=True, max_num_part=3)
    B, N = 1, 128
    n_pcs = jnp.asarray([[64, 64, 0]])
    pid = mops.piece_ids(n_pcs, N)
    n_valid = jnp.asarray([2])
    labels = jnp.asarray((rng.random((B, N)) < 0.3).astype(np.int32))
    base = (rng.exponential(size=(B, N, 3)) * np.array([3.0, 2.0, 1.0])).astype(np.float32)

    def repose(x):
        out = np.array(x)
        for p in range(2):
            m = np.asarray(pid[0]) == p
            out[0, m] = out[0, m] @ random_rotation(rng).T + rng.normal(size=3)
        return jnp.asarray(out)

    pcs_a, pcs_b = repose(base), repose(base)
    variables = jit_init(model, jax.random.key(0), pcs_a, pid, n_valid, labels,
                         train=False, compute_matching=True)
    out_a = jit_apply(model, variables, pcs_a, pid, n_valid, labels, train=False,
                      compute_matching=True)
    out_b = jit_apply(model, variables, pcs_b, pid, n_valid, labels, train=False,
                      compute_matching=True)
    np.testing.assert_allclose(np.asarray(out_a["cls_logits"]),
                               np.asarray(out_b["cls_logits"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_a["ds_mat"]),
                               np.asarray(out_b["ds_mat"]), atol=2e-3)
