"""Dataset readers over the pc_data / matching_data / verifier_data .npz schemas.

Augmentation semantics match the reference exactly (scipy ``Rotation.random`` uniform rotations,
scalar-first quaternions with the transposed-matrix convention, max-abs normalization):

  * ``VQVAEDataset``    — per-part recenter + random rotation, pad to P, per-shape max-abs
    normalize (vqvae/dataset/pc_dataset.py:94-115).
  * ``DenoiserDataset`` — whole-shape random rotation, recenter on the reference part, per-part
    recenter + random rotation producing the GT 7-DoF pose, per-part max-abs normalize capturing
    part_scale, pad to P; multi-reference-part curriculum with t<50 noise perturbation
    (denoiser/dataset/dataset.py:163-274). Test mode additionally re-anchors the matching data
    into the same augmented frame (:84-105, :189-206) and converts it to dense fixed-shape
    arrays for the jitted agglomeration engine (SURVEY.md §7.1).
  * ``VerifierDataset`` — pads to 190 edges, row-normalizes the 6-bin histogram and appends the
    raw count as feature 7 (verifier/dataset/dataset.py:31-97), 80/20 split by file order.

Every ``get`` takes the loader's rng so epochs are deterministic given the seed.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.spatial.transform import Rotation as R

from puzzlefusion_plusplus_tpu.models.scheduler import piecewise_betas
from puzzlefusion_plusplus_tpu.utils import native

MAX_EDGES = 190  # 20 * 19 / 2


def _draw_rotations(num: int, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """num uniform rotations drawn one-by-one (exact reference rng consumption order).

    Returns (rot_mats [num, 3, 3], scalar-first GT quats [num, 4] of the transposed mats).
    """
    mats = np.empty((num, 3, 3), np.float32)
    quats = np.empty((num, 4), np.float32)
    for i in range(num):
        m = R.random(random_state=rng).as_matrix()
        mats[i] = m
        quats[i] = R.from_matrix(m.T).as_quat()[[3, 0, 1, 2]]
    return mats, quats


def _pad(data: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + tuple(data.shape[1:]), dtype=np.float32)
    m = min(n, data.shape[0])
    out[:m] = data[:m]
    return out


def _pad_square(g: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n, n), dtype=g.dtype)
    m = min(n, g.shape[0])
    out[:m, :m] = g[:m, :m]
    return out


def _recenter_pc(pc):
    centroid = pc.mean(axis=0)
    return pc - centroid[None], centroid


def _rotate_pc(pc, rng):
    """Random rotation; returns (rotated pc, scalar-first GT quaternion of the inverse)."""
    rot_mat = R.random(random_state=rng).as_matrix()
    pc = (rot_mat @ pc.T).T
    quat_gt = R.from_matrix(rot_mat.T).as_quat()[[3, 0, 1, 2]]
    return pc, quat_gt


def load_pc_data_dir(data_dir: str, overfit: int = -1) -> list[dict]:
    files = sorted(f for f in os.listdir(data_dir) if f.endswith(".npz"))
    if overfit != -1:
        files = files[:overfit]
    out = []
    for f in files:
        d = np.load(os.path.join(data_dir, f), allow_pickle=True)
        out.append({k: d[k] for k in d.files})
    return out


class VQVAEDataset:
    def __init__(self, data_dir: str, max_num_part: int = 20, min_num_part: int = 2,
                 overfit: int = -1, category: str = ""):
        """``category``: restrict to one Breaking Bad category ('' or 'all' = everything,
        reference vqvae/dataset/pc_dataset.py:29)."""
        self.max_num_part = max_num_part
        cat = "" if category.lower() == "all" else category
        self.data_list = [
            s for s in load_pc_data_dir(data_dir, overfit)
            if min_num_part <= int(s["num_parts"]) <= max_num_part
            and (not cat or str(s.get("category", "")) == cat)
        ]

    def __len__(self):
        return len(self.data_list)

    def num_parts_list(self) -> np.ndarray:
        """Per-sample part counts, for part-count-sorted serving order (data/bucketing.py)."""
        return np.asarray([int(s["num_parts"]) for s in self.data_list], np.int32)

    def get(self, idx: int, rng: np.random.Generator) -> dict:
        s = self.data_list[idx]
        num_parts = int(s["num_parts"])
        pcs = s["part_pcs_gt"]
        rot_mats, _ = _draw_rotations(num_parts, rng)
        pts, _, _ = native.augment_parts_cpu(pcs[:num_parts], rot_mats, normalize=False)
        cur = _pad(pts, self.max_num_part)
        scale = np.max(np.abs(cur), axis=(1, 2), keepdims=True)
        scale[scale == 0] = 1
        return {
            "part_pcs": (cur / scale).astype(np.float32),
            "part_valids": _pad(s["part_valids"][:, None], self.max_num_part)[:, 0],
            "num_parts": num_parts,
            "data_id": int(s["data_id"]),
        }


class DenoiserDataset:
    def __init__(
        self,
        data_dir: str,
        mode: str = "train",  # train | val | test
        matching_data_path: str | None = None,
        max_num_part: int = 20,
        multiple_ref_parts: bool = True,
        overfit: int = -1,
        max_area_points_per_part: int | None = None,
        max_corr: int = 128,
        max_edges_dense: int = 380,
    ):
        self.mode = mode
        self.max_num_part = max_num_part
        self.multiple_ref_parts = multiple_ref_parts
        self.A = max_area_points_per_part
        self.K = max_corr
        self.E = max_edges_dense
        # forward-process arrays for the multi-ref curriculum perturbation (dataset.py:263-271)
        abar = np.cumprod(1.0 - piecewise_betas().astype(np.float64))
        self._sqrt_abar = np.sqrt(abar).astype(np.float32)
        self._sqrt_1m_abar = np.sqrt(1.0 - abar).astype(np.float32)

        self.data_list = []
        for s in load_pc_data_dir(data_dir, overfit):
            if mode == "test":
                assert matching_data_path is not None
                mfile = os.path.join(matching_data_path, f"{int(s['data_id'])}.npz")
                if not os.path.exists(mfile):
                    continue
                m = np.load(mfile, allow_pickle=True)
                s["matching"] = {k: m[k] for k in m.files}
            self.data_list.append(s)
        if mode == "test" and self.data_list:
            # auto-size the per-part area pad to the dataset (rounded up to a lane multiple)
            observed = max(int(s["matching"]["n_pcs"].max()) for s in self.data_list)
            if self.A is None or self.A < observed:
                self.A = -(-observed // 128) * 128
        elif self.A is None:
            self.A = 128

    def __len__(self):
        return len(self.data_list)

    def num_parts_list(self) -> np.ndarray:
        """Per-sample part counts, for part-count-sorted serving order (data/bucketing.py)."""
        return np.asarray([int(s["num_parts"]) for s in self.data_list], np.int32)

    def _curriculum_ref_parts(self, d: dict, rng: np.random.Generator) -> dict:
        """Multi-ref-part sampling + noise perturbation (dataset.py:228-271)."""
        num_parts = d["num_parts"]
        if num_parts == 2 or rng.random() < 0.5:
            return d
        ref_part = d["ref_part"]
        graph = d["graph"]
        scale = d["part_scale"]
        ref_idx = np.where(ref_part)[0]
        connect = np.where(graph[ref_idx, :])[1]
        larger = [p for p in connect if scale[p] > 0.05]
        if not larger:
            return d
        sample_num = rng.integers(0, len(larger))
        sampled = rng.choice(connect, sample_num, replace=False)
        ref_part[sampled] = True
        d["ref_part"] = ref_part
        t = int(rng.integers(0, 50))
        for key in ("part_trans", "part_rots"):
            x = d[key][sampled]
            noise = rng.standard_normal(x.shape).astype(np.float32)
            d[key][sampled] = self._sqrt_abar[t] * x + self._sqrt_1m_abar[t] * noise
        return d

    def _densify_matching(self, d: dict, matching: dict) -> dict:
        """Ragged matching arrays -> dense fixed-shape (area pts already in the sample frame)."""
        P, A, K, E = self.max_num_part, self.A, self.K, self.E
        n_pcs = matching["n_pcs"].astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(n_pcs)])
        area = d.pop("part_pcs_by_area")  # [N_sum, 3] in init (per-part local) pose
        num_parts = d["num_parts"]

        area_pts = np.zeros((P, A, 3), np.float32)
        n_area = np.zeros(P, np.int32)
        for i in range(num_parts):
            n = int(n_pcs[i])
            assert n <= A, f"area points {n} exceed pad {A}"
            area_pts[i, :n] = area[offsets[i] : offsets[i + 1]]
            n_area[i] = n

        critical_idx = matching["critical_pcs_idx"].astype(np.int64)
        n_crit = matching["n_critical_pcs"].astype(np.int64)
        edges = matching["edges"].astype(np.int64).reshape(-1, 2)
        corrs = matching["correspondence"]

        edges_dense = np.zeros((E, 2), np.int32)
        edge_valid = np.zeros(E, bool)
        corr_src = np.zeros((E, K), np.int32)
        corr_tgt = np.zeros((E, K), np.int32)
        corr_count = np.zeros(E, np.int32)
        n_edges = min(len(edges), E)
        for e in range(n_edges):
            # corr[:, 0] indexes the critical set of edges[e, 1] ("src"/idx1 in the reference),
            # corr[:, 1] that of edges[e, 0] (auto_aggl.py:185-193 argument order)
            b, a = int(edges[e, 0]), int(edges[e, 1])
            corr = np.asarray(corrs[e]).astype(np.int64).reshape(-1, 2)
            k = min(len(corr), K)
            # pre-gather the critical indirection: local area index of each matched point
            # (node_merge_utils.py:62-89 does this at runtime through prefix sums)
            crit_a = critical_idx[offsets[a] : offsets[a] + n_crit[a]]
            crit_b = critical_idx[offsets[b] : offsets[b] + n_crit[b]]
            edges_dense[e] = (b, a)  # stored exactly as the matching file orders them
            edge_valid[e] = True
            corr_src[e, :k] = crit_a[corr[:k, 0]]
            corr_tgt[e, :k] = crit_b[corr[:k, 1]]
            corr_count[e] = k

        d.update(
            area_pts=area_pts, n_area=n_area, match_edges=edges_dense,
            match_edge_valid=edge_valid, corr_src=corr_src, corr_tgt=corr_tgt,
            corr_count=corr_count,
        )
        return d

    def get(self, idx: int, rng: np.random.Generator) -> dict:
        s = self.data_list[idx]
        num_parts = int(s["num_parts"])
        part_pcs_gt = s["part_pcs_gt"][:num_parts]
        ref_part = s["ref_part"].copy()

        # whole-shape rotation + recenter on reference part (dataset.py:171-172)
        flat = part_pcs_gt.reshape(-1, 3)
        flat, pose_gt_r = _rotate_pc(flat, rng)
        part_pcs_final = flat.reshape(num_parts, -1, 3)
        ref_idx = int(np.where(ref_part[:num_parts])[0].item())
        pose_gt_t = part_pcs_final[ref_idx].mean(axis=0)
        part_pcs_final = part_pcs_final - pose_gt_t

        # per-part recenter + random rotation; the transform math runs in the native host
        # core (utils/native.py) with rotations drawn in the exact reference rng order
        rot_mats, quats = _draw_rotations(num_parts, rng)
        pts, centroids, _ = native.augment_parts_cpu(
            part_pcs_final[:num_parts], rot_mats, normalize=False
        )
        cur_pts = _pad(pts, self.max_num_part)
        cur_quat = _pad(quats, self.max_num_part)
        cur_trans = _pad(centroids, self.max_num_part)

        P = self.max_num_part
        d = {
            "data_id": int(s["data_id"]),
            "num_parts": num_parts,
            "part_valids": _pad(s["part_valids"][:, None], P)[:, 0],
            "ref_part": _pad(ref_part.astype(np.float32)[:, None], P)[:, 0].astype(bool),
            "graph": _pad_square(s["graph"].astype(np.float32), P).astype(bool),
            "mesh_file_path": str(s["mesh_file_path"]),
        }

        if self.mode == "test":
            m = s["matching"]
            # anchor the area cloud into the augmented frame (dataset.py:84-90):
            # inverse whole-shape rotation applied... then recenter; then move each part to its
            # init (local) pose by undoing the per-part GT trans/rot (dataset.py:92-105)
            gt_pcs = m["gt_pcs"]
            rot = R.from_quat(pose_gt_r[[1, 2, 3, 0]]).inv()
            anchored = rot.apply(gt_pcs) - pose_gt_t
            n_pcs = m["n_pcs"].astype(np.int64)
            parts_area = []
            off = 0
            for i in range(num_parts):
                c = anchored[off : off + int(n_pcs[i])]
                c = c - cur_trans[i]
                c = R.from_quat(cur_quat[i][[1, 2, 3, 0]]).inv().apply(c)
                parts_area.append(c)
                off += int(n_pcs[i])
            d["part_pcs_by_area"] = np.concatenate(parts_area, axis=0).astype(np.float32)

        # per-part max-abs normalize capturing part_scale (dataset.py:210-217)
        scale = np.max(np.abs(cur_pts), axis=(1, 2), keepdims=True)
        scale[scale == 0] = 1
        d["part_pcs"] = (cur_pts / scale).astype(np.float32)
        d["part_pcs_gt"] = _pad(part_pcs_gt, self.max_num_part)
        d["part_rots"] = cur_quat
        d["part_trans"] = cur_trans
        d["part_scale"] = scale.squeeze(-1).astype(np.float32)  # [P, 1]
        d["init_pose_r"] = pose_gt_r.astype(np.float32)
        d["init_pose_t"] = pose_gt_t.astype(np.float32)

        if self.mode == "test":
            d = self._densify_matching(d, s["matching"])
        elif self.mode == "train" and self.multiple_ref_parts:
            d = self._curriculum_ref_parts(d, rng)

        return d


class VerifierDataset:
    def __init__(self, data_dir: str, mode: str = "train", overfit: int = -1,
                 max_edges: int = MAX_EDGES):
        self.max_edges = max_edges
        files = sorted(f for f in os.listdir(data_dir) if f.endswith(".npz"))
        if overfit != -1:
            files = files[:overfit]
        if mode == "train":
            files = files[: int(0.8 * len(files))]
        else:
            files = files[int(0.8 * len(files)) :]
        self.data_list = []
        for f in files:
            data = np.load(os.path.join(data_dir, f))
            num_edges = data["edge_indices"].shape[0]
            edge_valids = np.zeros(self.max_edges, np.float32)
            edge_valids[:num_edges] = 1
            self.data_list.append({
                "cls_gt": _pad(data["cls_gt"].astype(np.float32)[:, None], max_edges)[:, 0],
                "edge_features": _pad(data["edge_features"].astype(np.float32), max_edges),
                "edge_indices": _pad(data["edge_indices"].astype(np.float32), max_edges)
                .astype(np.int64),
                "edge_valids": edge_valids,
                "num_edges": num_edges,
            })

    def __len__(self):
        return len(self.data_list)

    def get(self, idx: int, rng: np.random.Generator) -> dict:
        d = dict(self.data_list[idx])
        feats = d["edge_features"]
        num_points = feats.sum(axis=1)
        feats = feats / np.where(num_points == 0, 1, num_points)[:, None]
        d["edge_features"] = np.concatenate([feats, num_points[:, None]], axis=1)
        return d
