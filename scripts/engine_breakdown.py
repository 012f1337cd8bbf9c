"""Aggregate an engine breakdown.jsonl (inference/run.py::save_breakdown_records) into
failure-analysis tables: accuracy by part-count bucket and by part-size quartile,
ref vs non-ref.

The reference's evaluator only exposes batch means (evaluator.py:84-117); this answers
the follow-up questions an at-scale number raises — are small fragments the failures?
does accuracy collapse with part count? how much of part_acc is the pinned-ref floor?

Usage: python scripts/engine_breakdown.py <out_dir_or_breakdown.jsonl> [evidence_tag]
(pure numpy/host; no jax import)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def load_records(path: str) -> list[dict]:
    if os.path.isdir(path):
        path = os.path.join(path, "breakdown.jsonl")
    out = []
    with open(path) as fh:
        for line in fh:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn tail line
    return out


def analyze(records: list[dict]) -> dict:
    """-> nested dict of accuracy aggregates (all parts / nonref parts) sliced by
    part-count bucket and nonref part-size quartile."""
    acc, ref, scale, nparts = [], [], [], []
    for r in records:
        acc.extend(r["acc_per_part"])
        ref.extend(r["ref_part"])
        scale.extend(r["part_scale"])
        nparts.extend([r["num_parts"]] * r["num_parts"])
    acc = np.asarray(acc, bool)
    ref = np.asarray(ref, bool)
    scale = np.asarray(scale, np.float64)
    nparts = np.asarray(nparts, np.int64)
    nonref = ~ref

    def rate(mask):
        return round(float(acc[mask].mean()), 4) if mask.any() else None

    by_count = {}
    for lo, hi in ((2, 4), (5, 8), (9, 12), (13, 20)):
        m = (nparts >= lo) & (nparts <= hi)
        by_count[f"{lo}-{hi}"] = {
            "n_parts": int(m.sum()),
            "acc_all": rate(m),
            "acc_nonref": rate(m & nonref),
        }

    by_size = {}
    if nonref.any():
        qs = np.quantile(scale[nonref], [0.25, 0.5, 0.75])
        edges = [-np.inf, *qs, np.inf]
        for qi in range(4):
            m = nonref & (scale > edges[qi]) & (scale <= edges[qi + 1])
            by_size[f"q{qi + 1}"] = {
                "n_parts": int(m.sum()),
                "scale_range": [round(float(max(edges[qi], scale[nonref].min())), 5),
                                round(float(min(edges[qi + 1], scale[nonref].max())), 5)],
                "acc_nonref": rate(m),
            }

    return {
        "n_shapes": len(records),
        "n_parts_total": int(acc.size),
        "ref_fraction": round(float(ref.mean()), 4),
        "acc_all_parts": rate(np.ones_like(acc, bool)),
        "acc_ref_parts": rate(ref),  # ~1.0 by construction (pinned to GT)
        "acc_nonref_parts": rate(nonref),
        "by_part_count": by_count,
        "by_nonref_part_scale_quartile": by_size,
    }


def main(path: str, tag: str | None = None) -> dict:
    result = analyze(load_records(path))
    print(json.dumps(result, indent=1))
    if tag:
        from evidence import write_summary

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ev_dir = os.path.join(repo, "evidence", tag)
        os.makedirs(ev_dir, exist_ok=True)
        write_summary(ev_dir, "engine_breakdown", result)
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "output/everyday/inference/results",
         sys.argv[2] if len(sys.argv) > 2 else None)
