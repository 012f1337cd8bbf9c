"""Evidence capture + plateau detection for the TPU evidence queue (VERDICT r3 #7).

Round 3's stage-A artifacts died with /tmp when the tunnel went down and the loss was
still falling at the fixed step budget. Two fixes live here:

  * ``loss_plateaued`` — data-driven stopping: compare the median of the last ``window``
    logged values against the previous window; a stage keeps extending its budget (in
    bounded chunks, see synthetic_train_eval.py) until the improvement rate drops below
    ``min_rel_improve`` or the hard cap is hit.
  * ``collect`` — copy every stage's metrics.jsonl / summary JSON into the repo's
    ``evidence/`` tree (committed, survives /tmp) the moment a stage finishes, with a
    manifest recording source path + mtime + line count.
"""

from __future__ import annotations

import json
import os
import shutil
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE_DIR = os.path.join(REPO, "evidence")


def read_metric(metrics_path: str, key: str) -> list[tuple[int, float]]:
    """(step, value) series for one key from a MetricsLogger JSONL file."""
    out = []
    if not os.path.exists(metrics_path):
        return out
    with open(metrics_path) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn tail line from a killed run
            if key in rec:
                out.append((int(rec.get("step", len(out))), float(rec[key])))
    return out


def loss_plateaued(
    metrics_path: str,
    key: str,
    window: int = 8,
    min_rel_improve: float = 0.02,
    mode: str = "min",
) -> tuple[bool, dict]:
    """True when `key` stopped improving: median of the last `window` samples improved on
    the previous window's median by less than ``min_rel_improve`` (relative). ``mode`` is
    'min' for losses, 'max' for metrics like part_acc. With fewer than 2*window samples
    the series is treated as still-moving (returns False)."""
    series = [v for _, v in read_metric(metrics_path, key)]
    info = {"key": key, "n": len(series), "window": window}
    if len(series) < 2 * window:
        return False, info
    import statistics

    prev = statistics.median(series[-2 * window : -window])
    last = statistics.median(series[-window:])
    improve = (prev - last) if mode == "min" else (last - prev)
    denom = max(abs(prev), 1e-12)
    info.update(prev_median=prev, last_median=last, rel_improve=improve / denom)
    return improve / denom < min_rel_improve, info


def collect(run_root: str, tag: str, extra: dict | None = None) -> str:
    """Copy every metrics.jsonl / *.summary.json under ``run_root`` into
    ``evidence/<tag>/`` (flattened path-as-name), append a manifest entry, return the
    destination dir. Idempotent: re-collection overwrites with the newer file."""
    dst_dir = os.path.join(EVIDENCE_DIR, tag)
    os.makedirs(dst_dir, exist_ok=True)
    manifest_path = os.path.join(dst_dir, "MANIFEST.jsonl")
    copied = []
    for root, _dirs, files in os.walk(run_root):
        for f in files:
            if f == "metrics.jsonl" or f.endswith(".summary.json") or f == "topk.json":
                src = os.path.join(root, f)
                rel = os.path.relpath(src, run_root).replace(os.sep, "__")
                dst = os.path.join(dst_dir, rel)
                shutil.copy2(src, dst)
                with open(src) as fh:
                    n_lines = sum(1 for _ in fh)
                copied.append({"src": src, "dst": os.path.relpath(dst, REPO),
                               "mtime": os.path.getmtime(src), "lines": n_lines})
    with open(manifest_path, "a") as fh:
        fh.write(json.dumps({"collected_at": time.time(), "run_root": run_root,
                             "files": copied, "extra": extra or {}}) + "\n")
    return dst_dir


def write_summary(run_root: str, name: str, payload: dict) -> str:
    """Drop a ``<name>.summary.json`` into the run root (picked up by ``collect``)."""
    path = os.path.join(run_root, f"{name}.summary.json")
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1, default=float)
    return path


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pfpp_gen_4096"
    tag = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(root.rstrip("/"))
    print("collected ->", collect(root, tag))
