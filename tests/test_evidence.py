"""Evidence-queue helpers (scripts/evidence.py): plateau detection + in-repo collection.

VERDICT r3 #7: round 3's stage budgets were fixed guesses and its /tmp artifacts died with
the host — stages now stop on measured loss slope and copy their metrics into the repo.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import evidence


def _write_metrics(path, values, key="cd_loss"):
    with open(path, "w") as fh:
        for i, v in enumerate(values):
            fh.write(json.dumps({"step": i * 50, key: v}) + "\n")


def test_plateau_detects_flat_series(tmp_path):
    p = tmp_path / "metrics.jsonl"
    _write_metrics(p, [5.0 - 0.1 * i for i in range(20)] + [3.0] * 20)
    done, info = evidence.loss_plateaued(str(p), "cd_loss", window=8)
    assert done, info
    assert info["rel_improve"] < 0.02


def test_plateau_keeps_extending_falling_series(tmp_path):
    p = tmp_path / "metrics.jsonl"
    _write_metrics(p, [10.0 - 0.2 * i for i in range(40)])
    done, info = evidence.loss_plateaued(str(p), "cd_loss", window=8)
    assert not done, info
    assert info["rel_improve"] > 0.02


def test_plateau_short_series_is_not_plateaued(tmp_path):
    p = tmp_path / "metrics.jsonl"
    _write_metrics(p, [1.0] * 5)
    done, info = evidence.loss_plateaued(str(p), "cd_loss", window=8)
    assert not done  # too few samples to call it


def test_plateau_max_mode_for_rising_metrics(tmp_path):
    p = tmp_path / "metrics.jsonl"
    _write_metrics(p, [0.1 + 0.02 * i for i in range(30)], key="eval_part_acc")
    done, _ = evidence.loss_plateaued(str(p), "eval_part_acc", window=8, mode="max")
    assert not done  # still rising
    _write_metrics(p, [0.1 + 0.02 * i for i in range(15)] + [0.4] * 20,
                   key="eval_part_acc")
    done, info = evidence.loss_plateaued(str(p), "eval_part_acc", window=8, mode="max")
    assert done, info


def test_plateau_tolerates_torn_tail_line(tmp_path):
    p = tmp_path / "metrics.jsonl"
    _write_metrics(p, [3.0] * 20)
    with open(p, "a") as fh:
        fh.write('{"step": 1000, "cd_l')  # killed mid-write
    done, _ = evidence.loss_plateaued(str(p), "cd_loss", window=8)
    assert done


def test_collect_copies_metrics_and_manifests(tmp_path, monkeypatch):
    run = tmp_path / "run" / "everyday" / "vqvae"
    run.mkdir(parents=True)
    _write_metrics(run / "metrics.jsonl", [1.0, 2.0])
    (run / "topk.json").write_text("{}")
    (tmp_path / "run" / "x.summary.json").write_text('{"a": 1}')
    monkeypatch.setattr(evidence, "EVIDENCE_DIR", str(tmp_path / "evidence"))
    dst = evidence.collect(str(tmp_path / "run"), "gen-test", extra={"stage": "A"})
    names = sorted(os.listdir(dst))
    assert "MANIFEST.jsonl" in names
    assert any(n.endswith("metrics.jsonl") for n in names)
    assert any(n.endswith("x.summary.json") for n in names)
    assert any(n.endswith("topk.json") for n in names)
    manifest = [json.loads(l) for l in open(os.path.join(dst, "MANIFEST.jsonl"))]
    assert manifest[-1]["extra"] == {"stage": "A"}
    assert len(manifest[-1]["files"]) == 3
    # idempotent re-collection appends a manifest entry, overwrites files
    evidence.collect(str(tmp_path / "run"), "gen-test")
    manifest = [json.loads(l) for l in open(os.path.join(dst, "MANIFEST.jsonl"))]
    assert len(manifest) == 2


def test_write_summary_roundtrip(tmp_path):
    path = evidence.write_summary(str(tmp_path), "engine", {"part_acc": 0.5})
    assert json.load(open(path)) == {"part_acc": 0.5}
