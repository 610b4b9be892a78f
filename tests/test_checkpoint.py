"""Resume semantics: killed run → restart reprocesses only uncommitted
partitions; final outputs identical to an uninterrupted run (FIXTURES.md
test protocol #5). The reference has no checkpointing — this is north-rule
new design (state/checkpoint.py)."""

import json
import os

from fastpasta_ray.pipelines.check import run_check
from fastpasta_ray.state.checkpoint import CheckpointStore
from fastpasta_ray.synth import SynthSpec, write_fixture


def test_commit_and_resume(tmp_path):
    d = str(tmp_path / "fix")
    out = str(tmp_path / "out")
    write_fixture(d, SynthSpec(n_rows=200, n_parts=4), defect="bad_len", defect_k=3)

    # full run with checkpointing
    r1 = run_check(d, with_key_checks=False, out_dir=out)
    store = CheckpointStore(out)
    committed = store.committed()
    assert sorted(committed) == [f"part-{i:04d}" for i in range(4)]
    rec = committed["part-0000"]
    assert rec["status"] == "committed"
    assert rec["row_count"] == 200
    assert rec["violation_count"] == 3
    assert rec["input_path"].endswith("part-0000.parquet")

    # simulate a crash that lost partitions 2,3: delete their commit records
    for p in ("part-0002", "part-0003"):
        os.remove(os.path.join(out, "commits", f"{p}.json"))

    # resumed run: only 2,3 reprocess; result identical to uninterrupted run
    r2 = run_check(d, with_key_checks=False, out_dir=out, resume=True)
    assert r2.report == r1.report
    assert r2.violations.num_rows == r1.violations.num_rows
    assert (
        r2.violations.sort_by([("part", "ascending"), ("row_index", "ascending")])
        .equals(
            r1.violations.sort_by([("part", "ascending"), ("row_index", "ascending")])
        )
    )


def test_resume_skips_committed(tmp_path, monkeypatch):
    """A resumed run must not re-read committed partitions at all."""
    d = str(tmp_path / "fix")
    out = str(tmp_path / "out")
    write_fixture(d, SynthSpec(n_rows=100, n_parts=3))
    run_check(d, with_key_checks=False, out_dir=out)

    # poison one committed file on disk — resume must not touch it
    poisoned = os.path.join(d, "part-0001.parquet")
    with open(poisoned, "wb") as f:
        f.write(b"not a parquet file")
    r = run_check(d, with_key_checks=False, out_dir=out, resume=True)
    assert r.report["total_rows"] == 300
    assert not r.any_errors


def test_resume_restores_drift_verdicts(tmp_path):
    """Drift verdicts are computed in-task and committed with the partition;
    a resumed run restores them without recomputing the skipped parts."""
    from fastpasta_ray.checks.drift import build_profile

    d = str(tmp_path / "fix")
    out = str(tmp_path / "out")
    write_fixture(d, SynthSpec(n_rows=150, n_parts=3))
    base = run_check(d, with_key_checks=False)
    profile = build_profile(base.stats_by_part)

    r1 = run_check(d, with_key_checks=False, out_dir=out, reference_profile=profile)
    assert set(r1.drift_metrics) == {f"part-{i:04d}" for i in range(3)}
    os.remove(os.path.join(out, "commits", "part-0002.json"))
    r2 = run_check(
        d, with_key_checks=False, out_dir=out, resume=True, reference_profile=profile
    )
    assert r2.drift_metrics == r1.drift_metrics
    assert r2.report == r1.report


def test_key_check_violations_not_committed(tmp_path):
    """Key-check codes (E80/E71/E72/E701) are global and recomputed each
    run — they must NOT be stored in partition commits, or a resumed run
    would double-count them."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = str(tmp_path / "fix")
    out = str(tmp_path / "out")
    write_fixture(d, SynthSpec(n_rows=200, n_parts=3), defect="bad_dup_doc_id", defect_k=3)
    r1 = run_check(d, out_dir=out, manifest_path=os.path.join(d, "_manifest.parquet"))
    dups1 = r1.violations.filter(pc.equal(r1.violations["code"], "E80")).num_rows
    assert dups1 == 3
    # stored per-partition violations contain no key-check codes
    for f in os.listdir(os.path.join(out, "violations")):
        t = pq.read_table(os.path.join(out, "violations", f))
        assert not set(t["code"].to_pylist()) & {"E80", "E71", "E72", "E701"}
    # full resume (all parts committed): key-check violations appear exactly once
    r2 = run_check(
        d, out_dir=out, resume=True, manifest_path=os.path.join(d, "_manifest.parquet")
    )
    dups2 = r2.violations.filter(pc.equal(r2.violations["code"], "E80")).num_rows
    assert dups2 == 3
    assert r2.violations.num_rows == r1.violations.num_rows


def test_early_stop_then_resume_completes(tmp_path):
    """Global budget stops a run mid-way; the skipped partitions were NOT
    committed, so a resume WITHOUT the budget finishes them — the
    checkpoint/resume contract composed with the early-stop divergence."""
    from fastpasta_ray.pipelines.check import run_check
    from fastpasta_ray.stages.validate import CheckConfig
    from fastpasta_ray.synth import SynthSpec, write_fixture

    d = str(tmp_path / "fix")
    ck = str(tmp_path / "ck")
    write_fixture(
        d,
        SynthSpec(n_rows=600, n_parts=12, mean_n_tok=16),
        defect="bad_vocab",
        defect_k=5,
        defect_parts=tuple(range(12)),
    )
    stopped = run_check(
        d, cfg=CheckConfig(max_errors_global=10), with_key_checks=False, out_dir=ck
    )
    assert stopped.report["stopped_early"] is True
    assert stopped.violations.num_rows < 60
    resumed = run_check(d, with_key_checks=False, out_dir=ck, resume=True)
    assert resumed.report.get("stopped_early") is not True  # key absent or False
    assert resumed.violations.num_rows == 60
    assert resumed.report["total_rows"] == 7200
