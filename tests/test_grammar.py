"""Sequence-grammar (FSM analog) checks + the north-star per-row
token-array-equality invariant (BASELINE.json input_hint: "per-row
invariant vs the reference: token-array equality")."""

import os

import numpy as np
import pyarrow as pa

from fastpasta_ray import schema as S
from fastpasta_ray.checks.grammar import GrammarConfig, run_grammar_checks
from fastpasta_ray.pipelines.check import run_check
from fastpasta_ray.stages.validate import CheckConfig
from fastpasta_ray.synth import BOS_ID, EOS_ID, PAD_ID, SynthSpec, gen_partition, write_fixture
from tests.test_row_checks import mk_batch

G = GrammarConfig(bos_id=BOS_ID, eos_id=EOS_ID, pad_id=PAD_ID)


def codes_of(v):
    return sorted(zip(v["row_index"].to_pylist(), v["code"].to_pylist()))


def test_grammar_clean():
    v = run_grammar_checks(mk_batch([("web/0000/00000001", [1, 7, 0, 0, 2], 5, "web")]),
                           GrammarConfig(BOS_ID, EOS_ID, None))
    assert v.num_rows == 0


def test_grammar_missing_bos_eos():
    v = run_grammar_checks(
        mk_batch(
            [
                ("web/0000/00000001", [9, 7, 2], 3, "web"),   # no BOS
                ("web/0000/00000002", [1, 7, 9], 3, "web"),   # no EOS
                ("web/0000/00000003", [1, 7, 2], 3, "web"),   # clean
            ]
        ),
        G,
    )
    assert codes_of(v) == [(0, "E30"), (1, "E50")]
    assert v["message"].to_pylist() == [
        "[E30] first token 9 != BOS 1",
        "[E50] last token 9 != EOS 2",
    ]


def test_grammar_interior_pad():
    v = run_grammar_checks(
        mk_batch(
            [
                ("web/0000/00000001", [1, 0, 7, 2], 4, "web"),     # pad at 1
                ("web/0000/00000002", [1, 7, 0, 0], 4, "web"),     # tail pads only (no E60; E50 fires)
            ]
        ),
        G,
    )
    got = codes_of(v)
    assert (0, "E60") in got
    assert (1, "E60") not in got
    pad_msgs = [m for m in v["message"].to_pylist() if "E60" in m]
    assert pad_msgs == ["[E60] pad token 0 at interior index 1"]


def test_grammar_null_and_empty_rows_skipped():
    v = run_grammar_checks(
        mk_batch(
            [
                ("web/0000/00000001", None, 0, "web"),
                ("web/0000/00000002", [], 0, "web"),
                ("web/0000/00000003", [1, 2], 2, "web"),
            ]
        ),
        G,
    )
    assert v.num_rows == 0


def test_grammar_fixture_end_to_end(tmp_path):
    d = str(tmp_path / "fix")
    info = write_fixture(
        d,
        SynthSpec(n_rows=300, n_parts=2, grammar=True),
        defect="bad_grammar",
        defect_k=6,
    )
    res = run_check(
        d,
        cfg=CheckConfig(bos_id=BOS_ID, eos_id=EOS_ID, pad_id=PAD_ID),
        with_key_checks=False,
    )
    v = res.violations
    assert v.num_rows == 6
    assert set(v["code"].to_pylist()) == {"E30", "E50", "E60"}
    assert sorted(v["row_index"].to_pylist()) == sorted(info["defect_rows"]["part-0000"])
    # clean grammar fixture: zero violations
    d2 = str(tmp_path / "clean")
    write_fixture(d2, SynthSpec(n_rows=300, n_parts=2, grammar=True))
    res2 = run_check(
        d2, cfg=CheckConfig(bos_id=BOS_ID, eos_id=EOS_ID, pad_id=PAD_ID), with_key_checks=False
    )
    assert res2.violations.num_rows == 0


def test_per_row_token_equality_vs_generator(tmp_path):
    """North-star invariant: every row that passes validation carries a
    token array byte-equal to the generator's ground truth."""
    d = str(tmp_path / "fix")
    spec = SynthSpec(n_rows=200, n_parts=2)
    write_fixture(d, spec)
    res = run_check(d, manifest_path=os.path.join(d, "_manifest.parquet"))
    assert not res.any_errors
    from fastpasta_ray.sources.parquet import iter_file_batches

    for p in range(spec.n_parts):
        truth = gen_partition(spec, p)
        got = pa.concat_tables(
            [b.drop_columns(["part", "row_index"]) for b in
             iter_file_batches(os.path.join(d, f"part-{p:04d}.parquet"))]
        )
        assert got.equals(truth)  # byte-level column equality incl. tokens
