"""Key-check recovery must be TARGETED (VERDICT r2 #3): with a
multi-row-group manifest and rare violations, recovery reads only the row
groups containing affected rows — never the whole manifest — and the
violations are unchanged."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastpasta_ray.checks import key_checks as K
from fastpasta_ray.synth import SynthSpec, write_fixture


@pytest.fixture()
def fixture_many_rg(tmp_path):
    """Fixture + a manifest rewritten into 40 row groups, with ONE extra
    manifest-only doc (→ E701) and one n_tok expectation bumped (→ E72)."""
    d = str(tmp_path / "fix")
    write_fixture(d, SynthSpec(n_rows=2000, n_parts=2, mean_n_tok=16))
    m = os.path.join(d, "_manifest.parquet")
    t = pq.read_table(m)
    # corrupt one expectation (E72 on the matching sequence row)
    exp = t["expected_n_tok"].to_numpy(zero_copy_only=False).copy()
    exp[137] += 1
    t = t.set_column(
        t.schema.get_field_index("expected_n_tok"),
        "expected_n_tok",
        pa.array(exp, type=t["expected_n_tok"].type),
    )
    # one manifest-only doc (E701)
    ghost = pa.table(
        {
            "doc_id": pa.array(["web/0000/99999999"]),
            "source": pa.array(["web"]),
            "expected_n_tok": pa.array([5], type=t["expected_n_tok"].type),
        },
        schema=t.schema,
    )
    t = pa.concat_tables([t, ghost])
    pq.write_table(t, m, row_group_size=max(1, t.num_rows // 40))
    assert pq.ParquetFile(m).metadata.num_row_groups >= 35
    return d, m


def test_recovery_reads_few_manifest_row_groups(fixture_many_rg, monkeypatch):
    d, m = fixture_many_rg
    from fastpasta_ray.sources.parquet import sequence_files

    files = sequence_files(d)

    # count row-group reads of the MANIFEST during the driver-side
    # recovery step only (the exchange maps legitimately scan everything)
    counts = {"manifest_rg_reads": 0}
    real_read_rows = K._read_rows_by_index

    def counting_read_rows(path, row_idx, column):
        if path == m:
            pf = pq.ParquetFile(path)
            md = pf.metadata
            starts = np.zeros(md.num_row_groups + 1, dtype=np.int64)
            for i in range(md.num_row_groups):
                starts[i + 1] = starts[i] + md.row_group(i).num_rows
            rg_of = np.searchsorted(starts, row_idx, side="right") - 1
            counts["manifest_rg_reads"] += len(np.unique(rg_of))
        return real_read_rows(path, row_idx, column)

    monkeypatch.setattr(K, "_read_rows_by_index", counting_read_rows)

    v = K.key_checks(files, m)
    codes = sorted(v["code"].to_pylist())
    assert codes == ["E701", "E72"]
    # the ghost doc and the bad expectation live in at most 3 row groups;
    # a whole-manifest read would have been 40
    n_rg = pq.ParquetFile(m).metadata.num_row_groups
    assert counts["manifest_rg_reads"] <= max(3, n_rg // 10)
    # and the E72 message names both values
    e72 = [x for c, x in zip(v["code"].to_pylist(), v["message"].to_pylist()) if c == "E72"]
    assert "manifest expected" in e72[0]


def test_dataset_variant_matches_raw_on_manifest_defects(fixture_many_rg):
    """The Dataset-native key-check variant agrees with the raw exchange on
    manifest-side defects (E72/E701) under the positional-loc encoding."""
    d, m = fixture_many_rg
    from fastpasta_ray.sources.parquet import sequence_files

    files = sequence_files(d)
    raw = (
        K.key_checks(files, m)
        .to_pandas()
        .sort_values(["part", "row_index", "code"], kind="mergesort")
        .reset_index(drop=True)
    )
    via_ds = (
        K.key_checks_dataset(files, m)
        .to_pandas()
        .sort_values(["part", "row_index", "code"], kind="mergesort")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(raw, via_ds, check_dtype=False)
