"""Shuffle-dependent key checks: duplicates, referential, empty docs.

Analog of the reference's cross-entity checks — orbit-must-change /
duplicate detection (rdh_running.rs:125-133 → E80 analog), lane-not-in-IHW
active-lanes referential check (data_words/ib.rs:14-22 → E71), empty
readout frame ([E701], readout_frame.rs:96-99).

Design for 10^12 keys: a naive ``groupby(doc_id).map_groups`` calls the
group fn once per key — death by per-group overhead. Instead we bucket by
``hash(doc_id) % num_buckets`` and group by BUCKET: one shuffle, a few
thousand groups, and all within-bucket logic is vectorized pandas/numpy.
Hash bucketing is uniform regardless of source skew (the skew defusal the
north star demands), and ALL FOUR key checks ride the same single shuffle:

  E80  duplicate doc_id        (within and across partitions)
  E71  doc_id missing from manifest
  E72  n_tok != manifest expected_n_tok
  E701 manifest doc with no sequence row

The manifest side is unioned into the same shuffle with a tag column —
no join operator needed, and the manifest may be arbitrarily large.
For SMALL manifests prefer the broadcast variant in referential.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from fastpasta_ray import schema as S
from fastpasta_ray.sketches import hash_strings

MANIFEST_PART = "__manifest__"


def _tagged_seq(batch: pa.Table, num_buckets: int) -> pa.Table:
    h = hash_strings(batch["doc_id"].combine_chunks().to_pylist())
    return pa.table(
        {
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "doc_id": batch["doc_id"],
            "part": batch["part"],
            "row_index": batch["row_index"],
            "n_tok": pa.array(
                batch["n_tok"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            ),
            "tag": pa.array(["s"] * batch.num_rows, type=pa.string()),
        }
    )


def _tagged_manifest(batch: pa.Table, num_buckets: int) -> pa.Table:
    h = hash_strings(batch["doc_id"].combine_chunks().to_pylist())
    n = batch.num_rows
    return pa.table(
        {
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "doc_id": batch["doc_id"],
            "part": pa.array([MANIFEST_PART] * n, type=pa.string()),
            "row_index": pa.array([-1] * n, type=pa.int64()),
            "n_tok": pa.array(
                batch["expected_n_tok"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            ),
            "tag": pa.array(["m"] * n, type=pa.string()),
        }
    )


def _bucket_violations(gt: pa.Table) -> pa.Table:
    """Vectorized within-bucket detection. Receives one whole bucket as an
    Arrow table; pandas used internally for the grouped logic; returns an
    Arrow table with the violations schema (empty-safe)."""
    g = gt.to_pandas()
    out: list[pd.DataFrame] = []
    s = g[g["tag"] == "s"]
    m = g[g["tag"] == "m"]

    def mk(rows: pd.DataFrame, code: str, column: str, msgs) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "part": rows["part"].to_numpy(),
                "row_index": rows["row_index"].to_numpy(),
                "doc_id": rows["doc_id"].to_numpy(),
                "code": code,
                "column": column,
                "message": msgs,
            }
        )

    if len(s):
        # E80: duplicates — keep first occurrence by (part, row_index)
        s_sorted = s.sort_values(["doc_id", "part", "row_index"], kind="mergesort")
        dup_mask = s_sorted["doc_id"].duplicated(keep="first")
        dups = s_sorted[dup_mask]
        if len(dups):
            out.append(
                mk(
                    dups,
                    S.E_DUP_DOCID,
                    "doc_id",
                    [
                        S.format_message(S.E_DUP_DOCID, f"duplicate doc_id {d!r}")
                        for d in dups["doc_id"]
                    ],
                )
            )
        if len(m):
            mi = m.drop_duplicates("doc_id").set_index("doc_id")["n_tok"]
            exp = s["doc_id"].map(mi)
            orphan = exp.isna()
            orphans = s[orphan]
            if len(orphans):
                out.append(
                    mk(
                        orphans,
                        S.E_ORPHAN,
                        "doc_id",
                        [
                            S.format_message(S.E_ORPHAN, f"doc_id {d!r} not in manifest")
                            for d in orphans["doc_id"]
                        ],
                    )
                )
            mism = (~orphan) & (exp.to_numpy(dtype="float64", na_value=np.nan) != s["n_tok"].to_numpy())
            bad = s[mism]
            if len(bad):
                expv = exp[mism].astype("int64")
                out.append(
                    mk(
                        bad,
                        S.E_MANIFEST_NTOK,
                        "n_tok",
                        [
                            S.format_message(
                                S.E_MANIFEST_NTOK,
                                f"n_tok {int(a)} != manifest expected {int(e)}",
                            )
                            for a, e in zip(bad["n_tok"], expv)
                        ],
                    )
                )
    if len(m):
        seen = set(s["doc_id"]) if len(s) else set()
        empty = m[~m["doc_id"].isin(seen)].drop_duplicates("doc_id")
        if len(empty):
            out.append(
                mk(
                    empty,
                    S.E_EMPTY_DOC,
                    "doc_id",
                    [
                        S.format_message(
                            S.E_EMPTY_DOC, f"manifest doc_id {d!r} has no sequence rows"
                        )
                        for d in empty["doc_id"]
                    ],
                )
            )
    if not out:
        return S.VIOLATIONS_SCHEMA.empty_table()
    return pa.Table.from_pandas(
        pd.concat(out, ignore_index=True), schema=S.VIOLATIONS_SCHEMA, preserve_index=False
    )


def key_checks(
    seq_scalars: "ray.data.Dataset",
    manifest: "ray.data.Dataset | None",
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """All four key checks in ONE hash-bucketed shuffle.

    ``seq_scalars``: dataset with (part,row_index,doc_id,n_tok) — read with
    column pruning, the tokens payload never moves through this shuffle.
    Returns a VIOLATIONS_SCHEMA dataset.
    """
    tagged = seq_scalars.map_batches(
        lambda b: _tagged_seq(b, num_buckets), batch_format="pyarrow"
    )
    if manifest is not None:
        tagged = tagged.union(
            manifest.map_batches(
                lambda b: _tagged_manifest(b, num_buckets), batch_format="pyarrow"
            )
        )
    return tagged.groupby("bucket").map_groups(
        _bucket_violations, batch_format="pyarrow"
    )
