"""Custom joins Ray Data lacks: as-of join (and the broadcast patterns
used in queries.py).

As-of join semantics: for each left row, the single right row with the
largest right timestamp ≤ the left timestamp, within the same key group —
the standard event-attribution / market-data join.

Implementation (per SURVEY.md custom-operator guidance): composition of
map_batches + groupby(bucket) with vectorized ``pd.merge_asof`` inside
each bucket. Both sides are bucketed by ``hash(by) % num_buckets`` so all
rows of one key land in one group; within the bucket rows are sorted once
and merged vectorized. Partitioning assumption documented: correctness
requires only key-colocation, which hash bucketing provides regardless of
key skew; bucket count bounds the per-task memory (right side of a bucket
must fit in a task's heap — choose num_buckets so that holds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    num_buckets: int = 64,
    direction: str = "backward",
) -> "ray.data.Dataset":
    """As-of join of two datasets on time column ``on`` within key ``by``."""

    from fastpasta_ray.sketches import hash_strings, splitmix64

    def tag(side: str):
        def f(b: pa.Table) -> pa.Table:
            col = b[by]
            if pa.types.is_integer(col.type):
                h = splitmix64(
                    col.to_numpy(zero_copy_only=False).astype(np.uint64)
                )
            else:  # string or other keys: deterministic siphash
                h = hash_strings(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
            return b.append_column(
                "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
            ).append_column("__side", pa.array([side] * b.num_rows, type=pa.string()))

        return f

    # union both sides into one shuffle (schemas may differ → align columns,
    # padding each side's missing columns with nulls of the OTHER side's
    # actual types — a float64 pad would break non-float columns)
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = [f.name for f in lschema]
    rcols = [f.name for f in rschema]
    ltypes = {f.name: f.type for f in lschema}
    rtypes = {f.name: f.type for f in rschema}
    keep_r = right_cols or [c for c in rcols if c not in (on, by)]

    def widen_left(b: pa.Table) -> pa.Table:
        t = tag("l")(b)
        for c in keep_r:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, type=rtypes[c]))
        return t

    def widen_right(b: pa.Table) -> pa.Table:
        t = tag("r")(b.select([by, on] + keep_r))
        for c in lcols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, type=ltypes[c]))
        return t

    lw = left.map_batches(widen_left, batch_format="pyarrow")
    rw = right.map_batches(widen_right, batch_format="pyarrow")

    def merge_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        l = df[df["__side"] == "l"][lcols].sort_values(on, kind="mergesort")
        r = df[df["__side"] == "r"][[by, on] + keep_r].sort_values(on, kind="mergesort")
        r = r.rename(columns={on: f"{on}_right"})
        if not len(l):
            return pa.Table.from_pandas(
                pd.DataFrame(columns=lcols + [f"{on}_right"] + keep_r),
                preserve_index=False,
            ).replace_schema_metadata(None)
        out = pd.merge_asof(
            l,
            r,
            left_on=on,
            right_on=f"{on}_right",
            by=by,
            direction=direction,
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (
        lw.union(rw)
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
