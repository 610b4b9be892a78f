"""Windowed / session operators over event streams.

- Tumbling windows: timestamp truncation + groupby (see q_hourly_events).
- Session windows (gap-based): the AlpideReadoutFrame analog — a frame
  opens at TDH(continuation=0) and closes at TDT(packet_done=1)
  (readout_frame.rs:20-198); here a session opens at the first event of a
  key and closes when the gap to the next event exceeds ``gap``.

Scale plan: bucket by hash(user) → groupby(bucket) → vectorized
gaps-and-islands inside each bucket (sort + diff + cumsum), never a
per-session Python loop. One shuffle; skew-immune (hash bucketing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def rolling_count(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: float = 300.0,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-row trailing-range window count: for each event, the number of
    events of the same key with ``ts ∈ [ts - window, ts]`` (inclusive) —
    the RANGE-frame window aggregate Ray Data lacks natively.

    Composition: hash-bucket by key (skew-immune) → per-bucket sort →
    vectorized two-pointer (searchsorted of window starts against the
    sorted timestamps) — O(n log n) per bucket, no per-row Python. Exactly
    matches SQL ``COUNT(*) OVER (PARTITION BY key ORDER BY ts RANGE
    BETWEEN INTERVAL w PRECEDING AND CURRENT ROW)``."""

    def bucketize(b: pa.Table) -> pa.Table:
        from fastpasta_ray.sketches import hash_strings, splitmix64

        col = b[key_col]
        if pa.types.is_integer(col.type):
            h = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = hash_strings(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        return b.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    win_us = np.int64(round(window_seconds * 1_000_000))

    def scan(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values([key_col, ts_col], kind="mergesort")
        ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        keys = df[key_col].to_numpy()
        # per-key segments within the sorted bucket
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        seg_start = np.flatnonzero(new_key)
        # SQL RANGE-frame semantics: the frame includes ALL peers (rows of
        # equal ts), so count = #(ts' ∈ [ts−w, ts]) via two searchsorteds
        lo = np.empty(len(ts), dtype=np.int64)
        hi = np.empty(len(ts), dtype=np.int64)
        for s, e in zip(seg_start, np.r_[seg_start[1:], len(ts)]):
            lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - win_us, side="left")
            hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], side="right")
        cnt = hi - lo
        out = df.drop(columns=["bucket"]).copy()
        out["n_in_window"] = cnt
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
    )


def sessionize(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Session summary rows: (key, session_id, session_start, session_end,
    n_events). Vectorized gaps-and-islands per hash bucket."""

    def bucketize(b: pa.Table) -> pa.Table:
        from fastpasta_ray.sketches import hash_strings, splitmix64

        col = b[key_col]
        if pa.types.is_integer(col.type):
            h = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:  # string keys hash too (same fix as joins.asof_join)
            h = hash_strings(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        return b.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def sessions(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values([key_col, ts_col], kind="mergesort")
        ts = df[ts_col]
        new_key = df[key_col].ne(df[key_col].shift(1))
        gap = (ts - ts.shift(1)).dt.total_seconds() > gap_seconds
        new_session = (new_key | gap).to_numpy()
        sid = np.cumsum(new_session) - 1
        out = (
            pd.DataFrame(
                {
                    key_col: df[key_col].to_numpy(),
                    "_sid": sid,
                    ts_col: ts.to_numpy(),
                }
            )
            .groupby("_sid", sort=True)
            .agg(
                **{
                    key_col: (key_col, "first"),
                    "session_start": (ts_col, "min"),
                    "session_end": (ts_col, "max"),
                    "n_events": (ts_col, "size"),
                }
            )
            .reset_index(drop=True)
        )
        # session_id unique within key: rank of session per key
        out["session_id"] = out.groupby(key_col).cumcount()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pyarrow")
    )
