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
        from fastpasta_ray.sketches import hash_strings, one_chunk, splitmix64

        col = b[key_col]
        if pa.types.is_integer(col.type):
            h = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = hash_strings(one_chunk(col))
        return b.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    win_us = np.int64(round(window_seconds * 1_000_000))

    def scan(g: pa.Table) -> pa.Table:
        # Arrow C-kernel sort + numpy — no pandas conversion (VERDICT r2
        # #6 family); the remaining per-KEY loop runs two searchsorteds
        # per segment, bounded by distinct keys per bucket
        gs = g.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        ts = (
            gs[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        keys = gs[key_col].to_numpy(zero_copy_only=False)
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
        return gs.drop_columns(["bucket"]).append_column(
            "n_in_window", pa.array(hi - lo)
        )

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
        from fastpasta_ray.sketches import hash_strings, one_chunk, splitmix64

        col = b[key_col]
        if pa.types.is_integer(col.type):
            h = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:  # string keys hash too (same fix as joins.asof_join)
            h = hash_strings(one_chunk(col))
        return b.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    gap_us = np.int64(round(gap_seconds * 1_000_000))

    def sessions(g: pa.Table) -> pa.Table:
        # Arrow C-kernel sort + pure-numpy gaps-and-islands (no pandas —
        # VERDICT r2 #6 family): session bounds are run-length slices of
        # the new-session mask
        gs = g.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        keys = gs[key_col].to_numpy(zero_copy_only=False)
        ts64 = gs[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts = ts64.astype(np.int64)
        if not len(ts):
            return pa.table(
                {
                    key_col: pa.array([], type=g[key_col].type),
                    "session_start": pa.array([], type=pa.timestamp("us")),
                    "session_end": pa.array([], type=pa.timestamp("us")),
                    "n_events": pa.array([], type=pa.int64()),
                    "session_id": pa.array([], type=pa.int64()),
                }
            )
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        gap = np.r_[False, (ts[1:] - ts[:-1]) > gap_us]
        new_session = new_key | gap
        starts = np.flatnonzero(new_session)
        ends = np.r_[starts[1:], len(ts)]
        n_events = ends - starts
        # per-key session ordinal: arange reset at each key's first session
        key_first = np.flatnonzero(new_key[starts])
        per_key_n = np.diff(np.r_[key_first, len(starts)])
        session_id = np.arange(len(starts)) - np.repeat(key_first, per_key_n)
        return pa.table(
            {
                key_col: pa.array(keys[starts]),
                "session_start": pa.array(ts64[starts]).cast(pa.timestamp("us")),
                "session_end": pa.array(ts64[ends - 1]).cast(pa.timestamp("us")),
                "n_events": pa.array(n_events.astype(np.int64)),
                "session_id": pa.array(session_id.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pyarrow")
    )
