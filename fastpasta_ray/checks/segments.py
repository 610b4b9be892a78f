"""Nested segment decoding within token sequences — the ALPIDE deep-decode
analog (A1/A2, SURVEY.md §2.5).

The reference decodes each lane's byte stream into chips inside a readout
frame and checks: chip bunch-counters identical within the frame
(lane_alpide_frame_analyzer.rs:180-320 [E9003], cross-lane wrapper
alpide.rs:19-122 [E74]/[E75]), chip count per lane
([E9004]/check_frame_lanes_valid [E72]/[E73]), and chip-id ordering
([E9005]).

Analog over the `tokens` payload: a sequence is a frame; segments are the
lanes/chips, delimited by a configurable ``segment_delim_id`` token:

  E73  segment count outside [min_segments, max_segments]  (chip count)
  E74  segment headers (first token of each segment) not all equal
       within a row                                        (BC equality)
  E75  empty segment (two consecutive delimiters)          (empty frame)
  E76  segment header sequence not among the configured allowed
       orderings — the ``chip_orders_ob`` custom-check analog
       (custom_checks_cfg.rs:16-24, checks applied at
       lane_alpide_frame_analyzer.rs:180-320)

Fully vectorized across the batch: one flatten, one delimiter scan, one
segment-start derivation — no per-row Python. Row-local (fits map_batches,
like the reference's per-frame analysis inside one validator thread).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fastpasta_ray import schema as S
from fastpasta_ray.sketches import one_chunk


def run_segment_checks(
    batch: pa.Table,
    *,
    delim_id: int,
    min_segments: int | None = None,
    max_segments: int | None = None,
    check_headers: bool = True,
    allowed_orders: tuple | None = None,
) -> pa.Table:
    """Segment-structure checks over one SEQUENCES_POS batch.

    ``allowed_orders``: tuple of allowed segment-header sequences (each a
    tuple of token ids). When set, every row with ≥1 segment must have a
    header sequence exactly equal to one of them (chip_orders_ob analog —
    the reference ships [[0..6],[8..14]] as its OB defaults)."""
    tokens = one_chunk(batch["tokens"])
    if isinstance(tokens, pa.ChunkedArray):
        tokens = one_chunk(tokens)
    n = batch.num_rows
    lens_arr = pc.list_value_length(tokens)
    lens = np.where(
        pc.is_null(lens_arr).to_numpy(zero_copy_only=False),
        0,
        lens_arr.fill_null(0).to_numpy(zero_copy_only=False),
    ).astype(np.int64)
    flat = tokens.flatten()
    vals = flat.to_numpy(zero_copy_only=False) if len(flat) else np.zeros(0, dtype=np.int64)
    row_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=row_starts[1:])
    row_ends = row_starts + lens
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)

    is_delim = vals == delim_id
    # a segment starts at a non-delim token that is at a row start or
    # right after a delimiter
    prev_is_delim = np.r_[True, is_delim[:-1]]
    at_row_start = np.zeros(len(vals), dtype=bool)
    at_row_start[row_starts[lens > 0]] = True
    seg_start = (~is_delim) & (prev_is_delim | at_row_start)
    seg_per_row = np.bincount(row_of[seg_start], minlength=n)

    # an EMPTY segment exists where a delimiter is immediately preceded by
    # a delimiter (within the same row) or sits at the row start/end
    empty_after = is_delim & (prev_is_delim & ~at_row_start)
    at_start_delim = is_delim & at_row_start
    next_is_delim = np.r_[is_delim[1:], True]
    at_row_end = np.zeros(len(vals), dtype=bool)
    if n:
        at_row_end[row_ends[lens > 0] - 1] = True
    trailing_delim = is_delim & at_row_end
    empty_seg = empty_after | at_start_delim | trailing_delim
    empty_per_row = np.bincount(row_of[empty_seg], minlength=n)

    out: list[pa.Table] = []
    part = one_chunk(batch["part"])
    row_index = one_chunk(batch["row_index"])
    doc_id = one_chunk(batch["doc_id"])

    def emit(rows: np.ndarray, code: str, details: list[str]):
        if not len(rows):
            return
        take = pa.array(rows)
        out.append(
            pa.table(
                {
                    "part": pc.take(part, take),
                    "row_index": pc.take(row_index, take),
                    "doc_id": pc.take(doc_id, take),
                    "code": pa.array([code] * len(rows), type=pa.string()),
                    "column": pa.array(["tokens"] * len(rows), type=pa.string()),
                    "message": pa.array(
                        [S.format_message(code, d) for d in details], type=pa.string()
                    ),
                },
                schema=S.VIOLATIONS_SCHEMA,
            )
        )

    # E73: segment count outside the configured band (rows with tokens only)
    has_tokens = lens > 0
    bad_count = np.zeros(n, dtype=bool)
    if min_segments is not None:
        bad_count |= has_tokens & (seg_per_row < min_segments)
    if max_segments is not None:
        bad_count |= has_tokens & (seg_per_row > max_segments)
    rows73 = np.flatnonzero(bad_count)
    emit(
        rows73, S.E_SEG_COUNT,
        [
            f"segment count {int(seg_per_row[r])} outside "
            f"[{min_segments}, {max_segments}]"
            for r in rows73
        ],
    )

    # E75: empty segments
    rows75 = np.flatnonzero(empty_per_row > 0)
    emit(
        rows75, S.E_SEG_EMPTY,
        [f"{int(empty_per_row[r])} empty segment(s)" for r in rows75],
    )

    # E74: all segment headers within a row must be equal (BC equality)
    if check_headers and seg_start.any():
        heads = vals[seg_start]
        hrow = row_of[seg_start]
        # rows whose segment-header min != max have unequal headers
        hmin = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        hmax = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(hmin, hrow, heads)
        np.maximum.at(hmax, hrow, heads)
        rows74 = np.flatnonzero((seg_per_row > 1) & (hmin != hmax))
        emit(
            rows74, S.E_SEG_HEADER,
            [
                f"segment headers differ: min {int(hmin[r])} != max {int(hmax[r])}"
                for r in rows74
            ],
        )

    # E76: header sequence must be one of the allowed orderings
    # (chip_orders_ob analog). Vectorized per allowed order: rows whose
    # segment count matches the order's length compare their gathered
    # header block against it in one equality; a row passes if ANY allowed
    # order matches.
    if allowed_orders and seg_start.any():
        heads = vals[seg_start]
        hoff = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(seg_per_row, out=hoff[1:])
        candidate = has_tokens & (seg_per_row > 0)
        matched = np.zeros(n, dtype=bool)
        for order in allowed_orders:
            order_np = np.asarray(order, dtype=heads.dtype if len(heads) else np.int64)
            L = len(order_np)
            rows_l = np.flatnonzero(candidate & (seg_per_row == L))
            if not len(rows_l):
                continue
            gather = (hoff[rows_l][:, None] + np.arange(L)[None, :]).reshape(-1)
            block = heads[gather].reshape(len(rows_l), L)
            matched[rows_l] |= (block == order_np[None, :]).all(axis=1)
        rows76 = np.flatnonzero(candidate & ~matched)
        emit(
            rows76, S.E_SEG_ORDER,
            [
                "segment header order "
                + str([int(h) for h in heads[hoff[r] : hoff[r + 1]]])
                + " not in allowed orderings"
                for r in rows76
            ],
        )

    return pa.concat_tables(out) if out else S.VIOLATIONS_SCHEMA.empty_table()
