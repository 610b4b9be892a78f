"""Running (stateful, order-dependent) checks within one partition.

Analog of RdhCruRunningChecker (rdh_running.rs:38-184): state carried across
records in file order, per key. Our contract (documented per SURVEY.md §4):
order is meaningful *within a partition file*, not globally — exactly the
reference's per-link ordering assumption. The validate stage processes each
file sequentially in one task, so the state is plain Python carried across
Arrow batches; the check itself is vectorized inside each batch.

Check E11: the trailing 8-digit doc index of doc_id must be strictly
increasing within a partition (analog of the pages_counter sequence check
[E11], rdh_running.rs:83-121). Rows whose doc_id is malformed are skipped
(they already got E12/E13).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fastpasta_ray import schema as S


class RunningState:
    """Per-partition running state (one instance per input file).

    ``expected_stride``: the R4 EXACT analog of the reference's
    user-specified trigger period check (tdh.rs:60-206, [E440..E445]):
    each valid doc index must advance by exactly ``stride`` modulo
    ``index_wrap`` (the reference wraps the bunch counter at MAX_BC=3563;
    the 8-digit doc index wraps at 10^8). None disables the exact check,
    leaving only monotonicity — the `check sanity` vs period-configured
    `check all` distinction."""

    __slots__ = ("last_idx", "expected_stride", "index_wrap")

    INDEX_WRAP = 100_000_000  # 8-digit doc index domain

    def __init__(self, expected_stride: int | None = None, index_wrap: int | None = None):
        self.last_idx: int | None = None
        self.expected_stride = expected_stride
        self.index_wrap = index_wrap or self.INDEX_WRAP

    def check_batch(self, batch: pa.Table) -> pa.Table:
        """Vectorized monotonicity check over one ordered batch; carries the
        last seen doc index across batches. Returns violation rows."""
        doc_id = batch["doc_id"].combine_chunks()
        # extract trailing digits; invalid/missing → null
        idx_str = pc.extract_regex(doc_id, r"/(?P<idx>\d{8})$")
        idx_arr = pc.struct_field(idx_str, "idx")
        idx = pc.cast(idx_arr, pa.int64())
        idx_np = idx.to_numpy(zero_copy_only=False)  # float with NaN where null
        valid = ~pd_isnan(idx_np)
        vrows = np.flatnonzero(valid)
        if len(vrows) == 0:
            return S.VIOLATIONS_SCHEMA.empty_table()
        seq = idx_np[vrows].astype(np.int64)
        prev = np.empty_like(seq)
        prev[1:] = seq[:-1]
        have_prev = self.last_idx is not None
        prev[0] = self.last_idx if have_prev else np.iinfo(np.int64).min
        if self.expected_stride is not None:
            # exact-period mode (E44): (cur - prev) mod wrap == stride;
            # the first valid row of the partition has no predecessor
            delta = np.mod(seq - prev, self.index_wrap)
            bad = delta != self.expected_stride
            if not have_prev:
                bad[0] = False
        else:
            bad = seq <= prev
        # carry the IMMEDIATE predecessor (last valid index), not the max:
        # the in-batch comparison is each-row-vs-previous-row, and the
        # cross-batch carry must match or results would depend on where
        # batch boundaries fall (caught by hypothesis)
        self.last_idx = int(seq[-1])
        bad_pos = vrows[np.flatnonzero(bad)]
        if len(bad_pos) == 0:
            return S.VIOLATIONS_SCHEMA.empty_table()
        part = batch["part"].combine_chunks()
        row_index = batch["row_index"].combine_chunks()
        take = pa.array(bad_pos)
        prev_vals = prev[np.flatnonzero(bad)]
        cur_vals = seq[np.flatnonzero(bad)]
        if self.expected_stride is not None:
            code = S.E_PERIOD
            msgs = [
                S.format_message(
                    code,
                    f"doc index stride {(int(c) - int(p)) % self.index_wrap} "
                    f"!= expected {self.expected_stride} ({int(c)} after {int(p)})",
                )
                for c, p in zip(cur_vals, prev_vals)
            ]
        else:
            code = S.E_ORDER
            msgs = [
                S.format_message(
                    code, f"doc index not increasing: {int(c)} after {int(p)}"
                )
                for c, p in zip(cur_vals, prev_vals)
            ]
        return pa.table(
            {
                "part": pc.take(part, take),
                "row_index": pc.take(row_index, take),
                "doc_id": pc.take(doc_id, take),
                "code": pa.array([code] * len(bad_pos), type=pa.string()),
                "column": pa.array(["doc_id"] * len(bad_pos), type=pa.string()),
                "message": pa.array(msgs, type=pa.string()),
            },
            schema=S.VIOLATIONS_SCHEMA,
        )


def pd_isnan(a: np.ndarray) -> np.ndarray:
    if a.dtype.kind == "f":
        return np.isnan(a)
    return np.zeros(len(a), dtype=bool)
