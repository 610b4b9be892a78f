"""Sequence-grammar (FSM-analog) checks over the tokens list.

The reference validates the word-sequence grammar of each payload with an
FSM (ItsPayloadFsmContinuous, its_payload_fsm_cont.rs:24-81,111-298):
IHW must open, TDT(packet_done) must close, DDW0 only at HBF end. The
tokenized-sequence analog is the structural grammar of a training row:

  E30: first token must be BOS      (IHW-opens-payload analog)
  E50: last token must be EOS       (TDT-packet_done-closes analog)
  E60: PAD tokens may appear only as a contiguous tail
       (DDW0-only-at-end analog)

The FSM is row-local (each row is one "payload"), so the whole grammar is
evaluated VECTORIZED over the batch: first/last-token gathers via list
offsets, and the pad rule via a per-row "last non-pad position vs first
pad position" comparison computed with np.maximum.reduceat — never a
Python loop over rows, never a per-token Python FSM step.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fastpasta_ray import schema as S
from fastpasta_ray.sketches import one_chunk


@dataclass(frozen=True)
class GrammarConfig:
    bos_id: int | None = None   # None disables the corresponding rule
    eos_id: int | None = None
    pad_id: int | None = None


def run_grammar_checks(batch: pa.Table, g: GrammarConfig) -> pa.Table:
    """Vectorized grammar pass; returns VIOLATIONS_SCHEMA rows."""
    if g.bos_id is None and g.eos_id is None and g.pad_id is None:
        return S.VIOLATIONS_SCHEMA.empty_table()
    tokens = one_chunk(batch["tokens"])
    n = len(tokens)
    valid = pc.is_valid(tokens).to_numpy(zero_copy_only=False)
    lens = pc.fill_null(pc.list_value_length(tokens), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = valid & (lens > 0)
    flat = tokens.flatten().to_numpy(zero_copy_only=False)
    # start offset of each VALID row within flat (flatten drops null rows)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(np.where(valid, lens, 0)[:-1], out=starts[1:])
    out: list[pa.Table] = []
    from fastpasta_ray.checks.row_checks import _emit

    part = one_chunk(batch["part"])
    row_index = one_chunk(batch["row_index"])
    doc_id = one_chunk(batch["doc_id"])

    # clipped gather indices: rows masked out by `nonempty` (null/empty,
    # possibly trailing) may have start == len(flat); the clip keeps the
    # gather in bounds and np.where discards the garbage lane
    safe_hi = max(len(flat) - 1, 0)
    if g.bos_id is not None and nonempty.any():
        first = np.where(nonempty, flat[np.minimum(starts, safe_hi)], g.bos_id)
        bad = np.flatnonzero(first != g.bos_id)
        _emit(
            out, part, row_index, doc_id, bad, S.E_GRAMMAR_BOS, "tokens",
            [
                f"first token {int(first[r])} != BOS {g.bos_id}"
                f" ctx [{S.token_excerpt(flat, starts[r], starts[r] + lens[r], starts[r])}]"
                for r in bad
            ],
        )
    if g.eos_id is not None and nonempty.any():
        last_idx = np.clip(starts + lens - 1, 0, safe_hi)
        last = np.where(nonempty, flat[last_idx], g.eos_id)
        bad = np.flatnonzero(last != g.eos_id)
        _emit(
            out, part, row_index, doc_id, bad, S.E_GRAMMAR_EOS, "tokens",
            [
                f"last token {int(last[r])} != EOS {g.eos_id}"
                f" ctx [{S.token_excerpt(flat, starts[r], starts[r] + lens[r], starts[r] + lens[r] - 1)}]"
                for r in bad
            ],
        )
    if g.pad_id is not None and len(flat):
        is_pad = flat == g.pad_id
        if is_pad.any():
            idx = np.arange(len(flat), dtype=np.int64)
            # per-row max index of a NON-pad token and min index of a pad token
            nonpad_pos = np.where(~is_pad, idx, -1)
            pad_pos = np.where(is_pad, idx, np.iinfo(np.int64).max)
            vrows = np.flatnonzero(nonempty)
            red_starts = starts[vrows]
            last_nonpad = np.maximum.reduceat(nonpad_pos, red_starts)
            first_pad = np.minimum.reduceat(pad_pos, red_starts)
            # a pad BEFORE the last non-pad token → interior pad
            bad_local = first_pad < last_nonpad
            bad = vrows[np.flatnonzero(bad_local)]
            fp = (first_pad - red_starts)[np.flatnonzero(bad_local)]
            _emit(
                out, part, row_index, doc_id, bad, S.E_GRAMMAR_PAD, "tokens",
                [
                    f"pad token {g.pad_id} at interior index {int(i)}"
                    f" ctx [{S.token_excerpt(flat, starts[r], starts[r] + lens[r], starts[r] + i)}]"
                    for r, i in zip(bad, fp)
                ],
            )
    if not out:
        return S.VIOLATIONS_SCHEMA.empty_table()
    return pa.concat_tables(out)
