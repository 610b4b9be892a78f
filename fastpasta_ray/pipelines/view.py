"""View pipelines — formatted sample rows (the `view rdh` /
`view its-readout-frames` analogs, fastpasta/src/analyze/view/).

The reference streams every record through a row formatter to stdout; at
100 TB that is only ever useful for a bounded sample, so these take
``limit`` rows (ds.limit streams only the needed blocks) and format
driver-side — formatting is presentation, not a distributed concern.
"""

from __future__ import annotations


from fastpasta_ray.sources.parquet import read_sequences

HEADER = f"{'PART':<12} {'ROW':>8} {'DOC_ID':<28} {'SOURCE':<10} {'N_TOK':>6}  TOKENS[:8]"


def view_sequences(input_dir: str, limit: int = 20) -> list[str]:
    """Per-record pretty rows (rdh_view.rs:4-31 analog)."""
    ds = read_sequences(input_dir).limit(limit)
    lines = [HEADER]
    for row in ds.take(limit):
        toks = row["tokens"]
        head = ",".join(str(t) for t in (toks[:8] if toks is not None else []))
        tail = "…" if toks is not None and len(toks) > 8 else ""
        lines.append(
            f"{row['part']:<12} {row['row_index']:>8} {row['doc_id'] or '∅':<28} "
            f"{row['source'] or '∅':<10} {row['n_tok']:>6}  [{head}{tail}]"
        )
    return lines


def view_doc_frames(input_dir: str, limit: int = 10) -> list[str]:
    """Frame-level view (its_readout_frame_view.rs analog): one line per
    document with its token span summary."""
    ds = read_sequences(input_dir).limit(limit)
    lines = [f"{'DOC_ID':<28} {'SOURCE':<10} {'N_TOK':>6} {'TOK_MIN':>8} {'TOK_MAX':>8}"]
    for row in ds.take(limit):
        toks = row["tokens"] or []
        lines.append(
            f"{row['doc_id'] or '∅':<28} {row['source'] or '∅':<10} {row['n_tok']:>6} "
            f"{min(toks) if toks else '-':>8} {max(toks) if toks else '-':>8}"
        )
    return lines
