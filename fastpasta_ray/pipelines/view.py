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


def _scoped(input_dir: str, limit: int, sources: tuple | None):
    """Limit-bounded sequence read, optionally scoped to sources (the
    global --filter-link analog, config.rs:75-103 — the reference's views
    honour the same filter group as checks). Vectorized batch filter, then
    ds.limit streams only the needed blocks."""
    ds = read_sequences(input_dir)
    if sources is not None:
        import pyarrow as pa

        from fastpasta_ray.schema import source_mask, source_set

        src_set = source_set(sources)

        def keep(b: pa.Table) -> pa.Table:
            return b.filter(source_mask(b["source"], src_set))

        ds = ds.map_batches(keep, batch_format="pyarrow")
    return ds.limit(limit)


def view_sequences(
    input_dir: str, limit: int = 20, *, sources: tuple | None = None
) -> list[str]:
    """Per-record pretty rows (rdh_view.rs:4-31 analog)."""
    ds = _scoped(input_dir, limit, sources)
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


def view_doc_frames(
    input_dir: str, limit: int = 10, *, sources: tuple | None = None
) -> list[str]:
    """Frame-level view (its_readout_frame_view.rs analog): one line per
    document with its token span summary."""
    ds = _scoped(input_dir, limit, sources)
    lines = [f"{'DOC_ID':<28} {'SOURCE':<10} {'N_TOK':>6} {'TOK_MIN':>8} {'TOK_MAX':>8}"]
    for row in ds.take(limit):
        toks = row["tokens"] or []
        lines.append(
            f"{row['doc_id'] or '∅':<28} {row['source'] or '∅':<10} {row['n_tok']:>6} "
            f"{min(toks) if toks else '-':>8} {max(toks) if toks else '-':>8}"
        )
    return lines

TOKEN_CLASS_LEGEND = "classes: B=BOS E=EOS P=PAD D=delim .=data"


def view_doc_data(
    input_dir: str,
    limit: int = 5,
    *,
    bos_id: int | None = None,
    eos_id: int | None = None,
    pad_id: int | None = None,
    delim_id: int | None = None,
    words_per_line: int = 8,
    sources: tuple | None = None,
) -> list[str]:
    """Per-token data view (its_readout_frame_data_view.rs:3-35 analog):
    one frame-header line per document, then one line per group of
    ``words_per_line`` tokens with its token offset and a per-token
    classification lane — the analog of the reference's per-GBT-word
    formatted view with memory positions."""
    ds = _scoped(input_dir, limit, sources)
    classes = {bos_id: "B", eos_id: "E", pad_id: "P", delim_id: "D"}
    classes.pop(None, None)
    lines = [TOKEN_CLASS_LEGEND]
    for row in ds.take(limit):
        toks = row["tokens"] if row["tokens"] is not None else []
        lines.append(
            f"=== {row['part']}:{row['row_index']} {row['doc_id'] or '∅'} "
            f"source={row['source'] or '∅'} n_tok={row['n_tok']}"
        )
        for off in range(0, len(toks), words_per_line):
            chunk = toks[off : off + words_per_line]
            vals = " ".join(f"{t:>6}" for t in chunk)
            lane = "".join(classes.get(t, ".") for t in chunk)
            lines.append(f"{off:>8}  {vals:<{7 * words_per_line}}  {lane}")
    return lines
