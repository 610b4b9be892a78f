"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (n-gram overlap decontamination
as published for GPT-3 appendix C / Llama 2 §A.6 — public method): any
training document containing an n-gram that also occurs in a held-out
benchmark is flagged (and typically dropped) so downstream evals are not
contaminated.

Scale shape — broadcast, not shuffle: benchmark sets are small (10^4-10^6
documents) while the corpus is the 10^12-row side, so the benchmark's
unique n-gram hash set is built once, sorted, broadcast via ``ray.put``,
and every corpus batch does a vectorized ``searchsorted`` membership test
against it — zero shuffle, pure streaming ``map_batches``. This mirrors
the manifest/IHW-mask broadcast-lookup pattern (SURVEY §2.5 A4) rather
than fastPASTA's per-link dispatch; there is no reference analog —
fastPASTA has no cross-corpus membership operator.

N-grams are word n-grams over a single-space split, hashed per doc with
SET semantics (``word_ngram_hashes_flat``) — identical to the exact
Jaccard verify's ground truth, so a DuckDB oracle can recompute the same
overlap counts from strings.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray

from fastpasta_ray.functions.dedup import word_ngram_hashes_flat

logger = logging.getLogger(__name__)

# Driver-held benchmark set cap: 2^27 unique n-grams x 8 B = 1 GiB. Real
# eval suites are orders of magnitude below this; hitting the cap means
# the "benchmark" side is actually a corpus and needs the shuffle-join
# path instead of a broadcast.
MAX_BENCH_NGRAMS = 1 << 27


def benchmark_ngram_set(
    bench: "ray.data.Dataset",
    *,
    text_col: str = "text",
    ngram_n: int = 3,
) -> np.ndarray:
    """Sorted unique word-n-gram hashes of the benchmark corpus.

    Per-batch unique sets are computed in parallel tasks; the driver only
    merges the (already-deduped) partials — bounded by MAX_BENCH_NGRAMS,
    enforced loudly."""

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = word_ngram_hashes_flat(b[text_col], ngram_n)
        u = np.unique(flat)
        return pa.table({"sh": pa.array(u, type=pa.uint64())})

    parts = [
        t["sh"].to_numpy(zero_copy_only=False)
        for t in ray.get(bench.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    # cap check BEFORE the concatenate: sum of per-block uniques bounds the
    # global unique count, so a corpus-sized "benchmark" fails here instead
    # of OOMing the driver on the multi-GB concat (code-review r3)
    total = sum(len(p) for p in parts)
    if total > MAX_BENCH_NGRAMS:
        raise ValueError(
            f"benchmark n-gram partials total {total} hashes "
            f"(> {MAX_BENCH_NGRAMS}); this side is too large for a broadcast "
            "— use contamination_check_distributed (hash-partitioned "
            "n-gram semi-join) instead"
        )
    return np.unique(np.concatenate(parts))


def _overlap_counts(batch: pa.Table, bs: np.ndarray, text_col: str, ngram_n: int) -> np.ndarray:
    """Per-row count of distinct word-n-grams also present in the sorted
    benchmark hash set ``bs`` (vectorized searchsorted + reduceat)."""
    flat, off = word_ngram_hashes_flat(batch[text_col], ngram_n)
    if len(bs) and len(flat):
        pos = np.clip(np.searchsorted(bs, flat), 0, len(bs) - 1)
        hit = (bs[pos] == flat).astype(np.int64)
    else:
        hit = np.zeros(len(flat), dtype=np.int64)
    starts = off[:-1]
    counts = off[1:] - starts
    n_overlap = np.zeros(batch.num_rows, dtype=np.int64)
    nz = counts > 0
    if nz.any() and len(hit):
        n_overlap[nz] = np.add.reduceat(hit, starts[nz])
    return n_overlap


def contamination_check(
    docs: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    min_overlap: int = 1,
) -> "ray.data.Dataset":
    """Per-document benchmark overlap: (id, n_overlap) for every corpus
    doc whose DISTINCT word-n-gram overlap with the benchmark set is
    ≥ ``min_overlap``.

    One broadcast (sorted benchmark hash set), one streaming corpus pass;
    the membership test and per-doc counts are fully vectorized
    (searchsorted + reduceat)."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1 (got {min_overlap})")
    bset = benchmark_ngram_set(bench, text_col=text_col, ngram_n=ngram_n)
    logger.info(
        "contamination_check: benchmark set has %d unique %d-grams (%.1f MB broadcast)",
        len(bset), ngram_n, bset.nbytes / 1e6,
    )
    bref = ray.put(bset)

    def flag(batch: pa.Table) -> pa.Table:
        bs = ray.get(bref)  # zero-copy plasma read, once per task
        n_overlap = _overlap_counts(batch, bs, text_col, ngram_n)
        keep = n_overlap >= min_overlap
        kept = batch.filter(pa.array(keep))
        return pa.table(
            {
                id_col: kept[id_col],
                "n_overlap": pa.array(n_overlap[keep], type=pa.int64()),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow")


def decontaminate(
    docs: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    *,
    text_col: str = "text",
    ngram_n: int = 3,
    min_overlap: int = 1,
) -> "ray.data.Dataset":
    """The drop side of ``contamination_check``: return the corpus with
    contaminated documents (overlap ≥ ``min_overlap``) removed, all
    columns preserved. Same broadcast + zero-shuffle streaming shape."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1 (got {min_overlap})")
    bset = benchmark_ngram_set(bench, text_col=text_col, ngram_n=ngram_n)
    bref = ray.put(bset)

    def drop(batch: pa.Table) -> pa.Table:
        bs = ray.get(bref)
        n_overlap = _overlap_counts(batch, bs, text_col, ngram_n)
        return batch.filter(pa.array(n_overlap < min_overlap))

    return docs.map_batches(drop, batch_format="pyarrow")


def contamination_check_distributed(
    docs: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    min_overlap: int = 1,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """The shuffle path of ``contamination_check`` for when the benchmark
    side is itself corpus-sized (beyond MAX_BENCH_NGRAMS, where the
    broadcast would not fit): a hash-partitioned n-gram semi-join.

    Both sides stream once, emitting slim (bucket, ngram_hash, doc_id)
    rows — hash 8 B + id 8 B per DISTINCT (doc, n-gram); text never
    shuffles. One groupby(bucket) counts, per corpus doc, its n-grams
    that also occur anywhere in the benchmark side (sorted-merge
    membership, no Python loops), and a final per-doc sum folds the
    per-bucket partial counts. Results are identical to the broadcast
    path (equivalence-tested); cost is one all-to-all of the slim rows
    instead of a driver-held set — the standard broadcast-vs-shuffle
    trade at 10^12 scale."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1 (got {min_overlap})")

    def emit(side_is_bench: bool):
        # explicit is_bench flag instead of a doc=-1 sentinel: a corpus
        # doc_id of -1 must not silently become benchmark rows, and a
        # non-integer id column should fail with a clean message up front
        # rather than deep inside a Ray task (ADVICE r3)
        def f(batch: pa.Table) -> pa.Table:
            flat, off = word_ngram_hashes_flat(batch[text_col], ngram_n)
            counts = np.diff(off)
            if side_is_bench:
                ids = np.zeros(len(flat), dtype=np.int64)
            else:
                from fastpasta_ray.functions.dedup import _require_int_ids

                _require_int_ids(
                    batch[id_col], id_col, "contamination_check_distributed"
                )
                raw = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ids = np.repeat(raw, counts)
            return pa.table(
                {
                    "bucket": pa.array(
                        (flat % np.uint64(num_buckets)).astype(np.int64)
                    ),
                    "sh": pa.array(flat, type=pa.uint64()),
                    "doc": pa.array(ids),
                    "is_bench": pa.array(
                        np.full(len(flat), side_is_bench, dtype=bool)
                    ),
                }
            )

        return f

    def bucket_overlap(g: pa.Table) -> pa.Table:
        sh = g["sh"].to_numpy(zero_copy_only=False)
        doc = g["doc"].to_numpy(zero_copy_only=False)
        is_bench = g["is_bench"].to_numpy(zero_copy_only=False)
        bench_sh = np.unique(sh[is_bench])
        corpus = ~is_bench
        csh, cdoc = sh[corpus], doc[corpus]
        if not len(csh) or not len(bench_sh):
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_overlap": pa.array([], type=pa.int64()),
                }
            )
        pos = np.clip(np.searchsorted(bench_sh, csh), 0, len(bench_sh) - 1)
        hit = bench_sh[pos] == csh
        if not hit.any():
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_overlap": pa.array([], type=pa.int64()),
                }
            )
        hd = cdoc[hit]
        udocs, ucounts = np.unique(hd, return_counts=True)
        return pa.table(
            {
                id_col: pa.array(udocs, type=pa.int64()),
                "n_overlap": pa.array(ucounts.astype(np.int64)),
            }
        )

    rows = docs.map_batches(emit(False), batch_format="pyarrow").union(
        bench.map_batches(emit(True), batch_format="pyarrow")
    ).materialize()  # shield the two-side scan from groupby sampling
    # coalesce capped at the bucket cardinality: the sort-based groupby
    # makes one partition per input block, and surplus partitions come back
    # as schema-less empty blocks (the RefBundle schema-flip warning —
    # VERDICT r4 #5; one shared policy site, coalesce_blocks)
    from fastpasta_ray.sources.parquet import coalesce_blocks

    per_bucket = (
        rows.repartition(coalesce_blocks(rows.count(), num_buckets))
        .groupby("bucket")
        .map_groups(bucket_overlap, batch_format="pyarrow")
    )

    # per-doc partial counts are one row per (doc, bucket-with-hits); the
    # final fold is Ray's built-in sum aggregate (vectorized C path — NOT
    # map_groups, which would cost one Python call per distinct doc) plus
    # a streaming threshold filter
    folded = per_bucket.groupby(id_col).sum("n_overlap")

    def threshold(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns([id_col, "n_overlap"])
        t = t.set_column(
            t.column_names.index("n_overlap"),
            "n_overlap",
            pa.compute.cast(t["n_overlap"], pa.int64()),
        )
        return t.filter(pa.compute.greater_equal(t["n_overlap"], min_overlap))

    return folded.map_batches(threshold, batch_format="pyarrow")
