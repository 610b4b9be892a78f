"""Deterministic sampling for training-data pipelines.

``ds.random_sample`` is non-reproducible across runs/cluster layouts; a
training-data pipeline needs samples that are STABLE under re-execution,
resume, and repartitioning. Hash-based sampling gives that: a row is in
the sample iff ``hash(key) % denom < num`` — a pure function of the row,
independent of block layout, worker count, or execution order.

- ``hash_sample``: uniform deterministic sample at rate num/denom.
- ``stratified_sample``: per-stratum rates (e.g. downsample the 70%-mass
  head source, keep the tail) — the standard source-rebalancing step.
Both are plain ``map_batches`` filters: zero shuffle, streaming.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from fastpasta_ray.sketches import hash_strings, splitmix64


def _row_hashes(batch: pa.Table, key_col: str) -> np.ndarray:
    col = batch[key_col]
    if pa.types.is_integer(col.type):
        return splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
    return hash_strings(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)


def hash_sample(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    num: int,
    denom: int = 1000,
    salt: int = 0,
) -> "ray.data.Dataset":
    """Keep rows where hash(key, salt) % denom < num — reproducible,
    layout-independent, resumable. ``salt`` selects independent samples."""

    def f(batch: pa.Table) -> pa.Table:
        h = _row_hashes(batch, key_col)
        if salt:
            h = splitmix64(h ^ np.uint64(salt))
        return batch.filter(pa.array((h % np.uint64(denom)) < num))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    denom: int = 1_000_000,
    salt: int = 0,
) -> "ray.data.Dataset":
    """Per-stratum deterministic sampling: ``rates[stratum]`` is the keep
    probability (the source-rebalancing step for skewed corpora)."""
    thresholds = {k: int(round(v * denom)) for k, v in rates.items()}
    default_thr = int(round(default_rate * denom))

    def f(batch: pa.Table) -> pa.Table:
        h = _row_hashes(batch, key_col)
        if salt:
            h = splitmix64(h ^ np.uint64(salt))
        strata = batch[stratum_col].to_pylist()
        thr = np.fromiter(
            (thresholds.get(s, default_thr) for s in strata),
            dtype=np.uint64,
            count=batch.num_rows,
        )
        return batch.filter(pa.array((h % np.uint64(denom)) < thr))

    return ds.map_batches(f, batch_format="pyarrow")


def mixture_sample(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    stratum_col: str,
    weights: dict[str, int],
    denom: int = 1000,
    hash_keys: bool = True,
) -> tuple["ray.data.Dataset", dict[str, int]]:
    """Deterministically downsample to a target mixture (the data-mixing
    step of training-corpus assembly: "20% code, 30% web, ..."). Strata
    not in ``weights`` are dropped.

    All sizing is INTEGER math so a SQL oracle can replicate it exactly:
    with ``W = sum(weights)``, the largest total corpus achievable at the
    exact target mix is ``T = min_s(count_s * W // w_s)``; each stratum's
    keep threshold is ``thr_s = (w_s * T * denom) // (W * count_s)`` and a
    row survives iff ``key % denom < thr_s`` (``hash_keys=False``) or the
    splitmix64-hashed key passes the same test (``hash_keys=True`` — the
    production default for non-uniform keys).

    The per-stratum counts come from a streaming pass of per-batch
    partial counts merged on the driver (one tiny row per stratum per
    block — no sort-groupby, so a lazy upstream is NOT re-executed by
    shuffle sampling); the filter itself is a second zero-shuffle
    streaming pass. Callers with an expensive lazy upstream should
    materialize it first (it is consumed twice). Returns ``(sampled
    dataset, thresholds)``. int64-safe up to count 10^12 x denom 10^3 x
    weight 10^2."""
    W = sum(weights.values())
    if W <= 0:
        raise ValueError("mixture_sample: weights must sum to a positive value")
    if denom <= 0:
        raise ValueError(f"mixture_sample: denom must be positive (got {denom})")
    if any(w < 0 for w in weights.values()):
        raise ValueError("mixture_sample: weights must be non-negative")

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by([stratum_col]).aggregate([([], "count_all")])
        return g.rename_columns([stratum_col, "n"])

    counts: dict[str, int] = {}
    for row in ds.map_batches(partial_counts, batch_format="pyarrow").take_all():
        s = row[stratum_col]
        counts[s] = counts.get(s, 0) + int(row["n"])
    missing = [s for s, w in weights.items() if w > 0 and not counts.get(s)]
    if missing:
        raise ValueError(f"mixture_sample: no rows for weighted strata {missing}")
    T = min(counts[s] * W // w for s, w in weights.items() if w > 0)
    thr = {
        s: (w * T * denom) // (W * counts[s]) if w > 0 else 0
        for s, w in weights.items()
    }

    def f(batch: pa.Table) -> pa.Table:
        if hash_keys:
            h = _row_hashes(batch, key_col)
        else:
            h = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        strata = batch[stratum_col].to_pylist()
        t = np.fromiter(
            (thr.get(s, 0) for s in strata), dtype=np.uint64, count=batch.num_rows
        )
        return batch.filter(pa.array((h % np.uint64(denom)) < t))

    return ds.map_batches(f, batch_format="pyarrow"), thr
