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
