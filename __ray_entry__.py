"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship validation pipeline over sf0.001 — derives a
  `sequences`-shaped table from the documents table, writes it as a
  partitioned fixture, runs the full check pipeline (stateless sanity +
  running + key checks + stats sketches) and returns the violations table
  (stable schema, ≥0 rows).
- ``queries()`` / ``oracle_sql()``: operator inventory over the testdata
  tables; see fastpasta_ray/pipelines/queries.py.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import pyarrow.parquet as pq

    from fastpasta_ray.pipelines.check import run_check
    from fastpasta_ray.stages.validate import CheckConfig
    from fastpasta_ray.synth import sequences_from_documents

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    seq = sequences_from_documents(docs)
    d = tempfile.mkdtemp(prefix="fp_entry_")
    # partition into 4 files (one per "link")
    n = seq.num_rows
    step = (n + 3) // 4
    for i in range(4):
        pq.write_table(seq.slice(i * step, step), os.path.join(d, f"part-{i:04d}.parquet"))
    # doc_ids from documents are not monotonically indexed per file and the
    # source domain differs from SOURCES — configure the run accordingly
    sources = sorted(set(seq["source"].to_pylist()))
    res = run_check(
        d,
        cfg=CheckConfig(source_domain=tuple(sources), running_checks=False),
        with_key_checks=True,
    )
    return res.violations


def queries() -> dict[str, Callable[[str], Any]]:
    from fastpasta_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fastpasta_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
