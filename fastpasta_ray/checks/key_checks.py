"""Shuffle-dependent key checks: duplicates, referential, empty docs.

Analog of the reference's cross-entity checks — duplicate detection
(rdh_running.rs:125-133 → E80 analog), lane-not-in-IHW active-lanes
referential check (data_words/ib.rs:14-22 → E71), empty readout frame
([E701], readout_frame.rs:96-99), lane-grouping mismatch (→ E72).

Scale design (10^12 keys):

1. **Slim the shuffle.** Only fixed-width ints move: ``h`` (64-bit siphash
   of doc_id), ``loc`` (part_idx<<40 | row_index — one int64), ``n_tok``.
   ~20 B/row instead of ~50 B of strings; int sort beats string sort.
2. **Hash-bucketed groupby, vectorized within buckets.** ``groupby(bucket)``
   with ``num_buckets`` groups (not per-key — per-key map_groups dies of
   per-group overhead at 10^12 keys). All within-bucket logic is pure numpy
   run-length analysis over the sorted hash array. Hash bucketing is
   uniform regardless of source skew — the skew defusal the north star
   demands.
3. **Late string materialization.** Violations are detected as (h, loc,
   code) candidates — tiny, capped — then doc_id strings are recovered by a
   targeted re-read of ONLY the affected partitions/rows and verified by
   exact string comparison (drops the ~2^-64-probability hash-collision
   false positives). The full doc_id column never shuffles.

All four checks ride the same single shuffle:
  E80  duplicate doc_id        (within and across partitions)
  E71  doc_id missing from manifest
  E72  n_tok != manifest expected_n_tok
  E701 manifest doc with no sequence row
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from fastpasta_ray import schema as S
from fastpasta_ray.sketches import hash_strings
from fastpasta_ray.sources.parquet import part_of

MANIFEST_PART = "__manifest__"
MANIFEST_LOC = np.int64(-1)
ROW_BITS = np.int64(40)  # row_index < 2^40 rows per partition file

# candidate codes (int8 through the shuffle, mapped to codes at recovery);
# _C_DUPREF marks the KEPT first row of a dup run — recovered only so E80
# rows can be string-verified against it, never emitted as a violation
_C_DUP, _C_ORPHAN, _C_NTOK, _C_EMPTY, _C_DUPREF = 1, 2, 3, 4, 5
_CODE_OF = {_C_DUP: S.E_DUP_DOCID, _C_ORPHAN: S.E_ORPHAN, _C_NTOK: S.E_MANIFEST_NTOK, _C_EMPTY: S.E_EMPTY_DOC}

CANDIDATE_SCHEMA = pa.schema(
    [
        ("h", pa.uint64()),
        ("loc", pa.int64()),
        ("n_tok", pa.int64()),
        ("exp_n_tok", pa.int64()),
        ("cand", pa.int8()),
    ]
)


def _tag_seq_factory(part_index: dict[str, int], num_buckets: int):
    def tag(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].combine_chunks()
        valid = pc.fill_null(
            pc.and_(pc.is_valid(did), pc.not_equal(did, pa.scalar(""))), False
        )
        batch = batch.filter(valid)  # null/empty doc_ids already got E13
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int32()),
                    "h": pa.array([], type=pa.uint64()),
                    "loc": pa.array([], type=pa.int64()),
                    "n_tok": pa.array([], type=pa.int64()),
                }
            )
        h = hash_strings(batch["doc_id"].combine_chunks())
        pidx = np.fromiter(
            (part_index[p] for p in batch["part"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        loc = (pidx << ROW_BITS) | batch["row_index"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                "h": pa.array(h),
                "loc": pa.array(loc),
                "n_tok": pa.array(
                    batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    return tag


def _tag_manifest_factory(num_buckets: int):
    def tag(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch["doc_id"].combine_chunks())
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                "h": pa.array(h),
                "loc": pa.array(np.full(batch.num_rows, MANIFEST_LOC)),
                "n_tok": pa.array(
                    batch["expected_n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    return tag


def _bucket_candidates(g: pa.Table) -> pa.Table:
    """Pure-numpy run-length analysis of one bucket sorted by hash."""
    h = g["h"].to_numpy(zero_copy_only=False)
    loc = g["loc"].to_numpy(zero_copy_only=False)
    ntok = g["n_tok"].to_numpy(zero_copy_only=False)
    # sort by hash, then loc (manifest rows loc=-1 first), then n_tok — the
    # n_tok tiebreak makes the "expected" value deterministic (the minimum)
    # even if the manifest pathologically contains duplicate doc_ids with
    # conflicting expectations, regardless of shard arrival order
    order = np.lexsort((ntok, loc, h))
    h, loc, ntok = h[order], loc[order], ntok[order]
    n = len(h)
    if n == 0:
        return CANDIDATE_SCHEMA.empty_table()
    new_run = np.r_[True, h[1:] != h[:-1]]
    run_id = np.cumsum(new_run) - 1
    n_runs = run_id[-1] + 1
    is_m = loc == MANIFEST_LOC
    is_s = ~is_m
    m_per_run = np.bincount(run_id[is_m], minlength=n_runs)
    s_per_run = np.bincount(run_id[is_s], minlength=n_runs)
    out_h, out_loc, out_ntok, out_exp, out_cand = [], [], [], [], []

    # E80: duplicate seq rows — all but the first seq row of a run (order by
    # loc within run → first = smallest (part, row_index))
    s_idx = np.flatnonzero(is_s)
    if len(s_idx):
        first_s_of_run = np.r_[True, run_id[s_idx][1:] != run_id[s_idx][:-1]]
        dup_idx = s_idx[~first_s_of_run]
        if len(dup_idx):
            out_h.append(h[dup_idx]); out_loc.append(loc[dup_idx])
            out_ntok.append(ntok[dup_idx])
            out_exp.append(np.full(len(dup_idx), -1, dtype=np.int64))
            out_cand.append(np.full(len(dup_idx), _C_DUP, dtype=np.int8))
            # the kept first row of each dup run rides along as the
            # string-verification reference (recovered, never emitted)
            dup_runs = np.unique(run_id[dup_idx])
            ref_idx = s_idx[first_s_of_run][
                np.isin(run_id[s_idx[first_s_of_run]], dup_runs)
            ]
            out_h.append(h[ref_idx]); out_loc.append(loc[ref_idx])
            out_ntok.append(ntok[ref_idx])
            out_exp.append(np.full(len(ref_idx), -1, dtype=np.int64))
            out_cand.append(np.full(len(ref_idx), _C_DUPREF, dtype=np.int8))
    has_manifest = bool(is_m.any())
    if has_manifest:
        # expected n_tok of each run = n_tok of its first row when that row
        # is a manifest row (manifest rows sort first within a run)
        run_first = np.flatnonzero(new_run)
        run_has_m = m_per_run > 0
        run_exp = np.where(run_has_m, ntok[run_first], -1)
        # E71: seq rows in runs with no manifest row
        orphan_idx = s_idx[~run_has_m[run_id[s_idx]]]
        if len(orphan_idx):
            out_h.append(h[orphan_idx]); out_loc.append(loc[orphan_idx])
            out_ntok.append(ntok[orphan_idx])
            out_exp.append(np.full(len(orphan_idx), -1, dtype=np.int64))
            out_cand.append(np.full(len(orphan_idx), _C_ORPHAN, dtype=np.int8))
        # E72: seq rows whose n_tok != the run's manifest expectation
        exp_of_s = run_exp[run_id[s_idx]]
        bad = (exp_of_s >= 0) & (ntok[s_idx] != exp_of_s)
        bad_idx = s_idx[bad]
        if len(bad_idx):
            out_h.append(h[bad_idx]); out_loc.append(loc[bad_idx])
            out_ntok.append(ntok[bad_idx]); out_exp.append(exp_of_s[bad])
            out_cand.append(np.full(len(bad_idx), _C_NTOK, dtype=np.int8))
        # E701: manifest-only runs (one candidate per run)
        empty_runs = np.flatnonzero(run_has_m & (s_per_run == 0))
        if len(empty_runs):
            fi = run_first[empty_runs]
            out_h.append(h[fi]); out_loc.append(loc[fi])
            out_ntok.append(np.full(len(fi), -1, dtype=np.int64))
            out_exp.append(ntok[fi])
            out_cand.append(np.full(len(fi), _C_EMPTY, dtype=np.int8))
    if not out_h:
        return CANDIDATE_SCHEMA.empty_table()
    return pa.table(
        {
            "h": pa.array(np.concatenate(out_h)),
            "loc": pa.array(np.concatenate(out_loc)),
            "n_tok": pa.array(np.concatenate(out_ntok)),
            "exp_n_tok": pa.array(np.concatenate(out_exp)),
            "cand": pa.array(np.concatenate(out_cand)),
        },
        schema=CANDIDATE_SCHEMA,
    )


def _recover_violations(
    cands: pa.Table,
    files: list[str],
    manifest_path: str | None,
    batch_rows: int,
) -> pa.Table:
    """Materialize exact violation rows for the (rare) candidates: targeted
    re-read of doc_id for affected (part, row_index) positions + exact
    string verification within dup groups (kills hash-collision FPs)."""
    if cands.num_rows == 0:
        return S.VIOLATIONS_SCHEMA.empty_table()
    loc = cands["loc"].to_numpy(zero_copy_only=False)
    cand = cands["cand"].to_numpy(zero_copy_only=False)
    h = cands["h"].to_numpy(zero_copy_only=False)
    ntok = cands["n_tok"].to_numpy(zero_copy_only=False)
    exp = cands["exp_n_tok"].to_numpy(zero_copy_only=False)
    seq_mask = loc != MANIFEST_LOC
    pidx = (loc[seq_mask] >> ROW_BITS).astype(np.int64)
    ridx = (loc[seq_mask] & ((np.int64(1) << ROW_BITS) - 1)).astype(np.int64)
    doc_ids = np.empty(len(loc), dtype=object)
    parts = np.empty(len(loc), dtype=object)
    rows_out = np.where(seq_mask, 0, -1).astype(np.int64)
    seq_pos = np.flatnonzero(seq_mask)
    rows_out[seq_pos] = ridx
    for p in np.unique(pidx):
        sel = seq_pos[pidx == p]
        rr = ridx[pidx == p]
        col = pq.read_table(files[int(p)], columns=["doc_id"])["doc_id"]
        vals = col.take(pa.array(rr)).to_pylist()
        doc_ids[sel] = vals
        parts[sel] = part_of(files[int(p)])
    man_pos = np.flatnonzero(~seq_mask)
    # manifest doc_ids by hash: needed both to name E701 violations and to
    # string-verify E72 candidates against the manifest row they hashed to
    need_manifest = len(man_pos) or bool((cand == _C_NTOK).any())
    man_by_hash: dict[int, str] = {}
    if need_manifest and manifest_path is not None:
        mt = pq.read_table(manifest_path, columns=["doc_id"])
        mh = hash_strings(mt["doc_id"].combine_chunks())
        ids = mt["doc_id"].to_pylist()
        man_by_hash = {int(k): ids[i] for i, k in enumerate(mh)}
    if len(man_pos):
        doc_ids[man_pos] = [man_by_hash.get(int(k)) for k in h[man_pos]]
        parts[man_pos] = MANIFEST_PART

    # E80 string-verification references: hash → kept row's doc_id
    ref_mask = cand == _C_DUPREF
    dup_ref = {int(k): doc_ids[i] for i, k in zip(np.flatnonzero(ref_mask), h[ref_mask])}

    rows = {k: [] for k in ("part", "row_index", "doc_id", "code", "column", "message")}
    for i in range(len(loc)):
        c = int(cand[i])
        if c == _C_DUPREF:
            continue  # verification reference only
        code = _CODE_OF[c]
        d = doc_ids[i]
        if d is None:
            continue
        if code == S.E_DUP_DOCID:
            # exact string comparison vs the kept row — a 64-bit hash
            # collision between distinct doc_ids is dropped here, not
            # reported as a false duplicate. If the candidate cap severed
            # the reference row from this candidate, fall back to trusting
            # the hash (the pre-verification behavior) instead of silently
            # dropping every capped duplicate.
            ref = dup_ref.get(int(h[i]))
            if ref is not None and ref != d:
                continue
            detail = f"duplicate doc_id {d!r}"
            column = "doc_id"
        elif code == S.E_ORPHAN:
            detail = f"doc_id {d!r} not in manifest"
            column = "doc_id"
        elif code == S.E_MANIFEST_NTOK:
            # exact string comparison vs the manifest row at this hash —
            # collisions would otherwise borrow a foreign expectation
            if man_by_hash.get(int(h[i])) != d:
                continue
            detail = f"n_tok {int(ntok[i])} != manifest expected {int(exp[i])}"
            column = "n_tok"
        else:  # E701
            detail = f"manifest doc_id {d!r} has no sequence rows"
            column = "doc_id"
        rows["part"].append(parts[i])
        rows["row_index"].append(int(rows_out[i]))
        rows["doc_id"].append(d)
        rows["code"].append(code)
        rows["column"].append(column)
        rows["message"].append(S.format_message(code, detail))
    return pa.Table.from_pydict(rows, schema=S.VIOLATIONS_SCHEMA)


def _split_by_bucket(t: pa.Table, num_buckets: int) -> list[pa.Table]:
    b = t["bucket"].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    bs = b[order]
    bounds = np.searchsorted(bs, np.arange(num_buckets + 1))
    sorted_t = t.take(pa.array(order)).drop_columns(["bucket"])
    return [sorted_t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(num_buckets)]


@ray.remote
def _map_seq_shard(paths: list[str], part_idxs: list[int], num_buckets: int, batch_rows):
    """Map side of the exchange: read a GROUP of partition files' scalar
    columns, hash/tag, split by bucket → num_buckets separate returns
    (reducers fetch only their shard from the object store). Grouping
    several files per task amortizes the per-return plasma-object cost —
    measured 0.7 s of pure object overhead at 64 files × 32 returns."""
    outs: list[list[pa.Table]] = [[] for _ in range(num_buckets)]
    for path, part_idx in zip(paths, part_idxs):
        tag = _tag_seq_factory({part_of(path): part_idx}, num_buckets)
        br = batch_rows
        if br == "auto":
            from fastpasta_ray.sources.parquet import auto_batch_rows

            br = auto_batch_rows(path)
        pf = pq.ParquetFile(path)
        row_off = 0
        for rb in pf.iter_batches(batch_size=br, columns=["doc_id", "n_tok"], use_threads=False):
            t = pa.Table.from_batches([rb])
            n = t.num_rows
            batch = pa.table(
                {
                    "part": pa.array([part_of(path)] * n, type=pa.string()),
                    "row_index": pa.array(np.arange(row_off, row_off + n), type=pa.int64()),
                    "doc_id": t["doc_id"],
                    "n_tok": t["n_tok"],
                }
            )
            row_off += n
            for i, s in enumerate(_split_by_bucket(tag(batch), num_buckets)):
                if s.num_rows:
                    outs[i].append(s)
    empty = pa.table(
        {
            "h": pa.array([], type=pa.uint64()),
            "loc": pa.array([], type=pa.int64()),
            "n_tok": pa.array([], type=pa.int64()),
        }
    )
    return tuple(pa.concat_tables(o) if o else empty for o in outs)


@ray.remote
def _map_manifest_shard(
    path: str, row_groups: list[int], num_buckets: int,
    slice_k: int = 0, slice_n: int = 1,
):
    """``slice_k/slice_n``: process only the k-th of n row slices of these
    row groups — parallelism beyond row-group granularity (a manifest with
    few huge row groups would otherwise serialize the hash work; the
    redundant decode is cheap next to the siphash pass)."""
    tag = _tag_manifest_factory(num_buckets)
    pf = pq.ParquetFile(path)
    t = pf.read_row_groups(row_groups, columns=["doc_id", "expected_n_tok"], use_threads=False)
    if slice_n > 1:
        n = t.num_rows
        lo = (n * slice_k) // slice_n
        hi = (n * (slice_k + 1)) // slice_n
        t = t.slice(lo, hi - lo)
    outs = _split_by_bucket(tag(t), num_buckets)
    return tuple(outs)


@ray.remote
def _reduce_bucket(*shards: pa.Table) -> pa.Table:
    nonempty = [s for s in shards if s.num_rows]
    if not nonempty:  # a bucket can be entirely empty on small inputs
        return CANDIDATE_SCHEMA.empty_table()
    return _bucket_candidates(pa.concat_tables(nonempty))


@ray.remote
def _reduce_bucket_packed(b: int, *map_outputs) -> pa.Table:
    """Packed-mode reduce: each map output is ONE plasma object (the whole
    bucket tuple); the reducer indexes its bucket. On a single node plasma
    reads are zero-copy mmaps, so 'fetching everything' costs nothing —
    per-bucket returns only pay off across nodes."""
    shards = [t[b] for t in map_outputs]
    nonempty = [s for s in shards if s.num_rows]
    if not nonempty:
        return CANDIDATE_SCHEMA.empty_table()
    return _bucket_candidates(pa.concat_tables(nonempty))


def key_checks_dataset(
    files: list[str],
    manifest_path: str | None,
    *,
    num_buckets: int = 64,
    batch_rows: int | str = 8192,
    max_candidates_per_bucket: int = 100_000,
) -> "ray.data.Dataset":
    """Dataset-native key checks: returns a lazy VIOLATIONS_SCHEMA dataset.

    Used by run_check so the key-check exchange and the pass-1 payload scan
    execute inside ONE streaming execution (``union``) — the executor
    schedules both with backpressure, overlapping them without the
    scheduler thrash a raw-task exchange causes next to a running Dataset.
    The bucket reduce both detects candidates AND recovers the doc_id
    strings for its own (rare, capped) violations — fully distributed, no
    driver-side recovery step."""
    part_index = {part_of(f): i for i, f in enumerate(files)}
    from fastpasta_ray.sources.parquet import read_sequences

    seq = read_sequences(files, columns=["doc_id", "n_tok"], batch_rows=batch_rows)
    tagged = seq.map_batches(
        _tag_seq_factory(part_index, num_buckets), batch_format="pyarrow"
    )
    if manifest_path is not None:
        man = ray.data.read_parquet(
            manifest_path, override_num_blocks=max(len(files), 8)
        ).map_batches(_tag_manifest_factory(num_buckets), batch_format="pyarrow")
        tagged = tagged.union(man)
    files_r = list(files)

    def bucket_to_violations(g: pa.Table) -> pa.Table:
        cands = _bucket_candidates(g)
        if cands.num_rows > max_candidates_per_bucket:
            cands = cands.slice(0, max_candidates_per_bucket)
        return _recover_violations(cands, files_r, manifest_path, batch_rows)

    return tagged.groupby("bucket").map_groups(
        bucket_to_violations, batch_format="pyarrow"
    )


def key_checks(
    files: list[str],
    manifest_path: str | None,
    *,
    num_buckets: int = 64,
    batch_rows: int = 8192,
    max_candidates: int = 1_000_000,
) -> pa.Table:
    """All four key checks in ONE slim hash exchange + targeted recovery.

    The exchange is a direct map/reduce over raw Ray tasks (the R8
    dispatcher-shuffle): map tasks split each partition's tagged rows into
    ``num_buckets`` object-store shards (``num_returns``), one reduce task
    per bucket concatenates its shards and runs the vectorized candidate
    scan. Chosen over ``Dataset.groupby`` deliberately: the sort-based
    shuffle's per-block constant costs dominate at skinny-row sizes, while
    this exchange moves each byte exactly once. Returns the materialized
    violations table (small, capped)."""
    # group files per map task so task count ≈ CPU count: per-return plasma
    # objects dominate wall time when tasks are tiny (2048 returns at 64
    # files × 32 buckets cost ~0.7 s of pure overhead); at cluster scale
    # the group size naturally grows with files-per-core
    from fastpasta_ray.sources.parquet import cluster_cpus

    cpus = cluster_cpus()
    group = max(1, (len(files) + cpus - 1) // cpus)
    # exchange mode by estimated size: "packed" returns each map output as
    # ONE plasma object (zero-copy mmap reads on-node — 2.3× faster at
    # bench scale where per-return object overhead dominates); "slim"
    # returns per-bucket shards so multi-node reducers fetch ONLY their
    # bucket — the 100-TB path (each byte crosses the wire once)
    est_rows = 0
    for f in files:
        try:
            est_rows += pq.ParquetFile(f).metadata.num_rows
        except Exception:
            est_rows = 1 << 62
            break
    packed = est_rows * 24 <= (1 << 30)
    returns = 1 if packed else num_buckets
    maps = [
        _map_seq_shard.options(num_returns=returns).remote(
            files[s : s + group], list(range(s, min(s + group, len(files)))),
            num_buckets, batch_rows,
        )
        for s in range(0, len(files), group)
    ]
    if manifest_path is not None:
        pf = pq.ParquetFile(manifest_path)
        n_rg = pf.metadata.num_row_groups
        chunk = max(1, n_rg // max(cpus, 1))
        n_chunks = (n_rg + chunk - 1) // chunk
        # slice inside row groups when there are too few of them to keep
        # the cores busy (hash work would serialize on 1-2 giant groups)
        slices = max(1, (cpus // 2) // max(n_chunks, 1))
        for s in range(0, n_rg, chunk):
            rgs = list(range(s, min(s + chunk, n_rg)))
            for k in range(slices):
                maps.append(
                    _map_manifest_shard.options(num_returns=returns).remote(
                        manifest_path, rgs, num_buckets, k, slices
                    )
                )
    if packed:
        cand_refs = [
            _reduce_bucket_packed.remote(b, *maps) for b in range(num_buckets)
        ]
    else:
        # normalize: num_returns=1 yields a bare ref, else a list of refs
        shard_lists = [m if isinstance(m, list) else [m] for m in maps]
        cand_refs = [
            _reduce_bucket.remote(*[sl[b] for sl in shard_lists])
            for b in range(num_buckets)
        ]
    cands = pa.concat_tables([t for t in ray.get(cand_refs)])
    if cands.num_rows > max_candidates:
        cands = cands.slice(0, max_candidates)
    return _recover_violations(cands, files, manifest_path, batch_rows)
