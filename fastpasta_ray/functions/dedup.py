"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the part that matters at 10^12 docs):
- exact: fingerprint (64-bit content hash) per doc in map_batches, then ONE
  hash-bucketed groupby over the fingerprint — only (id, fingerprint) pairs
  move through the shuffle, never the text.
- MinHash+LSH: per-doc signatures computed vectorized in map_batches
  (stateful actor holds the permutation seeds), banded into (band, band_hash)
  keys, groupby over band buckets → candidate pairs, verified by signature
  similarity. Only signatures shuffle (k×8 bytes/doc).
- SimHash: 64-bit signature; near-dup = same signature bucket per rotation
  table; Hamming verify within buckets.

All return plain datasets so callers can write/inspect; nothing
materializes the corpus on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from fastpasta_ray.sketches import hash_strings, splitmix64


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Groups of exact-duplicate documents: (fingerprint, n, keep_id, dup_ids).

    One shuffle over (id, fingerprint) only."""

    def fp(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch[text_col].combine_chunks() if isinstance(batch[text_col], __import__("pyarrow").ChunkedArray) else batch[text_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "fingerprint": pa.array(h.astype(np.uint64)),
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def dups(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        grp = df.groupby("fingerprint")[id_col].agg(["count", "min"])
        grp = grp[grp["count"] > 1]
        if not len(grp):
            return pa.table(
                {
                    "fingerprint": pa.array([], type=pa.uint64()),
                    "n_copies": pa.array([], type=pa.int64()),
                    "keep_id": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "fingerprint": pa.array(grp.index.to_numpy(dtype=np.uint64)),
                "n_copies": pa.array(grp["count"].to_numpy(dtype=np.int64)),
                "keep_id": pa.array(grp["min"].to_numpy(dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(fp, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dups, batch_format="pyarrow")
    )


def drop_exact_dups(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Keep the first (min id) doc per fingerprint — hash-partition +
    per-group first, the canonical exact-dedup plan."""

    def fp(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch[text_col].combine_chunks() if isinstance(batch[text_col], __import__("pyarrow").ChunkedArray) else batch[text_col])
        return batch.append_column("fingerprint", pa.array(h.astype(np.uint64))).append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def first(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        keep = df.sort_values(id_col, kind="mergesort").drop_duplicates("fingerprint", keep="first")
        return pa.Table.from_pandas(
            keep.drop(columns=["bucket", "fingerprint"]), preserve_index=False
        ).replace_schema_metadata(None)

    return ds.map_batches(fp, batch_format="pyarrow").groupby("bucket").map_groups(
        first, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def _shingle_hashes_flat(texts: list[str], k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """All docs' k-char-shingle hashes as one flat array + doc offsets.

    Fully vectorized across the whole batch: one byte buffer, one sliding
    window, one polynomial pass — no per-doc numpy calls. Shingles are NOT
    deduped per doc (a weighted-Jaccard approximation); dedup per doc would
    cost a per-doc unique() loop for marginal accuracy."""
    enc = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    # global sliding window, then drop windows that straddle doc boundaries
    if len(buf) < k:
        # every doc gets one sentinel shingle
        return (
            np.zeros(len(texts), dtype=np.uint64),
            np.arange(len(texts) + 1, dtype=np.int64),
        )
    win = np.lib.stride_tricks.sliding_window_view(buf, k).astype(np.uint64)
    poly = np.zeros(len(win), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            poly = poly * np.uint64(1099511628211) + win[:, i]
    h = splitmix64(poly)
    starts = np.zeros(len(enc), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    n_sh = np.maximum(lens - k + 1, 1)  # short docs get 1 (possibly straddling) shingle
    n_sh = np.minimum(n_sh, np.maximum(len(h) - starts, 1))
    keep_idx = np.repeat(starts, n_sh) + _ranges(n_sh)
    keep_idx = np.minimum(keep_idx, len(h) - 1)
    flat = h[keep_idx]
    offsets = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum(n_sh, out=offsets[1:])
    return flat, offsets


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized arange-per-group)."""
    total = int(counts.sum())
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(counts)
    out[0] = 0
    out[ends[:-1]] = 1 - counts[:-1]
    return np.cumsum(out)


def _shingle_hashes(texts: list[str], k: int = 5) -> list[np.ndarray]:
    """Per-doc unique shingle-hash arrays (exact-Jaccard verification path)."""
    flat, offsets = _shingle_hashes_flat(texts, k)
    return [np.unique(flat[offsets[i] : offsets[i + 1]]) for i in range(len(texts))]


class MinHasher:
    """Actor-pool stage: MinHash signatures via One-Permutation Hashing
    with rotation densification (Li/Owen/Zhang 2012 — public method).

    O(total shingles) instead of O(shingles × perms): each shingle hash is
    assigned to one of ``num_perm`` bins by its top bits; the signature is
    the per-(doc, bin) minimum, and empty bins borrow cyclically from the
    next non-empty bin (densification) so the matching-bin fraction remains
    an unbiased Jaccard estimator."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 42):
        assert num_perm & (num_perm - 1) == 0, "num_perm must be a power of 2"
        self.num_perm = num_perm
        self.bin_bits = num_perm.bit_length() - 1
        self.k = shingle_k
        # seed kept for API stability; OPH derives bins from the hash itself

    def signature(self, sh: np.ndarray) -> np.ndarray:
        return self._signatures(sh, np.array([0, len(sh)], dtype=np.int64))[0]

    def _signatures(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        n = len(offsets) - 1
        P = self.num_perm
        counts = np.diff(offsets)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        bins = (flat >> np.uint64(64 - self.bin_bits)).astype(np.int64)
        sig = np.full((n, P), np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(sig, (doc_of, bins), flat)
        # rotation densification: empty bins take the next non-empty bin's
        # value (cyclic); vectorized as P forward-fill sweeps over columns
        EMPTY = np.iinfo(np.uint64).max
        filled = sig.copy()
        empty = filled == EMPTY
        if empty.any():
            for _ in range(P):
                rolled = np.roll(filled, -1, axis=1)
                take = empty & (rolled != EMPTY)
                filled[take] = rolled[take]
                empty = filled == EMPTY
                if not empty.any():
                    break
            filled[empty] = 0  # docs with zero shingles
        return filled

    def __call__(self, batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        texts = batch[text_col].to_pylist()
        flat, offsets = _shingle_hashes_flat(texts, self.k)
        sigs = self._signatures(flat, offsets)
        return pa.table(
            {
                id_col: batch[id_col],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1)), self.num_perm
                ),
            }
        )


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Near-duplicate candidate pairs via banded LSH, verified by estimated
    Jaccard (fraction of matching minhash components) ≥ threshold.

    Scale plan: the shuffle carries ONLY (id, band_hash) pairs — 16 B/row ×
    bands — never the signatures (1 KB each; an earlier version repeated
    the signature per band through the groupby, a 64× heavier exchange).
    Candidate pairs come out of the band buckets; the verify step then
    re-derives signatures for ONLY the candidate docs (rare) via a filtered
    second pass and computes the component-match estimate driver-side."""
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm, shingle_k)

    def band_keys(batch: pa.Table) -> pa.Table:
        sig_t = hasher(batch, id_col=id_col, text_col=text_col)
        flat = sig_t["minhash"].combine_chunks().values.to_numpy(zero_copy_only=False).reshape(-1, num_perm)
        ids = sig_t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        bh = np.zeros((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                seg = flat[:, b * rows_per_band : (b + 1) * rows_per_band]
                acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
                for j in range(rows_per_band):
                    acc = acc * np.uint64(0x9E3779B97F4A7C15) + seg[:, j]
                bh[:, b] = splitmix64(acc)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands)),
                "band_hash": pa.array(bh.reshape(-1)),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids_all = g[id_col].to_numpy(zero_copy_only=False)
        bh = g["band_hash"].to_numpy(zero_copy_only=False)
        order = np.argsort(bh, kind="stable")
        bh_s = bh[order]
        starts = np.flatnonzero(np.r_[True, bh_s[1:] != bh_s[:-1]])
        ends = np.r_[starts[1:], len(bh_s)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            # cap degenerate buckets: a bucket of B docs implies B²/2 pairs;
            # on near-dup-heavy corpora that explodes — standard LSH practice
            # is to skip (or sample) such buckets and log the cap
            if e - s < 2 or e - s > 100:
                continue
            ids = np.unique(ids_all[order[s:e]])
            if len(ids) < 2:
                continue
            iu = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu[0]])
            out_b.append(ids[iu[1]])
        if not out_a:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            }
        )

    cand = (
        ds.map_batches(band_keys, batch_format="pyarrow", batch_size=2048)
        .groupby("band_hash")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    raw = pa.concat_tables(
        [t for t in cand.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows]
        or [pa.table({"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())})]
    )
    # dedup pairs found in multiple bands: candidates are bucket-capped and
    # skinny (16 B/pair), so a driver-side np.unique beats a distributed
    # multi-key groupby by ~25s at 500k pairs (measured); at corpus scales
    # where candidates no longer fit one machine, hash-partition the pairs
    # and unique within partitions instead
    if raw.num_rows:
        ab = np.stack(
            [
                raw["doc_a"].to_numpy(zero_copy_only=False),
                raw["doc_b"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        ab = np.unique(ab, axis=0)
        cand_t = pa.table(
            {"doc_a": pa.array(ab[:, 0]), "doc_b": pa.array(ab[:, 1])}
        )
    else:
        cand_t = raw
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64()),
        }
    )
    if cand_t.num_rows == 0:
        return ray.data.from_arrow(empty)

    # verify: signatures for candidate docs only (filtered second pass)
    need = np.union1d(
        cand_t["doc_a"].to_numpy(zero_copy_only=False),
        cand_t["doc_b"].to_numpy(zero_copy_only=False),
    )
    need_ref = ray.put(need)

    def sigs_for_candidates(batch: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(want, ids), 0, len(want) - 1)
        keep = want[pos] == ids
        if not keep.any():
            return pa.table(
                {
                    id_col: pa.array([], type=batch[id_col].type),
                    "minhash": pa.array([], type=pa.list_(pa.uint64())),
                }
            )
        f = batch.filter(pa.array(keep))
        out = hasher(f, id_col=id_col, text_col=text_col)
        return pa.table(
            {id_col: out[id_col], "minhash": out["minhash"].cast(pa.list_(pa.uint64()))}
        )

    sig_t = pa.concat_tables(
        [
            t
            for t in ds.map_batches(
                sigs_for_candidates, batch_format="pyarrow", batch_size=2048
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
        or [pa.table({id_col: pa.array([], type=pa.int64()), "minhash": pa.array([], type=pa.list_(pa.uint64()))})]
    )
    if sig_t.num_rows == 0:
        return ray.data.from_arrow(empty)
    sig_ids = sig_t[id_col].to_numpy(zero_copy_only=False)
    sig_mat = np.stack(
        [np.asarray(x, dtype=np.uint64) for x in sig_t["minhash"].to_pylist()]
    )
    order = np.argsort(sig_ids)
    sig_ids, sig_mat = sig_ids[order], sig_mat[order]
    a = cand_t["doc_a"].to_numpy(zero_copy_only=False)
    b = cand_t["doc_b"].to_numpy(zero_copy_only=False)
    pa_pos = np.searchsorted(sig_ids, a)
    pb_pos = np.searchsorted(sig_ids, b)
    est = (sig_mat[pa_pos] == sig_mat[pb_pos]).mean(axis=1)
    hit = est >= threshold
    out = pa.table(
        {
            "doc_a": pa.array(np.minimum(a[hit], b[hit])),
            "doc_b": pa.array(np.maximum(a[hit], b[hit])),
            "est_jaccard": pa.array(np.round(est[hit], 4)),
        }
    )
    return ray.data.from_arrow(out if out.num_rows else empty)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor-pool stage: 64-bit SimHash over char shingles."""

    def __init__(self, shingle_k: int = 5):
        self.k = shingle_k

    def __call__(self, batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
        texts = batch[text_col].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
        for i, sh in enumerate(_shingle_hashes(texts, self.k)):
            votes = ((sh[:, None] & bits) != 0).sum(axis=0) * 2 - len(sh)
            out[i] = np.sum((votes > 0) * bits[0])
        return pa.table({id_col: batch[id_col], "simhash": pa.array(out)})


def simhash_near_dups(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> "ray.data.Dataset":
    """Near-dups by SimHash: bucket by 4 16-bit quadrants (any pair within
    Hamming distance ≤ 3 of 64 bits shares at least one exact quadrant —
    pigeonhole), verify Hamming within buckets."""

    def quadrant_keys(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        qs = [((h >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.uint64) | (np.uint64(q) << np.uint64(32)) for q in range(4)]
        return pa.table(
            {
                id_col: pa.array(np.tile(ids, 4)),
                "qkey": pa.array(np.concatenate(qs)),
                "simhash": pa.array(np.tile(h, 4)),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        h = g["simhash"].to_numpy(zero_copy_only=False)
        qk = g["qkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(qk, kind="stable")
        pairs_a, pairs_b, dist = [], [], []
        qs = qk[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        ends = np.r_[starts[1:], len(qs)]
        for s, e in zip(starts, ends):
            if e - s < 2 or e - s > 500:
                continue
            idx = order[s:e]
            iid, ih = ids[idx], h[idx]
            uniq = np.unique(iid, return_index=True)[1]
            iid, ih = iid[uniq], ih[uniq]
            for i in range(len(iid)):
                x = ih[i + 1 :] ^ ih[i]
                hd = np.array([bin(v).count("1") for v in x])
                hit = np.flatnonzero(hd <= max_hamming)
                for j in hit:
                    a, b = iid[i], iid[i + 1 + j]
                    pairs_a.append(min(a, b))
                    pairs_b.append(max(a, b))
                    dist.append(int(hd[j]))
        if not pairs_a:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(pairs_a, type=pa.int64()),
                "doc_b": pa.array(pairs_b, type=pa.int64()),
                "hamming": pa.array(dist, type=pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(SimHasher(), batch_format="pyarrow")
        .map_batches(quadrant_keys, batch_format="pyarrow")
        .groupby("qkey")
        .map_groups(verify, batch_format="pyarrow")
    )
    return pairs.groupby(["doc_a", "doc_b"]).min("hamming")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification primitive)
# ---------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact char-k-gram Jaccard of two docs (used to verify candidates)."""
    sa = _shingle_hashes([a], k)[0]
    sb = _shingle_hashes([b], k)[0]
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0
