"""Property-based tests (hypothesis): the vectorized implementations must
agree with naive per-row reference implementations on arbitrary inputs.

Targets the trickiest run-length / offset arithmetic:
- _bucket_candidates (key-check run analysis over sorted hashes)
- IntHistogram.quantile (quantile_disc convention)
- _shingle_hashes_flat (per-doc shingle windows over a concatenated buffer)
- grammar checks (BOS/EOS/interior-pad rules)
- RunningState (cross-batch monotonic scan)
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# deterministic example generation: the driver's per-round verify must not
# be able to fail on a never-before-seen random example — exploratory
# (randomized) runs can be re-enabled locally with HYPOTHESIS_PROFILE=explore
settings.register_profile("ci", derandomize=True)
settings.register_profile("explore", derandomize=False)
settings.register_profile("deep", derandomize=False, max_examples=2000, deadline=None)
import os as _os

settings.load_profile(_os.environ.get("HYPOTHESIS_PROFILE", "ci"))

from fastpasta_ray.checks.grammar import GrammarConfig, run_grammar_checks
from fastpasta_ray.checks.key_checks import MANIFEST_LOC, _bucket_candidates
from fastpasta_ray.checks.running_checks import RunningState
from fastpasta_ray.functions.dedup import _shingle_hashes_flat
from fastpasta_ray.sketches import IntHistogram


# ---------------------------------------------------------------------------
# _bucket_candidates vs naive dict-based reference
# ---------------------------------------------------------------------------

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 7),            # hash (small domain to force runs)
        st.integers(-1, 50),          # loc; -1 = manifest row
        st.integers(0, 3),            # n_tok
    ),
    max_size=40,
)


def naive_candidates(rows):
    """Per-key reference: dup = every seq row beyond the first (by loc),
    orphan = seq rows of keys with no manifest row (only when ANY manifest
    row exists), ntok = seq rows whose n_tok != the key's manifest n_tok
    (first manifest row by insertion after sorting by loc — our contract:
    manifest rows sort first, expected = first row of the run), empty =
    manifest-only keys."""
    from collections import defaultdict

    byh = defaultdict(list)
    for h, loc, ntok in rows:
        byh[h].append((loc, ntok))
    has_manifest = any(loc == -1 for _, locs in byh.items() for loc, _ in locs)
    dup = set()
    orphan = set()
    ntok_bad = set()
    empty = set()
    for h, items in byh.items():
        items = sorted(items)
        seq = [(l, n) for l, n in items if l != -1]
        man = [(l, n) for l, n in items if l == -1]
        for l, n in seq[1:]:
            dup.add((h, l))
        if has_manifest:
            if seq and not man:
                for l, n in seq:
                    orphan.add((h, l))
            if man and seq:
                exp = min(n for _, n in man)  # deterministic: min expectation wins
                for l, n in seq:
                    if n != exp:
                        ntok_bad.add((h, l))
            if man and not seq:
                empty.add(h)
    return dup, orphan, ntok_bad, empty


@settings(max_examples=200, deadline=None)
@given(rows_strategy)
def test_bucket_candidates_match_naive(rows):
    # dedupe (h, loc) pairs for seq rows: identical locs are physically
    # impossible (loc encodes file+row); keep first occurrence
    seen = set()
    uniq = []
    for h, loc, ntok in rows:
        if loc != -1:
            if (h, loc) in seen:
                continue
            seen.add((h, loc))
        uniq.append((h, loc, ntok))
    rows = uniq
    t = pa.table(
        {
            "h": pa.array([np.uint64(r[0]) for r in rows], type=pa.uint64()),
            "loc": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_tok": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    out = _bucket_candidates(t)
    got = {
        1: set(),  # dup
        2: set(),  # orphan
        3: set(),  # ntok
        4: set(),  # empty
        5: set(),  # dup-ref (verification rider, not a violation)
        6: set(),  # manifest-ref (E72 verification rider, not a violation)
    }
    for h, loc, cand in zip(
        out["h"].to_pylist(), out["loc"].to_pylist(), out["cand"].to_pylist()
    ):
        got[cand].add((h, loc) if cand not in (4, 6) else h)
    # every dup run must carry exactly one reference row (the kept first)
    assert {h for h, _ in got[5]} == {h for h, _ in got[1]}
    # every run with an E72 candidate carries its manifest-reference rider
    assert got[6] == {h for h, _ in got[3]}
    dup, orphan, ntok_bad, empty = naive_candidates(rows)
    assert got[1] == dup
    assert got[2] == orphan
    assert got[3] == ntok_bad
    assert got[4] == empty


# ---------------------------------------------------------------------------
# IntHistogram.quantile == quantile_disc convention on arbitrary multisets
# ---------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 100), min_size=1, max_size=200),
       st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.99, 1.0]))
def test_int_histogram_quantile_matches_sorted_index(vals, q):
    import math

    h = IntHistogram()
    h.add(np.array(vals))
    s = sorted(vals)
    expect = s[max(0, min(len(s) - 1, math.ceil(q * len(s)) - 1))]
    assert h.quantile(q) == expect


# ---------------------------------------------------------------------------
# _shingle_hashes_flat: per-doc segments equal per-doc computation
# ---------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=30), min_size=1, max_size=8))
def test_shingle_flat_segments_match_per_doc(texts):
    k = 5
    flat, offsets = _shingle_hashes_flat(texts, k)
    assert len(offsets) == len(texts) + 1
    assert offsets[-1] == len(flat)
    for i, t in enumerate(texts):
        seg = flat[offsets[i] : offsets[i + 1]]
        b = t.encode("utf-8")
        if len(b) >= k:
            # n_shingles = len - k + 1 and each shingle hash must equal the
            # single-doc computation
            solo, so = _shingle_hashes_flat([t], k)
            assert len(seg) == len(b) - k + 1
            assert np.array_equal(seg, solo)
        else:
            assert len(seg) == 1  # short-doc sentinel shingle


# ---------------------------------------------------------------------------
# grammar checks vs naive row loop
# ---------------------------------------------------------------------------

tokens_strategy = st.lists(
    st.one_of(st.none(), st.lists(st.integers(0, 9), max_size=6)), min_size=1, max_size=20
)


@settings(max_examples=150, deadline=None)
@given(tokens_strategy)
def test_grammar_matches_naive(token_rows):
    BOS, EOS, PAD = 1, 2, 0
    n = len(token_rows)
    batch = pa.table(
        {
            "part": pa.array(["p"] * n),
            "row_index": pa.array(range(n), type=pa.int64()),
            "doc_id": pa.array([f"d{i}" for i in range(n)]),
            "tokens": pa.array(token_rows, type=pa.list_(pa.int32())),
        }
    )
    out = run_grammar_checks(batch, GrammarConfig(BOS, EOS, PAD))
    got = {(r, c) for r, c in zip(out["row_index"].to_pylist(), out["code"].to_pylist())}
    expect = set()
    for i, toks in enumerate(token_rows):
        if toks is None or len(toks) == 0:
            continue
        if toks[0] != BOS:
            expect.add((i, "E30"))
        if toks[-1] != EOS:
            expect.add((i, "E50"))
        # interior pad: a PAD strictly before the last non-pad token
        nonpad = [j for j, t in enumerate(toks) if t != PAD]
        if nonpad:
            last_nonpad = nonpad[-1]
            if any(t == PAD for t in toks[:last_nonpad]):
                expect.add((i, "E60"))
    assert got == expect


# ---------------------------------------------------------------------------
# RunningState vs naive scan (across arbitrary batch splits)
# ---------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 20), min_size=1, max_size=30), st.integers(1, 5))
def test_running_state_matches_naive(indices, split):
    ids = [f"src/0000/{i:08d}" for i in indices]
    naive = set()
    last = None
    for pos, i in enumerate(indices):
        if last is not None and i <= last:
            naive.add(pos)
        last = i  # immediate-predecessor semantics (batch-split invariant)

    st_ = RunningState()
    got = set()
    for start in range(0, len(ids), split):
        chunk = ids[start : start + split]
        b = pa.table(
            {
                "part": pa.array(["p"] * len(chunk)),
                "row_index": pa.array(range(start, start + len(chunk)), type=pa.int64()),
                "doc_id": pa.array(chunk),
            }
        )
        v = st_.check_batch(b)
        got.update(v["row_index"].to_pylist())
    assert got == naive


# ---------------------------------------------------------------------------
# run_row_checks vs naive row loop (the core stateless pass)
# ---------------------------------------------------------------------------

row_strategy = st.tuples(
    st.one_of(st.none(), st.sampled_from(["", "bad", "web/0000/00000007", "zz1/0001/00000002"])),
    st.one_of(st.none(), st.lists(st.integers(-2, 12), max_size=5)),
    st.integers(0, 6),
    st.one_of(st.none(), st.sampled_from(["", "web", "books", "nope"])),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(row_strategy, min_size=1, max_size=25))
def test_row_checks_match_naive(rows):
    import re

    from fastpasta_ray import schema as S
    from fastpasta_ray.checks.row_checks import run_row_checks

    VOCAB = 10
    DOMAIN = ("web", "books")
    batch = pa.table(
        {
            "part": pa.array(["p"] * len(rows)),
            "row_index": pa.array(range(len(rows)), type=pa.int64()),
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([r[2] for r in rows], type=pa.int32()),
            "source": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )
    v = run_row_checks(batch, vocab=VOCAB, source_domain=DOMAIN)
    got = {(r, c) for r, c in zip(v["row_index"].to_pylist(), v["code"].to_pylist())}

    expect = set()
    pat = re.compile(S.DOC_ID_RE)
    for i, (did, toks, ntok, src) in enumerate(rows):
        if toks is None:
            expect.add((i, "E100"))
        else:
            if len(toks) != ntok:
                expect.add((i, "E10"))
            if any(t < 0 or t >= VOCAB for t in toks):
                expect.add((i, "E70"))
        if src is None or src == "":
            expect.add((i, "E40"))
        elif src not in DOMAIN:
            expect.add((i, "E41"))
        if did is None or did == "":
            expect.add((i, "E13"))
        elif not pat.match(did):
            expect.add((i, "E12"))
    assert got == expect


# ---------------------------------------------------------------------------
# round-2 machinery: popcount, word-ngram sets, SimHash vectorization,
# combo-key pigeonhole guarantee
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(0, 2**64 - 1), max_size=200))
def test_popcount64_matches_bin(xs):
    from fastpasta_ray.functions.dedup import popcount64

    a = np.array(xs, dtype=np.uint64)
    got = popcount64(a)
    exp = [bin(int(x)).count("1") for x in xs]
    assert got.tolist() == exp


words_st = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=0, max_size=12
)


@given(st.lists(words_st, min_size=1, max_size=8), st.integers(1, 4))
def test_word_ngram_sets_match_naive(docs, n):
    from fastpasta_ray.functions.dedup import word_ngram_hashes_flat

    texts = [" ".join(ws) for ws in docs]
    flat, off = word_ngram_hashes_flat(pa.array(texts, type=pa.string()), n)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        naive = {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}
        got_n = off[i + 1] - off[i]
        assert got_n == len(naive), (t, n)
        # sets are hashes — distinctness must match exactly (no collisions
        # expected at these sizes)
        assert len(np.unique(flat[off[i] : off[i + 1]])) == got_n


@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=6))
def test_simhash_vectorized_matches_naive(texts):
    from fastpasta_ray.functions.dedup import SimHasher, _shingle_hashes

    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = SimHasher(5)(t)["simhash"].to_numpy(zero_copy_only=False)
    # naive per-doc reference (the round-1 implementation)
    bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    for i, sh in enumerate(_shingle_hashes(texts, 5)):
        votes = ((sh[:, None] & bits) != 0).sum(axis=0) * 2 - len(sh)
        exp = np.sum((votes > 0) * bits[0], dtype=np.uint64)
        assert got[i] == exp, texts[i]


@given(st.integers(0, 2**64 - 1), st.sets(st.integers(0, 63), min_size=0, max_size=7))
def test_simhash_combo_guarantee(h, flip_bits):
    """Pigeonhole: any pair within Hamming 7 shares at least one of the 36
    two-block combo keys (the candidate-generation guarantee)."""
    from fastpasta_ray.functions.dedup import (
        _SIMHASH_BLOCK_STARTS,
        _SIMHASH_BLOCK_WIDTHS,
        _SIMHASH_COMBOS,
    )

    a = np.uint64(h)
    b = a
    for bit in flip_bits:
        b = np.uint64(int(b) ^ (1 << bit))

    def blocks(x):
        return [
            (int(x) >> s) & ((1 << w) - 1)
            for s, w in zip(_SIMHASH_BLOCK_STARTS, _SIMHASH_BLOCK_WIDTHS)
        ]

    ba, bb = blocks(a), blocks(b)
    assert any(ba[i] == bb[i] and ba[j] == bb[j] for i, j in _SIMHASH_COMBOS)


# ---------------------------------------------------------------------------
# unigram logprob vs naive per-doc Python
# ---------------------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=20), min_size=1, max_size=6))
def test_unigram_logprob_matches_naive(texts):
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from fastpasta_ray.functions.text import (
        unigram_logprob_score,
        unigram_logprob_table,
    )

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    vocab, logp, oov = unigram_logprob_table(ds)
    got = {r["doc_id"]: r["logprob"] for r in
           unigram_logprob_score(ds, vocab, logp, oov).take_all()}
    # naive: single-space split (including empty words), corpus frequency
    words = [t.split(" ") for t in texts]
    freq = Counter(w for ws in words for w in ws)
    total = sum(freq.values())
    for i, ws in enumerate(words):
        want = sum(math.log(freq[w] / total) for w in ws) / max(len(ws), 1)
        assert abs(got[i] - round(want, 4)) <= 1e-9, (i, got[i], want)


# ---------------------------------------------------------------------------
# semantic_dedup blocked strip kernel vs naive O(n^2) keep-first rule
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    st.integers(2, 40),
    st.integers(1, 7),
    st.integers(0, 10**6),
)
def test_semantic_dedup_blocked_kernel_matches_naive(n, block, seed):
    import pyarrow as pa
    import ray.data as rd

    from fastpasta_ray.functions.similarity import _normalize, semantic_dedup

    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, 6))
    ids = rng.permutation(n) * 3 + 1  # non-contiguous, shuffled ids
    thr = 0.6
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in m], type=pa.list_(pa.float32())
                ),
            }
        )
    )
    # one centroid -> everything in one cluster, kernel fully exercised
    got = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            ds, m[:1], threshold=thr, block=block
        ).take_all()
    )
    # naive: float32-roundtripped vectors, any lower-id neighbor >= thr
    mf = _normalize(m.astype(np.float32).astype(np.float64))
    order = np.argsort(ids)
    ms, ids_s = mf[order], ids[order]
    sims = ms @ ms.T
    want = sorted(
        int(ids_s[i])
        for i in range(n)
        if (sims[i, :i] >= thr).any()
    )
    assert got == want


# ---------------------------------------------------------------------------
# APE fatal-carry: batch-split invariance (the era mechanism is row-exact,
# so the (violations, fatal set) must not depend on where batch boundaries
# fall — the same invariant the RunningState test pins for E11)
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 6), min_size=0, max_size=8), min_size=1, max_size=12
    ),
    st.integers(1, 4),
)
def test_segment_fatal_carry_batch_split_invariant(seg_specs_rows, split):
    """Rows are built from per-segment specs: header token in [5, 11] (5 +
    spec value) and a FATAL sentinel inside segments whose spec is even.
    Violations and the running fatal set must be identical whether the rows
    are checked in one batch or split at arbitrary boundaries with
    fatal_heads carried between calls."""
    from fastpasta_ray.checks.segments import run_segment_checks

    DELIM, FATAL = 99, 902

    def build_row(specs):
        toks = []
        for k, sp in enumerate(specs):
            if k:
                toks.append(DELIM)
            toks.append(5 + sp)  # header
            toks.append(1)
            if sp % 2 == 0:
                toks.append(FATAL)
        return toks

    rows = [build_row(sp) for sp in seg_specs_rows]

    def batch_of(chunk, start):
        return pa.table(
            {
                "part": pa.array(["p"] * len(chunk)),
                "row_index": pa.array(
                    range(start, start + len(chunk)), type=pa.int64()
                ),
                "doc_id": pa.array([f"d{i}" for i in range(start, start + len(chunk))]),
                "tokens": pa.array(chunk, type=pa.list_(pa.int32())),
            }
        )

    kw = dict(
        delim_id=DELIM,
        min_segments=1,
        max_segments=4,
        fatal_sentinels=(FATAL,),
        allowed_orders=tuple((5 + a, 5 + b) for a in range(7) for b in range(7)),
    )
    v_one, nf_one = run_segment_checks(batch_of(rows, 0), fatal_heads=frozenset(), **kw)
    one = sorted(
        zip(v_one["row_index"].to_pylist(), v_one["code"].to_pylist(), v_one["message"].to_pylist())
    )

    got = []
    heads: frozenset = frozenset()
    nf_all: list = []
    for start in range(0, len(rows), split):
        chunk = rows[start : start + split]
        v, nf = run_segment_checks(batch_of(chunk, start), fatal_heads=heads, **kw)
        # row_index column already carries the global position
        got.extend(
            zip(v["row_index"].to_pylist(), v["code"].to_pylist(), v["message"].to_pylist())
        )
        heads = frozenset(heads | set(nf))
        nf_all.extend(nf)
    assert sorted(got) == one
    assert sorted(nf_all) == sorted(nf_one)


# ---------------------------------------------------------------------------
# _seed_centroids: block-layout independence (it replaced a deterministic
# ds.sort().limit(k) — the min-k partial reduce must return the SAME
# centroids for any partitioning of the same rows)
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=9, max_size=40, unique=True),
    st.integers(1, 5),
)
def test_seed_centroids_layout_independent(vec_ids, n_blocks):
    import ray

    from fastpasta_ray.pipelines.queries import _seed_centroids

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(len(vec_ids), 4)).round(3)
    t = pa.table(
        {
            "vec_id": pa.array(vec_ids, type=pa.int64()),
            "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float64())),
        }
    )
    step = max(1, len(vec_ids) // n_blocks)
    blocks = [t.slice(i, step) for i in range(0, len(vec_ids), step)]
    got = _seed_centroids(ray.data.from_arrow(blocks), 8)
    order = np.argsort(np.asarray(vec_ids))[:8]
    expected = emb[order]
    assert np.array_equal(got, expected)
