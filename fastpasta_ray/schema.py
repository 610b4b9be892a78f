"""Arrow schemas, error-code taxonomy and frozen message formats.

The error-code taxonomy mirrors the reference's ``[Exx]`` codes
(/root/reference/README.md:211-222) and its frozen message format
``MEM_OFFSET: [Exx] message`` (fastpasta/src/analyze/validators/its/util.rs:9-30).
Our position analog is ``(part, row_index)`` — partition id (one input file,
the analog of a GBT link) plus row index within the file.

Message strings are FROZEN: tests assert them byte-exactly, mirroring the
reference's exact-string asserts (fastpasta/src/analyze/validators/its/
cdp_running.rs:520-531).
"""

from __future__ import annotations

import pyarrow as pa

# --- vocabulary / domain defaults (FIXTURES.md) ---------------------------
VOCAB_SIZE = 50304
SOURCES = ("web", "books", "code", "wiki", "news", "forums", "academic", "legal")
# skew: ~70% of mass in the top source (FIXTURES.md: "skewed (~70% mass in top source)")
SOURCE_WEIGHTS = (0.70, 0.12, 0.06, 0.04, 0.03, 0.02, 0.01, 0.02)

DOC_ID_RE = r"^[a-z][a-z0-9_-]*/\d{4}/\d{8}$"

# --- schemas --------------------------------------------------------------
SEQUENCES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

# sequences as read by the engine: position columns attached by the source
SEQUENCES_POS_SCHEMA = pa.schema(
    [
        ("part", pa.string()),
        ("row_index", pa.int64()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

VIOLATIONS_SCHEMA = pa.schema(
    [
        ("part", pa.string()),
        ("row_index", pa.int64()),
        ("doc_id", pa.string()),
        ("code", pa.string()),
        ("column", pa.string()),
        ("message", pa.string()),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("expected_n_tok", pa.int32()),
    ]
)

# --- error codes (reference analogs noted per code) -----------------------
# stateless sanity (analog of RDH sanity [E10..E16], rdh.rs:254-376)
E_NTOK_MISMATCH = "E10"      # n_tok != len(tokens)        ~ [E10] RDH sanity field
E_DOCID_FORMAT = "E12"       # doc_id malformed            ~ [E12] RDH CRU sanity
E_DOCID_NULL = "E13"         # doc_id null/empty
E_SCHEMA = "E14"             # partition file schema deviates from the run schema
                             # ~ set-once run attributes (rdh_stats.rs:41-73, G7)
E_SOURCE_NULL = "E40"        # source null/empty           ~ [E40] TDH sanity
E_SOURCE_DOMAIN = "E41"      # source not in domain        ~ [E41] TDH running
E_TOKEN_RANGE = "E70"        # token id out of vocab range ~ [E70] invalid data-word ID
E_TOKENS_NULL = "E100"       # tokens list null/truncated  ~ [E100] partial payload at EOF
# sequence-grammar (FSM) checks — analog of the ITS payload word-sequence
# grammar (its_payload_fsm_cont.rs:24-81) and status-word sanity [E30]/[E50]/[E60]
E_GRAMMAR_BOS = "E30"        # first token != BOS           ~ IHW sanity [E30]
E_GRAMMAR_EOS = "E50"        # last token != EOS            ~ TDT sanity [E50]
E_GRAMMAR_PAD = "E60"        # pad token before sequence end ~ DDW0 sanity [E60]
# running checks (analog of RdhCruRunningChecker [E11], rdh_running.rs:38-184)
E_ORDER = "E11"              # non-monotonic doc index within a partition
# exact-stride (trigger-period analog) sub-taxonomy, mirroring the
# reference's E44x family (tdh.rs:60-206, cdp_running.rs:342): E44 remains
# the family PREFIX (an enabled_codes entry "E44" matches all of these)
E_PERIOD = "E440"            # stride != expected, fresh      ~ [E440] bc not increasing
E_PERIOD_CONT = "E441"       # stride mismatch continuation   ~ [E441] continuation bc differs
E_INDEX_REPEAT = "E442"      # doc index repeated (stride 0)  ~ [E442] continuation orbit differs
E_INDEX_DECREASE = "E443"    # doc index went backwards       ~ [E443] continuation type differs
E_PART_ORDINAL = "E444"      # doc_id partition ordinal changed mid-partition ~ [E444] TDH orbit != RDH orbit
E_INDEX_ROW_DESYNC = "E445"  # doc-index advance != row_index advance x stride ~ [E445] TDH trigger_bc != RDH bc (tdh.rs:157)
# shuffle checks
E_DUP_DOCID = "E80"          # duplicate doc_id            ~ orbit-must-change (rdh_running.rs:125-133)
E_ORPHAN = "E71"             # doc_id missing from manifest ~ lane-not-active [E71] (ib.rs:14-22)
E_MANIFEST_NTOK = "E72"      # n_tok != manifest expected   ~ [E72] lane grouping
E_SEG_COUNT = "E73"          # segment count out of band    ~ [E73] lane count (alpide_readout_frame.rs:53-129)
E_SEG_HEADER = "E74"         # segment headers unequal      ~ [E74] cross-lane BC equality (alpide.rs:19-122)
E_SEG_EMPTY = "E75"          # empty segment                ~ [E75] empty-lane wrapper
E_SEG_ORDER = "E76"          # segment header order not in allowed orderings ~ chip_orders_ob (custom_checks_cfg.rs:16-24, lane_alpide_frame_analyzer.rs:180-320)
# APE lane-status ladder analog (lane_alpide_frame_analyzer.rs:73-177,
# alpide_word.rs:36-49): reserved sentinel tokens inside a segment set the
# segment's status. WARNING sentinels only report; FATAL sentinels mark the
# segment's HEADER fatal for the rest of the partition — fatal segments are
# excluded from E74/E76 and the E73 expected band drops by the running
# fatal count (alpide_readout_frame.rs:65-68 expect_lane_count -= fatal)
E_SEG_WARN = "E77"           # segment in WARNING status     ~ APE_STRIP_START/PE/OOT_DATA_MISSING
E_SEG_FATAL = "E78"          # segment in FATAL status       ~ APE_DET_TIMEOUT..APE_RATE_MISSING_TRG
E_EMPTY_DOC = "E701"         # manifest doc with no sequence row ~ [E701] empty readout frame
# stats / profile comparison (analog of validate_other_stats + custom checks
# [E9001]/[E9002], stats_validation.rs:4-38)
E_CUSTOM_COUNT = "E9001"     # user-expected counter mismatch
E_PROFILE_FIELD = "E9002"    # exact profile field mismatch
E_DRIFT_PSI = "E9440"        # PSI drift gate breached (per partition)
E_DRIFT_KS = "E9441"         # KS drift gate breached (per partition)

ALL_CODES = (
    E_NTOK_MISMATCH, E_DOCID_FORMAT, E_DOCID_NULL, E_SCHEMA, E_SOURCE_NULL,
    E_SOURCE_DOMAIN, E_TOKEN_RANGE, E_TOKENS_NULL, E_GRAMMAR_BOS,
    E_GRAMMAR_EOS, E_GRAMMAR_PAD, E_ORDER, E_PERIOD, E_PERIOD_CONT,
    E_INDEX_REPEAT, E_INDEX_DECREASE, E_PART_ORDINAL, E_INDEX_ROW_DESYNC,
    E_DUP_DOCID,
    E_ORPHAN, E_MANIFEST_NTOK, E_SEG_COUNT, E_SEG_HEADER, E_SEG_EMPTY,
    E_SEG_ORDER, E_SEG_WARN, E_SEG_FATAL,
    E_EMPTY_DOC, E_CUSTOM_COUNT, E_PROFILE_FIELD,
    E_DRIFT_PSI, E_DRIFT_KS,
)

# sentinel code used to carry serialized per-batch partial stats through the
# single-pass validation output (filtered out of the violations view)
STATS_SENTINEL = "__STATS__"


def source_set(sources) -> pa.Array:
    """Value set for :func:`source_mask` — build once per file/stage."""
    return pa.array(list(sources), type=pa.string())


def source_mask(column, src_set: pa.Array) -> pa.Array:
    """Boolean keep-mask for the --filter-sources scope (the reference's
    global --filter-link group, config.rs:75-103): True where ``column``
    is a member of ``src_set``; nulls never match. ONE definition shared
    by the validation pass, the key-check exchange (both sides) and the
    views, so the membership semantics cannot drift between passes."""
    import pyarrow.compute as pc

    return pc.fill_null(pc.is_in(column, value_set=src_set), False)


def format_message(code: str, detail: str) -> str:
    """Frozen violation message body: ``[Exx] detail``.

    The full display line (analog of the reference's
    ``MEM_OFFSET: [Exx] message``) is ``{part}:{row_index}: [Exx] detail``,
    assembled by :func:`display_line`.
    """
    return f"[{code}] {detail}"


def display_line(part: str, row_index: int, code: str, detail: str) -> str:
    return f"{part}:{row_index}: [{code}] {detail}"


def token_excerpt(flat, row_start: int, row_end: int, center: int, radius: int = 3) -> str:
    """Space-separated window of the offending row's tokens around the flat
    position ``center``, clipped to the row's [row_start, row_end) span —
    the analog of the reference ErrPrinter's raw-word hex dump in error
    messages ("[E445] ... [03 3A 01 00 ...]", asserted cdp_running.rs:620-625;
    a GBT-word byte excerpt becomes a token-window excerpt here). Appended
    to payload-check messages as ``ctx [a b c ...]``."""
    lo = max(int(row_start), int(center) - radius)
    hi = min(int(row_end), int(center) + radius + 1)
    return " ".join(str(int(x)) for x in flat[lo:hi])
