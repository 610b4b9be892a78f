"""The per-partition validator stage — the LinkValidator analog.

The reference spawns one validator thread per link that consumes that
link's records in order and runs sanity + running checks, sending error
strings and stat increments to a central collector
(fastpasta/src/analyze/validators/link_validator.rs:110-161,
validator_dispatcher.rs:68-163). Ray-Data-native equivalent: each partition
FILE is one unit of a ``map_batches`` stage over a dataset of file
descriptors; the callable streams the file's row batches in order, runs

  - vectorized stateless row checks (row_checks.py, C-analogs),
  - the running monotonicity check carrying state across batches (R1 analog),
  - mergeable stats accumulation (PartStats: counters, HLL, histograms),

and yields violation tables as it goes (streaming, bounded memory). At file
end it emits ONE sentinel row carrying the serialized PartStats — so a
single pass over the payload produces both the violations table and the
stats partials (the reference's stats channel, but data-parallel and
mergeable instead of a single consumer).

Violations per partition are capped (``max_errors_per_part``) — the
documented divergence from the reference's global ``max_tolerate_errors``
early-stop (SURVEY.md G8: no clean global counter in a streaming dataset).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

import ray

from fastpasta_ray import schema as S
from fastpasta_ray.checks.row_checks import run_row_checks
from fastpasta_ray.checks.running_checks import RunningState
from fastpasta_ray.sketches import PartStats, hash_strings, one_chunk
from fastpasta_ray.sources.parquet import iter_file_batches


@dataclass
class CheckConfig:
    vocab: int = S.VOCAB_SIZE
    source_domain: tuple = S.SOURCES
    batch_rows: int | str = "auto"   # "auto" = ~32 MiB per batch from file metadata
    max_errors_per_part: int = 10_000
    # global error budget (max_tolerate_errors analog, controller.rs:229-246):
    # a counter actor is incremented per finished partition and polled at
    # partition granularity — partitions already in flight still complete,
    # the documented divergence from the reference's per-record stop flag
    max_errors_global: int | None = None
    running_checks: bool = True          # `check all` vs `check sanity` analog
    # False = never read the tokens payload (M7 skip_payload analog /
    # `check all` RDH-only mode, config.rs:249-261): scalar-only column-
    # pruned read; token-dependent checks (E10 len, E70 range, grammar) and
    # token stats are skipped, everything else runs
    read_payload: bool = True
    # analysis-scope filter (the reference's GLOBAL --filter-link /
    # --filter-fee group, config.rs:75-103): when set, every pass — row
    # checks, running checks, stats, key checks — sees only rows whose
    # `source` is in the tuple, exactly as the reference's input scanner
    # drops non-matching links before any validator runs. Violation
    # row_index still names the ORIGINAL file position.
    filter_sources: tuple | None = None
    enabled_codes: tuple | None = None   # exact codes OR prefixes ("E9" → E9xxx)
    expected_row_count: int | None = None  # custom-checks `cdps` analog (E9001)
    # exact doc-index stride per partition (R4 trigger-period analog,
    # tdh.rs:60-206 [E440..E445]); None = monotonicity only
    expected_index_stride: int | None = None
    drift_psi_threshold: float = 0.2
    drift_ks_threshold: float = 0.15
    # sequence-grammar (FSM analog) rules; None disables each — the
    # custom-checks TOML analog (custom_checks_cfg.rs:7-28)
    bos_id: int | None = None
    eos_id: int | None = None
    pad_id: int | None = None
    # nested segment decode (ALPIDE deep-decode analog, checks/segments.py);
    # None disables — E73 count band / E74 header equality / E75 empty /
    # E76 allowed header orderings (chip_orders_ob analog,
    # custom_checks_cfg.rs:16-24): tuple of allowed header sequences
    segment_delim_id: int | None = None
    min_segments: int | None = None
    max_segments: int | None = None
    allowed_segment_orders: tuple | None = None
    # APE lane-status ladder analog (lane_alpide_frame_analyzer.rs:73-177,
    # alpide_word.rs:36-49): reserved token ids that set a segment's
    # status. WARNING → E77 report only; FATAL → E78 + the segment's
    # header joins the partition's running fatal set (fatal segments drop
    # out of E74/E76 and lower the E73 band — see checks/segments.py)
    warning_sentinel_ids: tuple | None = None
    fatal_sentinel_ids: tuple | None = None
    extra: dict = field(default_factory=dict)

    @property
    def grammar(self):
        from fastpasta_ray.checks.grammar import GrammarConfig

        return GrammarConfig(self.bos_id, self.eos_id, self.pad_id)


def _filter_codes(v: pa.Table, enabled: tuple | None) -> pa.Table:
    """Error-code filter with PREFIX semantics (err_printer.rs:52-90):
    an entry matches codes it is a prefix of — "E9" enables every E9xxx;
    an exact code is trivially its own prefix."""
    if enabled is None or v.num_rows == 0:
        return v
    # empty-string prefixes (e.g. a trailing comma in --codes) would match
    # EVERYTHING — drop them; an empty prefix set matches nothing, like
    # the exact is_in semantics this replaced
    prefixes = [str(p) for p in enabled if str(p)]
    if not prefixes:
        return v.slice(0, 0)
    mask = None
    for p in prefixes:
        m = pc.starts_with(v["code"], pattern=p)
        mask = m if mask is None else pc.or_(mask, m)
    return v.filter(mask)


@ray.remote(num_cpus=0)
class ErrorBudget:
    """Global error counter (the reference's AtomicBool stop flag analog,
    controller.rs:229-246). Tasks add their partition's violation count and
    learn whether the budget is blown; polling is at partition granularity
    so in-flight partitions still finish — the documented divergence."""

    def __init__(self, budget: int):
        self.budget = budget
        self.count = 0

    def add(self, n: int) -> bool:
        self.count += n
        return self.count > self.budget

    def exceeded(self) -> bool:
        return self.count > self.budget

    def total(self) -> int:
        return self.count


class ValidateFiles:
    """Callable class for ``map_batches`` (actor pool): constant setup
    (domain sets, config) happens once per actor in ``__init__``; each
    ``__call__`` validates whole files."""

    def __init__(
        self,
        cfg: CheckConfig | None = None,
        reference_profile: dict | None = None,
        checkpoint_dir: str | None = None,
        error_budget=None,
    ):
        # handle of the global ErrorBudget actor (None = no global cap)
        self.error_budget = error_budget
        # the reference profile is broadcast ONCE with the stage (task/actor
        # init), so each partition judges its own drift locally — at 10^6
        # partitions the driver never has to hold every partition's sketches
        # just to run the drift gate
        self.cfg = cfg or CheckConfig()
        self.profile = reference_profile
        # with a checkpoint_dir, each task commits its partition the moment
        # the partition finishes (violations are capped → bounded in-task
        # accumulation); a killed run keeps every finished partition
        self.checkpoint_dir = checkpoint_dir

    @staticmethod
    def _schema_violation(part: str, detail: str) -> pa.Table:
        return pa.table(
            {
                "part": pa.array([part], type=pa.string()),
                "row_index": pa.array([-1], type=pa.int64()),
                "doc_id": pa.array([None], type=pa.string()),
                "code": pa.array([S.E_SCHEMA], type=pa.string()),
                "column": pa.array(["__schema__"], type=pa.string()),
                "message": pa.array(
                    [S.format_message(S.E_SCHEMA, f"schema mismatch: {detail}")],
                    type=pa.string(),
                ),
            },
            schema=S.VIOLATIONS_SCHEMA,
        )

    def __call__(self, fd: pa.Table) -> Iterator[pa.Table]:
        for path in fd["path"].to_pylist():
            if self.error_budget is not None and ray.get(
                self.error_budget.exceeded.remote()
            ):
                # global budget blown: stop validating further partitions
                # (in-flight ones elsewhere still finish — divergence window
                # is one partition per worker, documented in CheckConfig)
                return
            yield from self.validate_file(path)

    def validate_file(self, path: str) -> Iterator[pa.Table]:
        cfg = self.cfg
        stats = PartStats(vocab=cfg.vocab, has_payload=cfg.read_payload)
        # running fatal-segment headers for THIS partition (APE ladder
        # analog; grows batch-to-batch like the reference's fatal_lanes)
        fatal_heads: frozenset = frozenset()
        running = (
            RunningState(
                cfg.expected_index_stride,
                # filtered view of a partition-global stride-k stream:
                # surviving intervals are exact multiples of k (see
                # RunningState.stride_multiples)
                stride_multiples=cfg.filter_sources is not None,
            )
            if cfg.running_checks
            else None
        )
        emitted = 0
        part = None
        own_violations: list[pa.Table] = []  # for the in-task commit
        # --- E14: set-once schema check (G7 analog, rdh_stats.rs:41-73) —
        # every partition file must carry the run schema; a deviating file
        # fails as a partition (one violation) and is skipped, the run
        # continues (per-partition fail, not global abort)
        import pyarrow.parquet as _pq

        from fastpasta_ray.schema import SEQUENCES_SCHEMA
        from fastpasta_ray.sources.parquet import part_of as _part_of

        try:
            file_schema = _pq.read_schema(path)
        except Exception as exc:  # unreadable file → schema violation too
            yield self._schema_violation(_part_of(path), f"unreadable parquet file: {exc}")
            return
        want = {f.name: f.type for f in SEQUENCES_SCHEMA}
        if not cfg.read_payload:
            want = {k: v for k, v in want.items() if k != "tokens"}
        got = {n: file_schema.field(n).type for n in file_schema.names if n in want}
        missing = [n for n in want if n not in file_schema.names]
        wrong = [n for n, t in got.items() if t != want[n]]
        if missing or wrong:
            detail = []
            if missing:
                detail.append(f"missing columns {missing}")
            if wrong:
                detail.append(
                    "wrong types "
                    + str({n: f"{got[n]} != {want[n]}" for n in wrong})
                )
            yield self._schema_violation(_part_of(path), "; ".join(detail))
            return
        columns = None if cfg.read_payload else ["doc_id", "n_tok", "source"]
        src_set = (
            S.source_set(cfg.filter_sources) if cfg.filter_sources is not None else None
        )
        for batch in iter_file_batches(path, columns, cfg.batch_rows):
            part = batch["part"][0].as_py() if part is None else part
            if src_set is not None:
                # scope the whole analysis to the filtered sources; the
                # row_index column (attached pre-filter) keeps naming the
                # original file positions in any violation
                batch = batch.filter(S.source_mask(batch["source"], src_set))
                if batch.num_rows == 0:
                    continue
            # --- stats accumulation (vectorized, one pass) -----------------
            stats.row_count += batch.num_rows
            vals = None
            minmax = None
            if cfg.read_payload:
                tokens = one_chunk(batch["tokens"])
                flat = tokens.flatten()
                stats.token_count += len(flat)
                if len(flat):
                    vals = flat.to_numpy(zero_copy_only=False)
                    # fused cache-blocked min/max + bitmap scatter: one DRAM
                    # pass over the token values instead of three
                    from fastpasta_ray.sketches import scan_token_values

                    minmax = scan_token_values(
                        vals, stats.token_mm, stats.vocab_bitmap
                    )
            ntok = one_chunk(batch["n_tok"]).to_numpy(zero_copy_only=False)
            stats.n_tok_hist.add(ntok)
            stats.source_hist.add_arrow(one_chunk(batch["source"]))
            stats.hll.add_hashes(
                hash_strings(one_chunk(batch["doc_id"]))
            )
            # --- checks ----------------------------------------------------
            if emitted < cfg.max_errors_per_part:
                v = run_row_checks(
                    batch,
                    vocab=cfg.vocab,
                    source_domain=cfg.source_domain,
                    flat_vals=vals,
                    flat_minmax=minmax,
                )
                if cfg.read_payload and (
                    cfg.bos_id is not None or cfg.eos_id is not None or cfg.pad_id is not None
                ):
                    from fastpasta_ray.checks.grammar import run_grammar_checks

                    gv = run_grammar_checks(batch, cfg.grammar)
                    if gv.num_rows:
                        v = pa.concat_tables([v, gv])
                if cfg.read_payload and cfg.segment_delim_id is not None:
                    from fastpasta_ray.checks.segments import run_segment_checks

                    sv, new_fatal = run_segment_checks(
                        batch,
                        delim_id=cfg.segment_delim_id,
                        min_segments=cfg.min_segments,
                        max_segments=cfg.max_segments,
                        allowed_orders=cfg.allowed_segment_orders,
                        warning_sentinels=cfg.warning_sentinel_ids,
                        fatal_sentinels=cfg.fatal_sentinel_ids,
                        fatal_heads=fatal_heads,
                    )
                    if new_fatal:
                        # per-partition running fatal set (the reference's
                        # add_fatal_lanes, readout_frame.rs:40-50); surfaced
                        # in the report via PartStats
                        fatal_heads = frozenset(fatal_heads | set(new_fatal))
                        stats.fatal_segments |= set(new_fatal)
                    if sv.num_rows:
                        v = pa.concat_tables([v, sv])
                if cfg.extra.get("custom_checks"):
                    from fastpasta_ray.checks.registry import run_custom_checks

                    cv = run_custom_checks(batch, cfg)
                    if cv.num_rows:
                        v = pa.concat_tables([v, cv])
                if running is not None:
                    rv = running.check_batch(batch)
                    if rv.num_rows:
                        v = pa.concat_tables([v, rv])
                v = _filter_codes(v, cfg.enabled_codes)
                if v.num_rows:
                    room = cfg.max_errors_per_part - emitted
                    if v.num_rows > room:
                        v = v.slice(0, room)
                    emitted += v.num_rows
                    if self.checkpoint_dir is not None:
                        own_violations.append(v)
                    yield v
            elif running is not None:
                # keep running state advancing even when capped
                running.check_batch(batch)
        # zero-row file: derive the partition name from the path — a "?"
        # fallback would collide commit records across empty files and
        # rerun them on every resume (ADVICE r1)
        part = part or _part_of(path)
        # --- in-task drift gate vs the broadcast reference profile ---------
        drift_metrics = None
        n_drift = 0
        if self.profile is not None:
            from fastpasta_ray.checks.drift import drift_check

            dv, dm = drift_check(
                {part: stats},
                self.profile,
                psi_threshold=cfg.drift_psi_threshold,
                ks_threshold=cfg.drift_ks_threshold,
            )
            dv = _filter_codes(dv, cfg.enabled_codes)
            if dv.num_rows:
                yield dv
            n_drift = dv.num_rows
            drift_metrics = dm.get(part)
            if dv.num_rows and self.checkpoint_dir is not None:
                own_violations.append(dv)
        if self.error_budget is not None and (emitted or n_drift):
            # partition-granular increment of the global budget — counts
            # row/running AND drift-gate violations (ADVICE r2; key-check
            # violations are global and added by run_check after the
            # exchange). SYNCHRONOUS: a fire-and-forget add could still be
            # in the actor's mailbox when the driver reads totals after the
            # dataset finishes, undercounting and misreporting
            # stopped_early; one blocking RPC per partition is noise.
            ray.get(self.error_budget.add.remote(emitted + n_drift))
        # --- commit this partition NOW (task-local, atomic) ----------------
        if self.checkpoint_dir is not None:
            from fastpasta_ray.state.checkpoint import CheckpointStore

            # test hook (dunder-prefixed: NOT part of the public extra
            # surface): stagger commits by the part ordinal so a
            # kill-and-resume test has a DETERMINISTIC mid-run window
            # (concurrent partitions otherwise commit within milliseconds
            # of each other and a SIGKILL can land after all of them —
            # the r2 flake). No-op unless explicitly configured; lives
            # here because the config is the only channel that reaches
            # the worker-side task (driver monkeypatches don't).
            stagger = self.cfg.extra.get("__test_commit_stagger_s")
            if stagger:
                import re as _re
                import time as _time

                m = _re.search(r"(\d+)$", part)
                _time.sleep(float(stagger) * (int(m.group(1)) if m else 0))

            store = CheckpointStore(self.checkpoint_dir)
            pv = (
                pa.concat_tables(own_violations)
                if own_violations
                else S.VIOLATIONS_SCHEMA.empty_table()
            )
            store.commit_part(part, path, pv, stats, drift_metrics)
        # --- one sentinel row per file carrying the serialized partials ----
        import json as _json

        yield pa.table(
            {
                "part": pa.array([part], type=pa.string()),
                "row_index": pa.array([-1], type=pa.int64()),
                "doc_id": pa.array([None], type=pa.string()),
                "code": pa.array([S.STATS_SENTINEL], type=pa.string()),
                "column": pa.array([""], type=pa.string()),
                "message": pa.array(
                    [_json.dumps({"stats": stats.to_json(), "drift": drift_metrics})],
                    type=pa.string(),
                ),
            },
            schema=S.VIOLATIONS_SCHEMA,
        )
