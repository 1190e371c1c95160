"""The resumable validation runner.

Orchestration semantics carried over from the reference (SURVEY.md §2.8):

- **fan-out**: all checks compose over one scan; Spark tasks are the
  parallel unit (the reference fans one OS process per item,
  /root/reference/main.nf:91-137).
- **errorStrategy 'ignore'** (/root/reference/modules/ProcessRepo.nf:19):
  a failing check family must not kill the run — it records UNKNOWN
  verdicts with the error in `details` and the run continues.
- **resume** (/root/reference/nextflow.config:14 workDir caching): a
  `qc_state` table records per-partition lineage; a re-run with the same
  run_id skips completed partitions (anti-join / pruned filter).

Execution shape (scale-first):

1. one narrow pass over the fact table computes every row-level facet
   (completeness, structural, format, referential-via-broadcast) and
   writes violation rows — no shuffle;
2. uniqueness (shuffle on doc_id, map-side combined) and invariant
   (hash-reduced join) contribute their violations;
3. verdict counts are aggregated from the *written* violations plus one
   cheap totals scan that reads only doc_id (tokens never re-read);
4. drift runs on a 64-buckets-per-source aggregate via applyInPandas;
5. qc_state rows are written per batch (idempotent overwrite-by-batch).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tokenqc import io as qio
from tokenqc.checks import base as cb
from tokenqc.checks import (
    completeness,
    drift,
    format as format_check,
    invariant,
    referential,
    scoring,
    stats,
    uniqueness,
)
from tokenqc.schema import FAIL, PASS, UNKNOWN

ROW_LEVEL = ("completeness", "structural", "format", "referential")


@dataclass
class RunResult:
    run_id: str
    verdicts: DataFrame
    violations: DataFrame
    state: DataFrame
    skipped_partitions: list[int] = field(default_factory=list)
    errors: dict[str, str] = field(default_factory=dict)
    timings: dict[str, float] = field(default_factory=dict)


def _row_level_facets(cfg: cb.CheckConfig) -> list[cb.Facet]:
    from tokenqc.checks import structural

    fs: list[cb.Facet] = []
    if "completeness" in cfg.checks:
        fs += completeness.facets(cfg)
    if "structural" in cfg.checks:
        fs += structural.facets(cfg)
    if "format" in cfg.checks:
        fs += format_check.facets(cfg)
    if "referential" in cfg.checks:
        fs += referential.facets(cfg)
    return fs


class QCRunner:
    def __init__(
        self,
        spark: SparkSession,
        cfg: cb.CheckConfig | None = None,
        out_dir: str = "qc_out",
        n_batches: int = 1,
    ) -> None:
        if n_batches < 1:
            raise ValueError("n_batches must be >= 1")
        self.spark = spark
        self.cfg = cfg or cb.CheckConfig()
        self.out_dir = out_dir
        self.n_batches = n_batches

    # ------------------------------------------------------------------
    def run(
        self,
        sequences: DataFrame,
        allowed_sources: DataFrame | None = None,
        baseline_hist: DataFrame | None = None,
        reference_tokens: DataFrame | None = None,
        run_id: str | None = None,
    ) -> RunResult:
        cfg = self.cfg
        run_id = run_id or uuid.uuid4().hex[:12]

        completed = self._completed_partitions(run_id)
        all_parts = list(range(cfg.n_partitions))
        pending = [p for p in all_parts if p not in completed]
        errors: dict[str, str] = {}

        df = sequences.withColumn("partition_id", cb.partition_id_col(cfg))
        if "referential" in cfg.checks and allowed_sources is not None:
            df = referential.attach(df, allowed_sources)

        timings: dict[str, float] = {}
        batches = self._plan_batches(pending)
        for bi, parts in enumerate(batches):
            self._run_batch(
                df, parts, bi, run_id, cfg, errors,
                allowed=allowed_sources,
                baseline=baseline_hist,
                reference=reference_tokens,
                timings=timings,
            )

        verdicts = qio.read_table(self.spark, self.out_dir, "verdicts", run_id)
        violations = qio.read_table(self.spark, self.out_dir, "violations", run_id)
        state = qio.read_table(self.spark, self.out_dir, "qc_state", run_id)
        empty_v = self.spark.createDataFrame([], "run_id string, batch int, partition_id int, check_name string, status string, n_rows long, n_viol long, details string")
        empty_viol = self.spark.createDataFrame([], "run_id string, batch int, partition_id int, doc_id string, check_name string, observed string, expected string")
        empty_s = self.spark.createDataFrame([], "run_id string, batch int, partition_id int, status string, n_rows long, n_viol long, wall_ms long, finished_at timestamp")
        return RunResult(
            run_id=run_id,
            verdicts=verdicts if verdicts is not None else empty_v,
            violations=violations if violations is not None else empty_viol,
            state=state if state is not None else empty_s,
            skipped_partitions=sorted(completed),
            errors=errors,
            timings=timings,
        )

    # ------------------------------------------------------------------
    def _completed_partitions(self, run_id: str) -> set[int]:
        state = qio.read_table(self.spark, self.out_dir, "qc_state", run_id)
        if state is None:
            return set()
        rows = (
            state.where(F.col("status").isin(PASS, FAIL))
            .select("partition_id")
            .distinct()
            .collect()
        )
        return {r.partition_id for r in rows}

    def _plan_batches(self, pending: list[int]) -> list[list[int]]:
        if not pending:
            return []
        nb = min(self.n_batches, len(pending))
        size = -(-len(pending) // nb)
        return [pending[i : i + size] for i in range(0, len(pending), size)]

    # ------------------------------------------------------------------
    def _run_batch(
        self,
        df: DataFrame,
        parts: list[int],
        batch: int,
        run_id: str,
        cfg: cb.CheckConfig,
        errors: dict[str, str],
        allowed: DataFrame | None,
        baseline: DataFrame | None,
        reference: DataFrame | None,
        timings: dict[str, float] | None = None,
    ) -> None:
        timings = timings if timings is not None else {}

        def _mark(name: str, start: float) -> float:
            now = time.monotonic()
            timings[name] = timings.get(name, 0.0) + round(now - start, 3)
            return now

        t0 = time.monotonic()
        spark = self.spark
        full_batch = len(parts) == cfg.n_partitions
        bdf = df if full_batch else df.where(F.col("partition_id").isin(parts))

        # --- violations: ONE narrow scan for all row-level gates, with the
        # invariant fused in (tokens hashed once, 8-byte hashes joined to
        # the pre-hashed reference — the tokens column is read exactly
        # once per side across the whole run) + the uniqueness shuffle
        viol_parts: list[DataFrame] = []
        facets = _row_level_facets(cfg)
        want_invariant = "invariant" in cfg.checks and reference is not None
        if facets:
            try:
                extra = (
                    [F.xxhash64("tokens").alias("__tok_hash")] if want_invariant else []
                )
                narrow = cb.project_facets(bdf, facets, extra)
                all_facets = list(facets)
                if want_invariant:
                    refh = reference.select(
                        "doc_id", F.xxhash64("tokens_ref").alias("__ref_hash")
                    )
                    narrow = narrow.join(refh, on="doc_id", how="left")
                    inv = cb.Facet(
                        invariant.CHECK,
                        "tokens_mismatch",
                        F.col("__ref_hash").isNotNull()
                        & (F.col("__tok_hash") != F.col("__ref_hash")),
                        F.lit("hash(tokens) != hash(tokens_ref)"),
                        "tokens == tokens_ref",
                    )
                    i = len(all_facets)
                    narrow = narrow.withColumn(f"__c{i}", inv.cond).withColumn(
                        f"__o{i}", F.when(inv.cond, inv.observed)
                    )
                    all_facets.append(inv)
                viol_parts.append(cb.explode_flags(narrow, all_facets))
            except Exception as e:  # errorStrategy 'ignore'
                errors["row_level"] = repr(e)
        elif want_invariant:
            try:
                viol_parts.append(invariant.violations(bdf, reference, cfg))
            except Exception as e:
                errors["invariant"] = repr(e)
        if "uniqueness" in cfg.checks:
            try:
                u = uniqueness.violations(df, cfg)  # global check; filter to batch
                viol_parts.append(u if full_batch else u.where(F.col("partition_id").isin(parts)))
            except Exception as e:
                errors["uniqueness"] = repr(e)

        _t = _mark("build_plan", t0)
        if not viol_parts:
            viol_parts.append(
                spark.createDataFrame(
                    [],
                    "partition_id int, doc_id string, check_name string, observed string, expected string",
                )
            )
        viol = viol_parts[0]
        for extra in viol_parts[1:]:
            viol = viol.unionByName(extra)

        # --- overlap independent side jobs with the big violations write:
        # the totals scan (doc_id only) and the drift pipeline (histogram
        # shuffle + applyInPandas) share no lineage with the violation
        # sink, so a second driver thread materializes them while the
        # scan/join/write saturates the executors — Spark's scheduler
        # interleaves jobs from concurrent threads (FIFO within cores)
        import threading

        totals = bdf.groupBy("partition_id").agg(F.count(F.lit(1)).alias("n_rows"))
        side: dict[str, DataFrame] = {}

        def _materialize_side() -> None:
            try:
                t_tot = totals.persist()
                t_tot.count()
                side["totals"] = t_tot
                if "drift" in cfg.checks and baseline is not None:
                    dv = drift.verdicts(bdf, baseline, cfg).persist()
                    dv.count()
                    side["drift"] = dv
            except Exception as e:  # errorStrategy 'ignore'
                errors["side_jobs"] = repr(e)

        side_thread = threading.Thread(target=_materialize_side, daemon=True)
        side_thread.start()
        # cluster the (sparse) violation rows by lineage partition before
        # the sink: one small shuffle (AQE-coalesced) instead of one tiny
        # output file per scan task — at 10^12 rows this is the difference
        # between ~10^5 files and ~n_partitions files, and the read-back
        # aggregation arrives pre-clustered. coalesce() would instead
        # throttle the upstream scan's parallelism.
        qio.write_batch(
            viol.repartition("partition_id"), self.out_dir, "violations", run_id, batch
        )
        side_thread.join()
        _t = _mark("violations_write", _t)
        viol_written = qio.read_table(spark, self.out_dir, "violations", run_id).where(
            F.col("batch") == batch
        )

        # --- verdict counts: written violations × cheap totals scan ------
        totals = side.get("totals", totals)
        counts = viol_written.groupBy("partition_id", "check_name").agg(
            F.count(F.lit(1)).alias("n_viol")
        )
        active = [c for c in cfg.checks if c != "drift"]
        if "invariant" in active and reference is None:
            active.remove("invariant")
        checks_lit = F.array(*[F.lit(c) for c in active])
        grid = totals.select(
            "partition_id", "n_rows", F.explode(checks_lit).alias("check_name")
        )
        per_check = grid.join(counts, on=["partition_id", "check_name"], how="left").fillna(
            {"n_viol": 0}
        )
        thr = F.create_map(
            *[x for c in active for x in (F.lit(c), F.lit(cfg.threshold(c)))]
        )
        rate = F.when(F.col("n_rows") > 0, F.col("n_viol") / F.col("n_rows")).otherwise(F.lit(0.0))
        status = F.when(rate <= thr[F.col("check_name")], F.lit(PASS)).otherwise(F.lit(FAIL))
        verdicts = per_check.select(
            "partition_id",
            "check_name",
            status.alias("status"),
            "n_rows",
            "n_viol",
            F.lit(None).cast("string").alias("details"),
        )
        # checks that errored → UNKNOWN verdict rows (errorStrategy 'ignore')
        if errors:
            err_rows = [
                (-1, k, UNKNOWN, 0, 0, v) for k, v in errors.items()
            ]
            err_df = spark.createDataFrame(
                err_rows,
                "partition_id int, check_name string, status string, n_rows long, n_viol long, details string",
            )
            verdicts = verdicts.unionByName(err_df)

        # --- drift: source-level verdicts (partition_id = -1) ------------
        if "drift" in cfg.checks:
            try:
                if baseline is not None:
                    dv = side.get("drift")
                    if dv is None:  # side thread failed: recompute inline
                        dv = drift.verdicts(bdf, baseline, cfg)
                    drift_verd = dv.select(
                        F.lit(-1).alias("partition_id"),
                        F.concat(F.lit("drift:"), F.col("source")).alias("check_name"),
                        F.col("status"),
                        F.col("n_rows").cast("long").alias("n_rows"),
                        F.lit(0).cast("long").alias("n_viol"),
                        F.to_json(F.struct("chi2", "chi2_p", "ks_d", "ks_p")).alias("details"),
                    )
                else:
                    # missing baseline ⇒ UNKNOWN, not FAIL (analyze_joss.py:96-105)
                    drift_verd = spark.createDataFrame(
                        [(-1, "drift", UNKNOWN, 0, 0, "no baseline_hist provided")],
                        "partition_id int, check_name string, status string, n_rows long, n_viol long, details string",
                    )
                verdicts = verdicts.unionByName(drift_verd)
            except Exception as e:
                errors["drift"] = repr(e)

        _t = _mark("verdicts_plan", _t)
        qio.write_batch(verdicts, self.out_dir, "verdicts", run_id, batch)
        _t = _mark("verdicts_write", _t)

        # --- qc_state lineage rows ---------------------------------------
        wall_ms = int((time.monotonic() - t0) * 1000)
        verd_written = qio.read_table(spark, self.out_dir, "verdicts", run_id).where(
            (F.col("batch") == batch) & (F.col("partition_id") >= 0)
        )
        state = verd_written.groupBy("partition_id").agg(
            F.max(F.when(F.col("status") == FAIL, 1).otherwise(0)).alias("any_fail"),
            F.max("n_rows").alias("n_rows"),
            F.sum("n_viol").alias("n_viol"),
        ).select(
            "partition_id",
            F.when(F.col("any_fail") == 1, FAIL).otherwise(PASS).alias("status"),
            "n_rows",
            "n_viol",
            F.lit(wall_ms).alias("wall_ms"),
            F.current_timestamp().alias("finished_at"),
        )
        qio.append_state(state, self.out_dir, run_id, batch)
        for cached in side.values():
            cached.unpersist()
        _mark("state_write", _t)

    # ------------------------------------------------------------------
    def report(self, run_id: str) -> DataFrame | None:
        """Scored per-partition report (analyze_joss.py:505-508 semantics)."""
        verd = qio.read_table(self.spark, self.out_dir, "verdicts", run_id)
        if verd is None:
            return None
        return scoring.partition_report(
            verd.where(F.col("partition_id") >= 0).select(
                "partition_id", "check_name", "n_rows", "n_viol"
            )
        )

    def stats_profile(self, sequences: DataFrame) -> DataFrame:
        return stats.profile(sequences, self.cfg)
