#!/usr/bin/env python
"""tokenqc benchmark: the headline QC suite over a synthetic sequences
table sized to the scale factor, printing ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>, ...extras}

The primary engine metric (BASELINE.json) is validated sequences/sec for
the full QC pass (verdicts + violation rows written); reported in the
extras as `throughput_rows_per_sec`.

Scaling evidence (north rule: >=0.8 efficiency N -> 4N executors):
  python bench.py --scaling
runs the identical job in two fresh, CPU-pinned JVMs at local[4] and
local[16] over the same input and reports throughput at both plus
efficiency (thr_4N / thr_N) / 4. 4->16 (not 8->32) because this box's
32 "cores" stop scaling past ~16 for ANY workload (measured with pure
multiprocessing: 16 workers = 8.7 tasks/s, 32 workers = 12.0 — the
hypervisor throttles); both legs must sit in the hardware's linear
region for the measurement to say anything about the engine. Results land in BENCH/BASELINE.md via
scripts in the repo (see README).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_CACHE = os.environ.get("TOKENQC_BENCH_CACHE", "/tmp/tokenqc_bench")
SEED = 42


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_bench_data(sf: float, n_files: int | None = None) -> str:
    """Synthesize (once, cached) the sequences tables at this scale:
    n_rows = sf * 6e6 (sf0.1 -> 600k rows, ~1.8 GB of token arrays).
    File count scales with rows so scan tasks stay ~70 MB (parquet row
    groups are the split unit — one giant row group = one task)."""
    from tokenqc import synth

    n = int(sf * 6_000_000)
    if n_files is None:
        n_files = max(64, min(512, n // 25_000))
    out = os.path.join(BENCH_CACHE, f"sf{sf}")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    t0 = time.monotonic()
    synth.write_bench_dataset(out, n, SEED, n_files=n_files)
    with open(marker, "w") as f:
        f.write(f"n={n} gen_sec={time.monotonic() - t0:.1f}\n")
    return out


def _n_threads(master: str) -> int:
    if "[" in master:
        n = master[master.find("[") + 1 : master.find("]")]
        return 32 if n == "*" else int(n)
    return int(DEFAULT_CPUS)


def _mem_gb(mem: str) -> float:
    """JVM memory string -> GiB (supports g/m/k suffixes, bare bytes)."""
    m = mem.strip().lower()
    units = {"g": 1.0, "m": 1.0 / 1024, "k": 1.0 / (1024 * 1024)}
    if m and m[-1] in units:
        return float(m[:-1]) * units[m[-1]]
    return float(m) / (1024**3)


def build_spark(master: str):
    from tokenqc.session import get_spark

    # GC geometry derived from the task-thread count (all measured, r2):
    # - ParallelGC beats G1 here (G1 young pauses dominated 32-thread
    #   array decode: 13.2s GC vs 2.0s at 8 threads) and beats ZGC's
    #   concurrent CPU tax on the small pinned legs.
    # - an explicit LARGE young gen is the big lever: with adaptive
    #   sizing, task-lifetime decode buffers (parquet -> UnsafeRow token
    #   arrays) were promoted and died in OLD gen — 5-12s young pauses,
    #   107s total GC per bench process; -Xmn cut that to 35s and the
    #   16-core QC leg from 18.8s to 14.4s.
    # - old gen must scale with in-flight tasks: ~4g suffices to 16
    #   threads, 32 threads needs ~8g (20g-young/24g-heap at local[32]
    #   measured 12.6s vs 7.0s with 24g-young/32g-heap).
    # Heap stays well under RAM-minus-dataset: an oversized heap evicts
    # the page cache and "warm" reads silently hit disk (measured
    # 16s -> 128s swings with a 64g heap on a 125 GB box).
    n = _n_threads(master)
    old_gb = max(4, n // 4)
    heap = os.environ.get("TOKENQC_DRIVER_MEM", f"{24 if n <= 16 else 32}g")
    # derive -Xmn from the ACTUAL heap (which TOKENQC_DRIVER_MEM may have
    # overridden — computing it from the default used to produce
    # -Xmx8g -Xmn20g and a JVM abort); skip -Xmn entirely when the heap
    # is too small to leave the old gen its working room
    heap_gb = _mem_gb(heap)
    young = f" -Xmn{int(heap_gb - old_gb)}g" if heap_gb - old_gb >= 2 else ""
    return get_spark(
        "tokenqc-bench",
        master=master,
        extra_conf={
            # pack ~2 bench files per input partition so the scan fans
            # out across the whole pool even at small SF; overridable —
            # at larger SF fewer/bigger splits cut the driver's serial
            # task-scheduling constant, which weighs 4x heavier on the
            # 4N-core leg's shorter wall
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "TOKENQC_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)
            ),
            "spark.driver.memory": heap,
            "spark.driver.extraJavaOptions": os.environ.get(
                "TOKENQC_DRIVER_JAVA_OPTS",
                f"-Xms{heap} -XX:+UseParallelGC{young}",
            ),
        },
    )


def run_suite(spark, data_dir: str, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """Headline queries. Returns (per-query seconds, extras)."""
    from pyspark.sql import functions as F

    from tokenqc.checks.base import CheckConfig
    from tokenqc.runner import QCRunner
    from tokenqc.textops import dedup, simsearch, textqc
    from tokenqc.textops import pack as pack_mod

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    seq = spark.read.parquet(os.path.join(data_dir, "sequences"))
    ref = spark.read.parquet(os.path.join(data_dir, "reference_tokens"))
    allowed = spark.read.parquet(os.path.join(data_dir, "allowed_sources.parquet"))
    baseline = spark.read.parquet(os.path.join(data_dir, "baseline_hist.parquet"))

    # every timed query is min-of-N, not single-shot: this box's
    # hypervisor throttling is bimodal (identical warm trials swing
    # 2-6x within one process), so a single trial caught in a throttled
    # epoch masquerades as a 5-14x regression (VERDICT r2 #2 — exactly
    # what BENCH_r02's side queries showed). min reflects engine capability.
    # N=6 (was 3): the r3→r4 q_invariant '+12% regression' was min-of-3
    # under-sampling — 8 consecutive warm trials of the identical plan
    # spanned 1.94–4.35 s in one process, and min-of-3 has only ~50%
    # chance of drawing a sub-2.1 s trial from that distribution
    side_trials = int(os.environ.get("TOKENQC_SIDE_TRIALS", "6"))
    # the multi-minute full-payload passes (15-60 s EACH at sf0.1) run
    # min-of-3 — min-of-6 there costs ~7.5 min/run for no extra
    # precision (their trial spread is <10%, unlike q_invariant's
    # bimodal 2x); sub-second queries keep the full 6
    mid_trials = min(side_trials, 3)
    if os.environ.get("TOKENQC_SKIP_SIDE") != "1":
        # non-scaling artifacts keep the detailed compute/write split
        # (the attribution pass is measurement overhead, excluded from
        # the pinned scaling legs which time the production sink path)
        os.environ.setdefault("TOKENQC_PHASE_DETAIL", "1")

    def timed(name, fn, trials: int = 1):
        out = None
        best = None
        for _ in range(max(1, trials)):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # warm-up: touch every column of both token tables once (page cache +
    # codegen warm), so timings measure engine efficiency, not disk cold
    # reads; the wide token arrays dominate both
    from pyspark.sql import functions as _F

    timed("warmup_scan", lambda: seq.select(_F.sum(_F.size("tokens"))).collect())
    timed("warmup_ref", lambda: ref.select(_F.sum(_F.size("tokens_ref"))).collect())
    # also warm the Python/Arrow worker pool (first applyInPandas pays
    # interpreter startup otherwise)
    wdf = spark.range(64).withColumn("g", F.col("id") % 4)
    timed(
        "warmup_python",
        lambda: wdf.groupBy("g").applyInPandas(lambda p: p, schema="id long, g long").count(),
    )
    n_rows = timed("warm_count", lambda: seq.count())
    extras["n_rows"] = float(n_rows)

    # the primary metric: full QC run (all gates, outputs written)
    qc_out = tempfile.mkdtemp(prefix="tokenqc_bench_out_")
    runner = QCRunner(spark, CheckConfig(n_partitions=64), out_dir=qc_out)

    # min-of-N trials: first execution pays JIT/codegen/cache warmup and
    # this box's hypervisor throttling is bimodal (identical warm trials
    # swing 2-6x) — min reflects engine capability. The timed section is
    # exactly the QC run (all outputs durably written); the post-hoc
    # counts verify but are not throughput.
    n_trials = int(os.environ.get("TOKENQC_QC_TRIALS", "5"))

    def gc_ms() -> int | None:
        # cumulative stop-the-world collection time of this JVM — lets
        # every trial report engine wall vs GC wall separately (the
        # scaling legs need this split: GC pause is a shared-JVM cost a
        # per-executor deployment does not serialize on)
        try:
            beans = (
                spark.sparkContext._jvm.java.lang.management.ManagementFactory  # noqa: SLF001
                .getGarbageCollectorMXBeans()
            )
            return sum(b.getCollectionTime() for b in beans)
        except Exception:
            return None

    trial_secs = []
    trial_gc: list[float | None] = []
    trial_marks: list[dict[str, float]] = []
    last = None
    for i in range(n_trials):
        # JMH-style hygiene OUTSIDE the timed window: drain the garbage
        # the previous trial left in the young gen, so a timed trial
        # measures the engine, not its predecessor's allocation debt
        # (GC logs: pauses carried across trials weigh 2-4x heavier on
        # the 4N-core leg's short wall)
        try:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass
        g0 = gc_ms()
        t0 = time.monotonic()
        last = runner.run(
            seq, allowed_sources=allowed, baseline_hist=baseline,
            reference_tokens=ref, run_id=f"bench{i}",
        )
        trial_secs.append(round(time.monotonic() - t0, 3))
        g1 = gc_ms()
        trial_gc.append(
            round((g1 - g0) / 1000.0, 3) if g0 is not None and g1 is not None else None
        )
        trial_marks.append(dict(last.timings))
    extras["n_violations"] = float(last.violations.count())
    extras["n_verdicts"] = float(last.verdicts.count())
    timings["q_full_qc_run"] = min(trial_secs)
    extras["qc_trials"] = trial_secs
    # per-phase wall breakdown + GC share of the best trial: lets a
    # scaling pair be decomposed into parallel work vs serial tail vs
    # stop-the-world GC per leg
    best_i = trial_secs.index(min(trial_secs))
    extras["qc_phase_breakdown"] = trial_marks[best_i]
    extras["qc_trial_gc_secs"] = trial_gc
    extras["qc_gc_sec"] = trial_gc[best_i]
    shutil.rmtree(qc_out, ignore_errors=True)
    extras["throughput_rows_per_sec"] = round(n_rows / timings["q_full_qc_run"], 1)

    # scaling legs only need the headline run (the efficiency metric is
    # q_full_qc_run throughput); the side sweep at sf>=1.0 would add
    # tens of minutes per leg (q_token_drift alone explodes ~3G tokens)
    # and pollute the page cache between the pinned legs
    if os.environ.get("TOKENQC_SKIP_SIDE") == "1":
        return timings, extras

    # individual gates (count() forces execution; outputs not written)
    from tokenqc.checks import base as cb
    from tokenqc.checks import completeness, drift, format as fmt, invariant, referential, stats, structural, uniqueness

    cfg = CheckConfig(n_partitions=64)
    attached = referential.attach(
        seq.withColumn("partition_id", cb.partition_id_col(cfg)), allowed
    )
    facets = (
        completeness.facets(cfg) + structural.facets(cfg) + fmt.facets(cfg) + referential.facets(cfg)
    )
    timed("q_row_gates", lambda: cb.assemble_violations(attached, facets).count(), side_trials)
    # same fused pass + the four token-array lints (r5): the delta vs
    # q_row_gates is the lints' marginal cost — they ride the same single
    # scan (pinned in test_plans), so it should be array-fold compute only
    from tokenqc.checks import tokens as token_lints

    tok_cfg = CheckConfig(
        n_partitions=64, vocab_size=50257, bos_id=1, eos_id=2, max_token_run=8
    )
    tok_facets = facets + token_lints.facets(tok_cfg)
    timed(
        "q_row_gates_tokens",
        lambda: cb.assemble_violations(attached, tok_facets).count(),
        side_trials,
    )
    # degenerate-content gate (late r5): one zero-shuffle Arrow pass per
    # facet (the measured optimum — a fused single pass was 1.3x slower,
    # see checks/degeneracy.py); expect ~ q_token_entropy + q_kgram_rep
    from tokenqc.checks import degeneracy

    degen_cfg = CheckConfig(
        n_partitions=64, checks=("degenerate",),
        min_entropy=1.5, max_dup_kgram_frac=0.2,
    )
    degen_in = seq.withColumn("partition_id", cb.partition_id_col(degen_cfg))
    timed(
        "q_degen_gate",
        lambda: degeneracy.violations(degen_in, degen_cfg).count(),
        mid_trials,
    )
    timed("q_uniqueness", lambda: uniqueness.violations(seq, cfg).count(), side_trials)
    timed("q_uniqueness_salted", lambda: uniqueness.violations(seq, cfg, salt=16).count(), side_trials)
    timed("q_invariant", lambda: invariant.violations(seq, ref, cfg).count(), side_trials)
    timed("q_drift", lambda: drift.verdicts(seq, baseline, cfg).count(), side_trials)
    # token-unigram drift (r5): one full pass over the token payload —
    # explode + map-side partial count to sources x 256 buckets, then the
    # JVM-side JS gate; the heaviest per-token side query by design
    tok_base = (
        drift.token_histogram(seq, n_buckets=256)
        .groupBy("bucket").agg(F.sum("cnt").alias("c"))
    )
    tok_tot = tok_base.agg(F.sum("c").alias("t"))
    tok_base = (
        seq.select("source").where("source is not null").distinct()
        .crossJoin(tok_base.crossJoin(tok_tot).select(
            "bucket", (F.col("c") / F.col("t")).alias("p")))
        .cache()
    )
    tok_base.count()  # baseline materialized outside the timed window
    timed(
        "q_token_drift",
        lambda: drift.token_js_divergence(seq, tok_base, n_buckets=256).count(),
        side_trials,
    )
    tok_base.unpersist()
    # token contamination (r5): the other full-payload pass — shingle
    # hashing is a vectorized Arrow stage, hit-counting against the
    # driver-broadcast benchmark set, zero shuffles (plan-pinned); each
    # trial includes the benchmark collect job the gate runs eagerly
    contam_src = seq.where(F.col("tokens").isNotNull() & (F.size("tokens") >= 8))
    contam_bench = contam_src.where(F.pmod(F.xxhash64("doc_id"), F.lit(509)) == 0)
    contam_train = contam_src.where(F.pmod(F.xxhash64("doc_id"), F.lit(509)) != 0)
    timed(
        "q_token_contamination",
        lambda: textqc.token_contamination_flags(
            contam_train, contam_bench, k=8
        ).count(),
        mid_trials,
    )
    # token entropy (late r5): third full-payload pass — flattened
    # lexsort/run-length per Arrow batch, one output row per doc, zero
    # shuffles (plan-pinned)
    timed(
        "q_token_entropy",
        lambda: textqc.token_entropy(seq, id_col="doc_id").count(),
        mid_trials,
    )
    # duplicated k-gram fraction (late r5): fourth full-payload pass —
    # window hashing + per-row distinct via lexsort/run-length inside
    # one Arrow stage, zero shuffles (plan-pinned)
    timed(
        "q_kgram_rep",
        lambda: textqc.token_kgram_repetition(seq, id_col="doc_id").count(),
        mid_trials,
    )
    # winnowed fingerprints (late r5): fifth full-payload pass — mod-P
    # window hashes + O(n) block sliding min inside one Arrow stage,
    # per-doc fps arrays exploded JVM-side (zero shuffles, plan-pinned)
    timed(
        "q_winnow_fps",
        lambda: dedup.winnow_fingerprints(seq, id_col="doc_id").count(),
        mid_trials,
    )
    # vocabulary surgery (late r5): the payload-rewrite pass — broadcast
    # numpy LUT, one Arrow gather per batch; includes the plan-build
    # collect of the remap table each trial (the real call shape)
    remap_half = (
        seq.sparkSession.range(0, 50257)
        .where(F.col("id") % 2 == 0)
        .select(F.col("id").cast("int").alias("old_id"),
                F.expr("id div 2").cast("int").alias("new_id"))
    )
    timed(
        "q_token_remap",
        lambda: textqc.remap_tokens(seq, remap_half, unk_id=0).count(),
        side_trials,
    )
    # sliding-window chunking (late r5): all-JVM sequence+explode+slice
    timed(
        "q_window_chunks",
        lambda: pack_mod.window_chunks(seq, size=512, stride=384, id_col="doc_id").count(),
        side_trials,
    )
    timed("q_stats_profile", lambda: stats.profile(seq, cfg).count(), side_trials)
    # structural snapshot diff (late r5): table-version validation is
    # ~free — two key-bounded partial-agg counts (table_diff, the key
    # column only) and one digest-level distinct diff (row_diff, which
    # DOES hash the token payload — the honest row-identity cost)
    from tokenqc.checks import snapshot as snap_mod

    snap_prev = seq.where(F.pmod(F.xxhash64("doc_id"), F.lit(10)) != 0)
    timed(
        "q_snapshot_diff",
        lambda: snap_mod.table_diff(seq, snap_prev).count(),
        side_trials,
    )
    dg = F.xxhash64("doc_id", "tokens")
    timed(
        "q_snapshot_row_diff",
        lambda: snap_mod.row_diff(
            seq.withColumn("_dg", dg), snap_prev.withColumn("_dg", dg), digest_col="_dg"
        ).count(),
        side_trials,
    )

    # text/embedding headliners on the driver testdata
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    timed("q_minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.6).count(), side_trials)
    timed("q_ann_topk", lambda: simsearch.brute_force_topk(emb, query_id=0, k=10).count(), side_trials)
    timed("q_exact_dedup", lambda: dedup.exact_duplicates(docs).count(), side_trials)
    # sub-document chunk dedup (late r5): digest-only shuffles — the md5
    # happens in the scan project; the dup join-back is AQE-decided
    timed("q_chunk_dedup", lambda: dedup.chunk_dup_stats(docs).count(), side_trials)
    # per-source corpus data card (late r5): two aggregation trees off
    # one narrow projection; dup tree joins (digest, source) aggregates
    timed("q_datacard", lambda: textqc.corpus_datacard(docs).count(), side_trials)
    # DSIR importance weights (late r5): one word-explode pass, both
    # bucket models from one conditional-sum agg, broadcast log-ratio
    # join-back — target slice is the wiki source
    # heavy entries (>=10 s at sf0.1): min-of-2 keeps the suite wall
    # bounded; the plan shape under measurement is identical
    heavy_trials = min(side_trials, 2)
    timed(
        "q_dsir",
        lambda: textqc.dsir_weights(docs, F.col("source") == "wiki").count(),
        heavy_trials,
    )
    # cross-doc duplicated-span coverage (late r5) on an EXPLICIT 1/10
    # doc stratum (named _s10; the full pass is ~10x this): the one
    # window-hash family member whose slim hash rows genuinely shuffle
    # (3 keyed exchanges), unlike the zero-shuffle Arrow k-gram passes
    seq_s10 = seq.where(F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)
    timed(
        "q_dup_spans_s10",
        lambda: dedup.dup_span_coverage(seq_s10, id_col="doc_id").count(),
        heavy_trials,
    )

    # sequence packing over the bench token table (distributed prefix
    # sum + span explode); the synthetic unique key stands in for the
    # engine's rn — timing is key-agnostic
    from tokenqc.textops import pack

    packable = (
        seq.where(F.col("n_tok").isNotNull())
        .select(F.monotonically_increasing_id().alias("rn"), "n_tok")
    )
    timed(
        "q_pack_spans",
        lambda: pack.chunk_spans(packable, cap=2048, order_cols=("rn",)).count(),
        side_trials,
    )
    # materialized packs: spans + slice + one pack_id shuffle + assembly
    # — the full loader contract over the real token arrays
    packable_tok = (
        seq.where(F.col("tokens").isNotNull())  # size(NULL) is NULL under ANSI
        .select(
            F.monotonically_increasing_id().alias("rn"),
            "tokens",
            F.size("tokens").cast("int").alias("nt"),
        )
    )
    timed(
        "q_pack_tokens",
        lambda: pack.pack_tokens(
            packable_tok, cap=2048, order_cols=("rn",), tokens_col="tokens", n_col="nt"
        ).count(),
        side_trials,
    )
    return timings, extras


def single_run(master: str, sf_dir: str, bench_sf: float | None = None) -> dict:
    sf = bench_sf if bench_sf is not None else _sf_of(sf_dir)
    data_dir = ensure_bench_data(sf)
    spark = build_spark(master)
    timings, extras = run_suite(spark, data_dir, sf_dir)
    queries = {k: v for k, v in timings.items() if k.startswith("q_")}
    total = round(sum(queries.values()), 3)
    return {
        "metric": "tokenqc_headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "master": master,
        **extras,
    }


def scaling_run(sf_dir: str, low: int = 4, high: int = 16, bench_sf: float | None = None) -> dict:
    """Spawn fresh JVMs at local[low] and local[high]; same input, same
    job; report throughput at both + scaling efficiency over the 4x.

    At small inputs driver-side orchestration dominates and the 4x adds
    nothing (measured ~0.2 "efficiency" at 600k rows) — scaling evidence
    should be collected at a worker-dominated size (bench_sf >= 1.0,
    6M rows / ~18 GB of token arrays)."""
    bench_sf = bench_sf if bench_sf is not None else _sf_of(sf_dir)
    ensure_bench_data(bench_sf)  # generate once, outside timing
    # this box's hypervisor throttling is bimodal (identical warm trials
    # swing 2-6x within one process); min-of-5 per leg isolates engine
    # capability from throttled epochs — see BENCH/BASELINE.md
    os.environ.setdefault("TOKENQC_QC_TRIALS", "5")
    results = {}
    for n in (low, high):
        # pin the JVM to n cores (taskset) so the "small cluster" leg
        # cannot borrow the idle cores for GC/IO helper threads — local[n]
        # alone constrains task slots, not the JVM's availableProcessors
        cmd = [sys.executable, os.path.abspath(__file__), "--master", f"local[{n}]",
               "--sf-dir", sf_dir, "--bench-sf", str(bench_sf)]
        os.environ["TOKENQC_SKIP_SIDE"] = "1"  # legs: headline only
        os.environ.pop("TOKENQC_PHASE_DETAIL", None)  # legs: production sink path
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[n] = json.loads(line)
    thr_lo = results[low]["throughput_rows_per_sec"]
    thr_hi = results[high]["throughput_rows_per_sec"]
    factor = high / low
    eff = round((thr_hi / thr_lo) / factor, 3)
    return {
        "metric": "tokenqc_scaling_efficiency",
        "value": eff,
        "unit": f"efficiency local[{low}]->local[{high}]",
        "sf": bench_sf,
        "throughput_low": thr_lo,
        "throughput_high": thr_hi,
        "qc_sec_low": results[low]["queries"]["q_full_qc_run"],
        "qc_sec_high": results[high]["queries"]["q_full_qc_run"],
        "qc_trials_low": results[low].get("qc_trials"),
        "qc_trials_high": results[high].get("qc_trials"),
        "qc_gc_low": results[low].get("qc_gc_sec"),
        "qc_gc_high": results[high].get("qc_gc_sec"),
        "qc_trial_gc_low": results[low].get("qc_trial_gc_secs"),
        "qc_trial_gc_high": results[high].get("qc_trial_gc_secs"),
        "qc_phases_low": results[low].get("qc_phase_breakdown"),
        "qc_phases_high": results[high].get("qc_phase_breakdown"),
        "suite_low": results[low]["queries"],
        "suite_high": results[high]["queries"],
    }


def _new_stage_stats(ui: str, seen: set) -> list[dict]:
    """Per-stage task-duration stats for stages completed since `seen`
    was last updated, via the UI REST API (local, no network)."""
    import urllib.request

    def get(path):
        with urllib.request.urlopen(f"{ui}{path}", timeout=30) as r:
            return json.loads(r.read())

    app_id = get("/api/v1/applications")[0]["id"]
    out = []
    for st in get(f"/api/v1/applications/{app_id}/stages?status=complete"):
        sid = (st["stageId"], st["attemptId"])
        if sid in seen:
            continue
        seen.add(sid)
        # paginate: a single ?length=N request silently truncates stages
        # with more tasks, under-reporting the max/p50 the skew evidence
        # is built on (r4 ADVICE) — loop offsets until a short page
        tasks: list[dict] = []
        page = 5000
        while True:
            batch = get(
                f"/api/v1/applications/{app_id}/stages/{st['stageId']}/{st['attemptId']}"
                f"/taskList?offset={len(tasks)}&length={page}"
            )
            tasks.extend(batch)
            if len(batch) < page:
                break
        durs = sorted(t.get("duration", 0) for t in tasks)
        if durs:
            out.append({
                "stage": st["stageId"], "name": st["name"].split(" ")[0],
                "n_tasks": len(durs), "max_task_ms": durs[-1],
                "p50_task_ms": durs[len(durs) // 2],
            })
    return out


def skew_run(master: str, sf_dir: str, bench_sf: float | None = None,
             hot_denom: int = 10, n_salt: int = 16) -> dict:
    """Planted-skew benchmark (the north rule names skewed-partition
    handling explicitly): remap ~1/hot_denom of doc_ids onto ONE hot key
    over the cached bench sequences, then time two aggregation shapes:

    - count path: uniqueness.violations plain vs salt=n_salt. Expected
      ~parity — map-side partial aggregation already pre-combines a hot
      key to one row per map task, so the plain groupBy.count is the
      right default even under skew (recorded to document WHY).
    - distinct path: groupBy(doc_id).agg(count_distinct(sig)) plain vs
      skew.salted_distinct_count. Also ~parity for a single distinct:
      Catalyst's rewrite already shuffles the dedup by (key, value) —
      recorded as the measured boundary of where salting helps.
    - enumeration path (the real straggler): dup-row enumeration via a
      per-key WINDOW (every hot-key row on ONE task) vs
      uniqueness.enumerate_rows_skewsafe (per-(key,sig) aggregation +
      broadcast dup-dimension join — the table is never shuffled by the
      hot key). Same output multiset; walls + max-task-time ratio are
      the skew evidence the north rule asks for.

    Task-time skew is read from the UI REST API (enabled only in this
    mode): per-variant max/p50 task duration over its stages.
    """
    from pyspark.sql import functions as F

    from tokenqc.checks import uniqueness
    from tokenqc.checks.base import CheckConfig
    from tokenqc.session import get_spark
    from tokenqc import skew as skew_mod

    sf = bench_sf if bench_sf is not None else _sf_of(sf_dir)
    data_dir = ensure_bench_data(sf)
    n = _n_threads(master)
    heap = os.environ.get("TOKENQC_DRIVER_MEM", f"{24 if n <= 16 else 32}g")
    spark = get_spark(
        "tokenqc-skew", master=master,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.driver.memory": heap,
            "spark.driver.extraJavaOptions": f"-Xms{heap} -XX:+UseParallelGC",
        },
    )
    cfg = CheckConfig(n_partitions=64)
    seq = spark.read.parquet(os.path.join(data_dir, "sequences"))
    if hot_denom > 0:
        hot = F.when(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(hot_denom)) == 0, F.lit("hotdoc")
        ).otherwise(F.col("doc_id"))
    else:  # hot_denom<=0: the 0%-hot control row (no planted key)
        hot = F.col("doc_id")
    skewed = seq.select(hot.alias("doc_id"), "tokens").persist()
    n_rows = skewed.count()  # materialize the cache outside timing
    sig = F.xxhash64("tokens")
    # the engine-flow dispatch signal: violations are a per-run output
    # the runner always has. Materialized LAZILY, on enum_auto_reuse's
    # warm-up call only — persisting it up front contaminates
    # count_plain (Spark's cache matches the canonicalized violations
    # plan, so the identical count_plain job would read the cache and
    # report a ~0.3 s wall for a multi-second aggregation).
    viol_state: dict = {}

    def _viol_cached():
        if "df" not in viol_state:
            v = uniqueness.violations(skewed, cfg).persist()
            v.count()
            viol_state["df"] = v
        return viol_state["df"]

    variants = {
        "count_plain": lambda: uniqueness.violations(skewed, cfg).count(),
        "count_salted": lambda: uniqueness.violations(skewed, cfg, salt=n_salt).count(),
        "distinct_plain": lambda: (
            skewed.groupBy("doc_id").agg(F.count_distinct(sig).alias("cnt"))
            .where(F.col("cnt") > 1).count()
        ),
        "distinct_salted": lambda: (
            skew_mod.salted_distinct_count(skewed, "doc_id", sig, n_salt)
            .where(F.col("cnt") > 1).count()
        ),
        "enum_window": lambda: uniqueness.enumerate_rows(skewed, cfg).count(),
        "enum_skewsafe": lambda: uniqueness.enumerate_rows_skewsafe(skewed, cfg).count(),
        # the dispatcher, standalone: wall INCLUDES the sampled skew
        # probe (one slim-column scan — the cost a cold caller pays)
        "enum_auto": lambda: uniqueness.enumerate_rows_auto(skewed, cfg).count(),
        # the dispatcher, engine flow: the runner always has the
        # uniqueness violations + row count, so dispatch is a free
        # aggregation over the bounded dup-key frame (r4 verdict #2).
        # The warm-up call materializes the persisted violations frame
        # (it MUST exist before this variant runs, not before count_*).
        "enum_auto_reuse": lambda: uniqueness.enumerate_rows_auto(
            skewed, cfg, violations_df=_viol_cached(), n_rows=n_rows
        ).count(),
    }
    ui = spark.sparkContext.uiWebUrl
    seen: set = set()
    results: dict[str, dict] = {}
    trials = int(os.environ.get("TOKENQC_SIDE_TRIALS", "3"))
    for name, fn in variants.items():
        fn()  # warm (codegen + cache)
        _new_stage_stats(ui, seen)  # drain warm-up stages out of `seen`
        best, out, best_stages = None, None, []
        for _ in range(trials):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            # attribute stage stats PER TRIAL and keep the min-wall
            # trial's — the box's bimodal throttle otherwise leaks a
            # throttled trial's task times into the reported skew
            trial_stages = _new_stage_stats(ui, seen)
            if best is None or dt < best:
                best, best_stages = dt, trial_stages
        stages = best_stages
        heaviest = max(stages, key=lambda s: s["max_task_ms"]) if stages else {}
        results[name] = {
            "wall_sec": round(best, 3), "result_rows": out,
            "max_task_ms": heaviest.get("max_task_ms"),
            "p50_task_ms": heaviest.get("p50_task_ms"),
            "n_tasks": heaviest.get("n_tasks"),
        }
    if "df" in viol_state:
        viol_state["df"].unpersist()
    skewed.unpersist()
    ep, es = results["enum_window"], results["enum_skewsafe"]
    ea = results["enum_auto_reuse"]
    return {
        "metric": "tokenqc_skew_bench",
        "sf": sf, "master": master, "n_rows": n_rows,
        "hot_frac": round(1.0 / hot_denom, 3) if hot_denom > 0 else 0.0,
        "n_salt": n_salt,
        "variants": results,
        "enum_auto_vs_best": round(
            ea["wall_sec"] / min(ep["wall_sec"], es["wall_sec"]), 3
        ),
        "enum_wall_speedup": round(ep["wall_sec"] / es["wall_sec"], 3),
        "enum_max_task_ratio": (
            round(ep["max_task_ms"] / es["max_task_ms"], 3)
            if ep.get("max_task_ms") and es.get("max_task_ms") else None
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--master", default=f"local[{DEFAULT_CPUS}]")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--bench-sf", type=float, default=None,
                    help="override the synthetic sequences scale (rows = sf*6e6)")
    ap.add_argument("--skew", action="store_true",
                    help="planted-skew experiment: plain vs salted aggregation "
                    "walls + per-task skew on a one-hot-key input")
    ap.add_argument("--hot-denom", type=int, default=10,
                    help="skew mode: 1/hot_denom of rows land on ONE doc_id")
    ap.add_argument("--n-salt", type=int, default=16)
    args = ap.parse_args()
    if args.skew:
        print(json.dumps(skew_run(args.master, args.sf_dir, bench_sf=args.bench_sf,
                                  hot_denom=args.hot_denom, n_salt=args.n_salt)))
    elif args.scaling:
        print(json.dumps(scaling_run(args.sf_dir, bench_sf=args.bench_sf)))
    else:
        print(json.dumps(single_run(args.master, args.sf_dir, args.bench_sf)))


if __name__ == "__main__":
    main()
