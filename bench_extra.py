#!/usr/bin/env python
"""Optimization-round measurement harness (bench.py stays FROZEN).

Isolates each heavy operator with the noop sink (guide §1.4) so the
computation is timed without count()'s column-pruning distortions, labels
jobs (§1.5), and dumps `.explain("formatted")` plans for the before/after
evidence in plans/r06/.

Usage:
  python bench_extra.py --ops q_degen_gate,q_dsir          # time (noop, min-of-N)
  python bench_extra.py --plans --out plans/r06 --suffix before
  python bench_extra.py --ops all --trials 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_ops(spark, data_dir: str, sf_dir: str):
    """The heavy bench queries, same inputs/params as bench.run_suite,
    each returning a fresh DataFrame per call (no shared lazy state)."""
    from pyspark.sql import functions as F

    from tokenqc.checks import base as cb, degeneracy, drift, invariant, snapshot as snap_mod
    from tokenqc.textops import dedup, pack as pack_mod, textqc

    seq = spark.read.parquet(os.path.join(data_dir, "sequences"))
    ref = spark.read.parquet(os.path.join(data_dir, "reference_tokens"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    degen_cfg = cb.CheckConfig(
        n_partitions=64, checks=("degenerate",), min_entropy=1.5, max_dup_kgram_frac=0.2
    )
    degen_in = seq.withColumn("partition_id", cb.partition_id_col(degen_cfg))
    contam_src = seq.where(F.col("tokens").isNotNull() & (F.size("tokens") >= 8))
    contam_bench = contam_src.where(F.pmod(F.xxhash64("doc_id"), F.lit(509)) == 0)
    contam_train = contam_src.where(F.pmod(F.xxhash64("doc_id"), F.lit(509)) != 0)
    seq_s10 = seq.where(F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)
    cfg = cb.CheckConfig(n_partitions=64)

    def remap_df():
        remap_half = (
            spark.range(0, 50257)
            .where(F.col("id") % 2 == 0)
            .select(F.col("id").cast("int").alias("old_id"),
                    F.expr("id div 2").cast("int").alias("new_id"))
        )
        return textqc.remap_tokens(seq, remap_half, unk_id=0)

    def packable_tok():
        return (
            seq.where(F.col("tokens").isNotNull())
            .select(F.monotonically_increasing_id().alias("rn"), "tokens",
                    F.size("tokens").cast("int").alias("nt"))
        )

    return {
        "q_degen_gate": lambda: degeneracy.violations(degen_in, degen_cfg),
        "q_token_entropy": lambda: textqc.token_entropy(seq, id_col="doc_id"),
        "q_kgram_rep": lambda: textqc.token_kgram_repetition(seq, id_col="doc_id"),
        "q_token_contamination": lambda: textqc.token_contamination_flags(
            contam_train, contam_bench, k=8
        ),
        "q_winnow_fps": lambda: dedup.winnow_fingerprints(seq, id_col="doc_id"),
        "q_token_remap": remap_df,
        "q_dup_spans_s10": lambda: dedup.dup_span_coverage(seq_s10, id_col="doc_id"),
        "q_dsir": lambda: textqc.dsir_weights(docs, F.col("source") == "wiki"),
        "q_invariant": lambda: invariant.violations(seq, ref, cfg),
        "q_token_drift_hist": lambda: drift.token_histogram(seq, n_buckets=256),
        "q_pack_tokens": lambda: pack_mod.pack_tokens(
            packable_tok(), cap=2048, order_cols=("rn",), tokens_col="tokens", n_col="nt"
        ),
        "q_window_chunks": lambda: pack_mod.window_chunks(
            seq, size=512, stride=384, id_col="doc_id"
        ),
        "q_minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs, threshold=0.6),
        "q_snapshot_row_diff": lambda: snap_mod.row_diff(
            seq.withColumn("_dg", F.xxhash64("doc_id", "tokens")),
            seq.where(F.pmod(F.xxhash64("doc_id"), F.lit(10)) != 0).withColumn(
                "_dg", F.xxhash64("doc_id", "tokens")
            ),
            digest_col="_dg",
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=None, help="comma list or 'all'")
    ap.add_argument("--plans", action="store_true", help="dump explain(formatted)")
    ap.add_argument("--out", default="plans/r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    import bench

    sf = bench._sf_of(args.sf_dir)
    data_dir = bench.ensure_bench_data(sf)
    spark = bench.build_spark(f"local[{bench.DEFAULT_CPUS}]")
    ops = build_ops(spark, data_dir, args.sf_dir)

    names = list(ops) if args.ops in (None, "all") else [
        n for n in args.ops.split(",") if n
    ]
    unknown = [n for n in names if n not in ops]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}; known: {list(ops)}")

    if args.plans:
        os.makedirs(args.out, exist_ok=True)
        for n in names:
            df = ops[n]()
            jvm = spark._jvm
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            plan = df._jdf.queryExecution().explainString(mode)
            path = os.path.join(args.out, f"{n}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}", file=sys.stderr)
        return

    # warm page cache + python workers the way bench.py does
    from pyspark.sql import functions as F

    seq = spark.read.parquet(os.path.join(data_dir, "sequences"))
    seq.select(F.sum(F.size("tokens"))).collect()
    wdf = spark.range(64).withColumn("g", F.col("id") % 4)
    wdf.groupBy("g").applyInPandas(lambda p: p, schema="id long, g long").count()

    results = {}
    for n in names:
        best, samples = None, []
        for t in range(max(1, args.trials)):
            spark.sparkContext.setJobDescription(f"{n} trial {t}")
            t0 = time.monotonic()
            ops[n]().write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 3)
            samples.append(dt)
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        results[n] = {"min": best, "samples": samples}
        print(f"{n}: min={best} samples={samples}", file=sys.stderr)
    print(json.dumps({"sf": sf, "noop_min_sec": results}))


if __name__ == "__main__":
    main()
