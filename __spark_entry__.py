"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine-native gates run on a `sequences(doc_id, tokens, n_tok, source)`
table derived deterministically from `orders` (tokenqc.harness), so the
oracle covers the engine's real check operators, not just lookalikes.
Non-SQL-expressible ops (MinHash-LSH, SimHash, IVF-ANN, pandas top-k,
drift p-values) are registered without oracles → rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from tokenqc import harness as H
from tokenqc import harness_text as HT


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full per-(partition, check) PASS/FAIL verdict table of the
    fused row-level QC pass over the derived sequences table at sf0.001."""
    return H.q_seq_verdicts(spark, "/root/testdata/sf0.001")


def _rows_only_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Operators whose math is not ANSI-SQL-expressible (hash families,
    pandas UDFs) — registered for the weaker rows-only check."""
    from tokenqc.checks import base as cb
    from tokenqc.checks import drift, uniqueness
    from tokenqc.textops import dedup, simsearch

    def q_minhash_lsh(spark, sf_dir):
        return dedup.minhash_lsh_pairs(HT.derive_corpus(spark, sf_dir), threshold=0.6)

    def q_simhash_pairs(spark, sf_dir):
        return dedup.simhash_near_pairs(HT.derive_corpus(spark, sf_dir), max_hamming=8)

    def q_ivf_ann_topk(spark, sf_dir):
        emb = HT.load(spark, sf_dir, "embeddings")
        cents = simsearch.seed_centroids(emb, n_cells=8)
        return simsearch.ivf_topk(emb, cents, query_id=0, k=10, n_probe=4)

    def q_pandas_ann_topk(spark, sf_dir):
        return simsearch.pandas_cosine_topk(HT.load(spark, sf_dir, "embeddings"), 0, k=10)

    def q_drift_verdicts(spark, sf_dir):
        # full drift gate incl. applyInPandas chi2/KS p-values: web as its
        # own baseline must PASS; far-off sources FAIL
        seq = H.derive_sequences(spark, sf_dir)
        cfg = cb.CheckConfig(n_partitions=16)
        hist = drift.observed_histogram(seq, cfg)
        total = hist.where("source = 'web'").groupBy().sum("cnt").first()[0]
        base = (
            hist.where("source = 'web'")
            .selectExpr("source", "bucket", f"cnt / {total} as p")
        )
        # apply web's shape as every source's baseline
        import pyspark.sql.functions as F

        srcs = seq.where("source is not null").select("source").distinct()
        base_all = srcs.crossJoin(base.select("bucket", "p"))
        return drift.verdicts(seq, base_all, cfg)

    def q_uniqueness_salted(spark, sf_dir):
        seq = H.derive_sequences(spark, sf_dir)
        return uniqueness.violations(seq, cb.CheckConfig(n_partitions=16), salt=8).select(
            "doc_id", "observed"
        )

    return {
        "minhash_lsh_pairs": q_minhash_lsh,
        "simhash_pairs": q_simhash_pairs,
        "ivf_ann_topk": q_ivf_ann_topk,
        "pandas_ann_topk": q_pandas_ann_topk,
        "drift_verdicts_full": q_drift_verdicts,
        "uniqueness_salted": q_uniqueness_salted,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        # engine gates on the derived sequences table
        "seq_violation_counts": H.q_seq_violation_counts,
        "seq_format_violations": H.q_seq_format_violations,
        "seq_uniqueness": H.q_seq_uniqueness,
        "seq_referential": H.q_seq_referential,
        "seq_verdicts": H.q_seq_verdicts,
        "seq_invariant": H.q_seq_invariant,
        "seq_histogram": H.q_seq_histogram,
        "seq_stats": H.q_seq_stats,
        "seq_scores": H.q_seq_scores,
        "seq_drift_stats": H.q_seq_drift_stats,
        # dedup / similarity / text QC
        "doc_exact_dup": HT.q_doc_exact_dup,
        "doc_ngram_jaccard": HT.q_doc_ngram_jaccard,
        "embed_cosine_pairs": HT.q_embed_cosine_pairs,
        "ann_topk": HT.q_ann_topk,
        "doc_token_count": HT.q_doc_token_count,
        "doc_quality": HT.q_doc_quality,
        "doc_langid": HT.q_doc_langid,
        "doc_fingerprint": HT.q_doc_fingerprint,
        # QC gates over the TPC-H-ish tables
        "events_completeness": HT.q_events_completeness,
        "events_histogram": HT.q_events_histogram,
        "lineitem_uniqueness": HT.q_lineitem_uniqueness,
        "lineitem_referential": HT.q_lineitem_referential,
        "lineitem_structural": HT.q_lineitem_structural,
        "customer_format": HT.q_customer_format,
        "top_violation_examples": HT.q_top_violation_examples,
        "outcome_counts": HT.q_outcome_counts,
        "content_flags": HT.q_content_flags,
        "events_sessions": HT.q_events_sessions,
        "seq_quantiles": HT.q_seq_quantiles,
    }
    q.update(_rows_only_queries())
    return q


def oracle_sql() -> dict[str, str]:
    return {
        "seq_violation_counts": H.oracle_seq_violation_counts(),
        "seq_format_violations": H.oracle_seq_format_violations(),
        "seq_uniqueness": H.oracle_seq_uniqueness(),
        "seq_referential": H.oracle_seq_referential(),
        "seq_verdicts": H.oracle_seq_verdicts(),
        "seq_invariant": H.oracle_seq_invariant(),
        "seq_histogram": H.oracle_seq_histogram(),
        "seq_stats": H.oracle_seq_stats(),
        "seq_scores": H.oracle_seq_scores(),
        "seq_drift_stats": H.oracle_seq_drift_stats(),
        "doc_exact_dup": HT.oracle_doc_exact_dup(),
        "doc_ngram_jaccard": HT.oracle_doc_ngram_jaccard(),
        "embed_cosine_pairs": HT.oracle_embed_cosine_pairs(),
        "ann_topk": HT.oracle_ann_topk(),
        "doc_token_count": HT.oracle_doc_token_count(),
        "doc_quality": HT.oracle_doc_quality(),
        "doc_langid": HT.oracle_doc_langid(),
        "doc_fingerprint": HT.oracle_doc_fingerprint(),
        "events_completeness": HT.oracle_events_completeness(),
        "events_histogram": HT.oracle_events_histogram(),
        "lineitem_uniqueness": HT.oracle_lineitem_uniqueness(),
        "lineitem_referential": HT.oracle_lineitem_referential(),
        "lineitem_structural": HT.oracle_lineitem_structural(),
        "customer_format": HT.oracle_customer_format(),
        "top_violation_examples": HT.oracle_top_violation_examples(),
        "outcome_counts": HT.oracle_outcome_counts(),
        "content_flags": HT.oracle_content_flags(),
        "events_sessions": HT.oracle_events_sessions(),
        "seq_quantiles": HT.oracle_seq_quantiles(),
    }
