"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine-native gates run on a `sequences(doc_id, tokens, n_tok, source)`
table derived deterministically from `orders` (tokenqc.harness), so the
oracle covers the engine's real check operators, not just lookalikes.
Hash-family ops (MinHash-LSH, IVF-ANN, hyperplane-LSH near-dup, salted
uniqueness, pandas top-k, the drift p-value gate) are oracle-checked
against the exact closed-form result their approximate path must
recover. SimHash's raw pair query (xxhash64 signatures, no SQL twin)
stays rows-only, but its recall is now driver-verified too via the
planted-pair containment query (simhash_planted_recall).
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


def _hash_family_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Hash-family / pandas-UDF operators. Most ARE oracle-checked now:
    their outputs are deterministic (fixed seeds) and verified against
    the exact closed-form result the approximate path must recover —
    a green row certifies LSH/IVF recall, not just row counts."""
    from tokenqc.checks import base as cb
    from tokenqc.checks import uniqueness
    from tokenqc.textops import dedup, simsearch

    def q_minhash_lsh(spark, sf_dir):
        # banded-LSH candidates, exact-Jaccard verified; at this corpus the
        # planted near-dups are far above the 0.5 S-curve threshold, so
        # the output must EQUAL the exact inverted-index result
        return dedup.minhash_lsh_pairs(HT.derive_corpus(spark, sf_dir), threshold=0.6)

    def q_simhash_pairs(spark, sf_dir):
        # 9 chunk buckets (derived from max_hamming=8: pigeonhole needs
        # d+1) — xxhash64-based signature, not SQL-expressible: rows-only
        return dedup.simhash_near_pairs(HT.derive_corpus(spark, sf_dir), max_hamming=8)

    def q_ivf_ann_topk(spark, sf_dir):
        # probing 4 of 8 cells must still recover the exact top-10 here
        emb = HT.load(spark, sf_dir, "embeddings")
        cents = simsearch.seed_centroids(emb, n_cells=8)
        return simsearch.ivf_topk(emb, cents, query_id=0, k=10, n_probe=4)

    def q_pandas_ann_topk(spark, sf_dir):
        return simsearch.pandas_cosine_topk(HT.load(spark, sf_dir, "embeddings"), 0, k=10)

    def q_uniqueness_salted(spark, sf_dir):
        # two-stage salted aggregation must emit the identical violation
        # set as the plain groupBy (oracle_seq_uniqueness)
        seq = H.derive_sequences(spark, sf_dir)
        return uniqueness.violations(seq, cb.CheckConfig(n_partitions=16), salt=8).select(
            "doc_id", "observed"
        )

    return {
        "minhash_lsh_pairs": q_minhash_lsh,
        "simhash_pairs": q_simhash_pairs,
        "simhash_planted_recall": HT.q_simhash_planted_recall,
        "ivf_ann_topk": q_ivf_ann_topk,
        "pandas_ann_topk": q_pandas_ann_topk,
        "drift_verdicts_full": H.q_seq_drift_verdicts,
        "uniqueness_salted": q_uniqueness_salted,
        "embed_neardup_lsh": HT.q_embed_neardup_lsh,
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
        "seq_drift_js": H.q_seq_drift_js,
        "seq_vocab_topk": H.q_seq_vocab_topk,
        "seq_vocab_by_source": H.q_seq_vocab_by_source,
        "seq_heavy_hitters": H.q_seq_heavy_hitters,
        # dedup / similarity / text QC
        "doc_exact_dup": HT.q_doc_exact_dup,
        "doc_ngram_jaccard": HT.q_doc_ngram_jaccard,
        "embed_cosine_pairs": HT.q_embed_cosine_pairs,
        "ann_topk": HT.q_ann_topk,
        "ann_batch_topk": HT.q_ann_batch_topk,
        "doc_token_count": HT.q_doc_token_count,
        "doc_quality": HT.q_doc_quality,
        "doc_langid": HT.q_doc_langid,
        "doc_fingerprint": HT.q_doc_fingerprint,
        "doc_contamination": HT.q_doc_contamination,
        "dedup_clusters": HT.q_dedup_clusters,
        "doc_split": HT.q_doc_split,
        "doc_curation": HT.q_doc_curation,
        "doc_curation_lsh": HT.q_doc_curation_lsh,
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
        "seq_quantiles_approx": HT.q_seq_quantiles_approx,
        "events_asof": HT.q_events_asof,
        "lineitem_range_join": HT.q_lineitem_range_join,
        "events_rollup": HT.q_events_rollup,
        # round-3: repetition filter, PII detect/scrub, sequence packing
        "doc_repetition": HT.q_doc_repetition,
        "doc_pii": HT.q_doc_pii,
        "doc_pii_scrub": HT.q_doc_pii_scrub,
        "seq_pack_offsets": HT.q_seq_pack_offsets,
        "seq_pack_spans": HT.q_seq_pack_spans,
        "seq_pack_by_source": HT.q_seq_pack_by_source,
    }
    q.update(_hash_family_queries())
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
        "seq_drift_js": H.oracle_seq_drift_js(),
        "seq_vocab_topk": H.oracle_seq_vocab_topk(),
        "seq_vocab_by_source": H.oracle_seq_vocab_by_source(),
        "seq_heavy_hitters": H.oracle_seq_heavy_hitters(),
        "doc_exact_dup": HT.oracle_doc_exact_dup(),
        "doc_ngram_jaccard": HT.oracle_doc_ngram_jaccard(),
        "embed_cosine_pairs": HT.oracle_embed_cosine_pairs(),
        "ann_topk": HT.oracle_ann_topk(),
        "ann_batch_topk": HT.oracle_ann_batch_topk(),
        "doc_token_count": HT.oracle_doc_token_count(),
        "doc_quality": HT.oracle_doc_quality(),
        "doc_langid": HT.oracle_doc_langid(),
        "doc_fingerprint": HT.oracle_doc_fingerprint(),
        "doc_contamination": HT.oracle_doc_contamination(),
        "dedup_clusters": HT.oracle_dedup_clusters(),
        "doc_split": HT.oracle_doc_split(),
        "doc_curation": HT.oracle_doc_curation(),
        "doc_curation_lsh": HT.oracle_doc_curation(),
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
        "seq_quantiles_approx": HT.oracle_seq_quantiles_approx(),
        "events_asof": HT.oracle_events_asof(),
        "lineitem_range_join": HT.oracle_lineitem_range_join(),
        "events_rollup": HT.oracle_events_rollup(),
        "doc_repetition": HT.oracle_doc_repetition(),
        "doc_pii": HT.oracle_doc_pii(),
        "doc_pii_scrub": HT.oracle_doc_pii_scrub(),
        "seq_pack_offsets": HT.oracle_seq_pack_offsets(),
        "seq_pack_spans": HT.oracle_seq_pack_spans(),
        "seq_pack_by_source": HT.oracle_seq_pack_by_source(),
        # hash-family paths verified against exact closed-form results:
        # LSH candidates + exact verification must RECOVER the exact sets
        "minhash_lsh_pairs": HT.oracle_doc_ngram_jaccard(),
        "ivf_ann_topk": HT.oracle_ann_topk(),
        "pandas_ann_topk": HT.oracle_ann_topk(),
        "uniqueness_salted": H.oracle_seq_uniqueness(),
        "drift_verdicts_full": H.oracle_seq_drift_verdicts(),
        "embed_neardup_lsh": HT.oracle_embed_neardup_lsh(),
        # the planted-pair containment set is closed-form: the driver now
        # verifies SimHash RECALL on the planted exact copies
        "simhash_planted_recall": HT.oracle_simhash_planted_recall(),
        # simhash_pairs itself stays rows-only: xxhash64-based signatures
        # are not ANSI-SQL-expressible; full recall is unit-tested vs
        # brute-force Hamming at d=8 instead (tests/test_textops.py)
    }
