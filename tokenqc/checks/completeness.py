"""Completeness gate: nothing required may be missing or empty.

Engine analogue of the reference's presence checks — dependency files,
test dirs, README sections (/root/reference/modules/ProcessRepo.nf:50-81,
bin/analyze_joss.py:163-197). There a missing artifact fails the item;
here a NULL/empty required field flags the row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig, Facet

CHECK = "completeness"


def facets(cfg: CheckConfig) -> list[Facet]:
    return [
        Facet(CHECK, "null_doc_id", F.col("doc_id").isNull(), F.lit(None), "doc_id IS NOT NULL"),
        Facet(CHECK, "null_tokens", F.col("tokens").isNull(), F.lit(None), "tokens IS NOT NULL"),
        Facet(
            CHECK,
            "empty_tokens",
            F.col("tokens").isNotNull() & (F.size("tokens") == 0),
            F.lit("size=0"),
            "size(tokens) > 0",
        ),
        Facet(CHECK, "null_n_tok", F.col("n_tok").isNull(), F.lit(None), "n_tok IS NOT NULL"),
        Facet(CHECK, "null_source", F.col("source").isNull(), F.lit(None), "source IS NOT NULL"),
    ]
