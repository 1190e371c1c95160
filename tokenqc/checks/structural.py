"""Structural gate: internal consistency of each row.

Engine analogue of the reference's tests-presence + test-execution
consistency checks (/root/reference/modules/ProcessRepo.nf:77-81,
bin/run_tests.py:159-162 where total must equal the sum of outcome
buckets): declared `n_tok` must equal the actual token count, and
counts must be non-negative.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig, Facet

CHECK = "structural"


def facets(cfg: CheckConfig) -> list[Facet]:
    both = F.col("tokens").isNotNull() & F.col("n_tok").isNotNull()
    return [
        Facet(
            CHECK,
            "ntok_mismatch",
            both & (F.size("tokens") != F.col("n_tok")),
            F.concat_ws("!=", F.col("n_tok"), F.size("tokens")),
            "n_tok == size(tokens)",
        ),
        Facet(
            CHECK,
            "negative_n_tok",
            F.col("n_tok").isNotNull() & (F.col("n_tok") < 0),
            F.col("n_tok"),
            "n_tok >= 0",
        ),
    ]
