"""Format gate: identifier shape validation.

Engine analogue of the reference's URL-format regex gate
(/root/reference/main.nf:62-66, pattern
``^https://github\\.com/[^/]+/[^/]+\\.git$``). Policy difference, by
design: the reference *throws* on a malformed URL (main.nf:84) and kills
the run; the engine routes malformed rows to the violations table and
keeps going (the errorStrategy-'ignore' philosophy applied at row level).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig, Facet

CHECK = "format"


def facets(cfg: CheckConfig) -> list[Facet]:
    return [
        Facet(
            CHECK,
            "bad_doc_id",
            F.col("doc_id").isNotNull() & ~F.col("doc_id").rlike(cfg.doc_id_pattern),
            F.col("doc_id"),
            f"doc_id RLIKE {cfg.doc_id_pattern}",
        )
    ]
