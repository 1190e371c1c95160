"""Referential gate: `source` must exist in the allowed-sources dimension.

Engine analogue of the reference's keyed result assembly + whitelist
semantics (/root/reference/main.nf:100-102 `combine by:[0,1]`, and the
URL-host whitelist baked into the format regex main.nf:64).

Scale plan: the dimension is tiny (a whitelist) → **broadcast** left
join adds one nullable marker column with no shuffle of the fact table;
the facet is then fused into the same single scan as the row-level
gates. (A collected `isin` list would also work but stops scaling with
the dim; broadcast join is the honest 100-TB shape.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig, Facet

CHECK = "referential"
_MARKER = "__src_allowed"


def attach(df: DataFrame, allowed_sources: DataFrame) -> DataFrame:
    """Broadcast-left-join the whitelist; adds boolean marker column."""
    dim = (
        allowed_sources.where(F.col("active"))
        .select("source", F.lit(True).alias(_MARKER))
        .distinct()
    )
    return df.join(F.broadcast(dim), on="source", how="left")


def facets(cfg: CheckConfig) -> list[Facet]:
    return [
        Facet(
            CHECK,
            "unknown_source",
            F.col("source").isNotNull() & F.col(_MARKER).isNull(),
            F.col("source"),
            "source IN allowed_sources",
        )
    ]
