"""Degenerate-content gate: per-document token entropy + duplicated
k-gram fraction as first-class engine checks — the payload-quality twin
of the token-array lints (checks/tokens.py). The reference grades each
tool's *content* fields beyond mere presence
(/root/reference/bin/check_tool.py:24-52); for a pre-tokenized corpus
the content questions are "is this text degenerate?" (entropy collapse:
padding floods, single-token spam) and "does it tile?" (boilerplate
loops, decoding stutter — healthy entropy, duplicated k-grams).

Both statistics are within-row, so they cannot ride the fused JVM row
scan (they need the Arrow stage). Formulations MEASURED at sf0.01 /
30 M tokens / local[32], interleaved min-of-6:

- one fused Arrow pass computing both (shared flatten, two lexsorts in
  one UDF invocation): 5.3 s — the doubled peak working set per Python
  worker (value sort + window-hash sort live simultaneously) costs more
  than the saved Arrow transfer;
- TWO independent zero-shuffle passes (`textqc.token_entropy`,
  `textqc.token_kgram_repetition`, violations unioned): 4.0 s. SHIPPED.

Each pass stays the oracle-verified standalone operator (extras
seq_token_entropy / seq_token_kgram_rep), carrying partition_id through
Arrow for the engine's violation rows. Like the token lints, each facet
is opt-in via config: `min_entropy` / `max_dup_kgram_frac` of None
disables it (and its pass) even when "degenerate" is listed in checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenqc.checks import base as cb

CHECK = "degenerate"

_EMPTY = (
    "partition_id int, doc_id string, check_name string, "
    "observed string, expected string"
)


def _rows(stats: DataFrame, cond, facet: str, observed, expected: str) -> DataFrame:
    flagged = stats.where(F.coalesce(cond, F.lit(False)))
    return flagged.select(
        "partition_id",
        "doc_id",
        F.lit(CHECK).alias("check_name"),
        F.concat(F.lit(f"{facet}: "), observed.cast("string")).alias("observed"),
        F.lit(expected).alias("expected"),
    )


def violations(df: DataFrame, cfg: cb.CheckConfig) -> DataFrame:
    """Violation rows for the enabled degeneracy facets, in the
    engine's standard (partition_id, doc_id, check_name, observed,
    expected) shape. `df` must carry partition_id (the runner attaches
    it). One zero-shuffle Arrow pass per enabled facet (the measured
    optimum — module docstring); a disabled facet costs nothing.
    """
    from tokenqc.textops import textqc

    parts: list[DataFrame] = []
    if cfg.min_entropy is not None:
        ent = textqc.token_entropy(
            df,
            id_col="doc_id",
            min_entropy=float(cfg.min_entropy),
            carry_cols=("partition_id",),
        )
        parts.append(
            _rows(
                ent,
                F.col("low_entropy"),
                "low_entropy",
                F.col("entropy"),
                f"token unigram entropy >= {cfg.min_entropy}",
            )
        )
    if cfg.max_dup_kgram_frac is not None:
        rep = textqc.token_kgram_repetition(
            df,
            id_col="doc_id",
            k=cfg.degen_kgram_k,
            max_dup_frac=float(cfg.max_dup_kgram_frac),
            carry_cols=("partition_id",),
        )
        parts.append(
            _rows(
                rep,
                F.col("repetitive"),
                "repetitive",
                F.col("dup_kgram_frac"),
                f"duplicated {cfg.degen_kgram_k}-gram fraction <= "
                f"{cfg.max_dup_kgram_frac}",
            )
        )
    if not parts:
        return df.sparkSession.createDataFrame([], _EMPTY)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
