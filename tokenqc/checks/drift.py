"""Distribution-drift gate: per-source n_tok histogram vs baseline.

Engine analogue of the reference's expected-status comparison + threshold
verdicts (/root/reference/README.md expected-status table,
bin/analyze_joss.py:302-345): observed behavior is compared to a stored
expectation, and a graded verdict is emitted.

Scale plan (the pandas-UDF discipline from BASELINE.json `input_hint`):
the statistics run on **pre-aggregated histograms, never raw rows**. One
distributed `groupBy(source, bucket).count()` reduces 10^12 rows to
(sources × 64 buckets) rows; `applyInPandas` then computes KS and
chi-square per source on those tiny groups. Python touches kilobytes.

Statistics (numpy-only; scipy is not in the image):
- Pearson chi-square of observed bucket counts vs expected = n·p, with
  p-value via the regularized upper incomplete gamma Q(k/2, x/2)
  (standard series/continued-fraction evaluation).
- One-sample KS on the binned CDF, D = max|F_obs - F_base|, with the
  asymptotic Kolmogorov p-value Q(λ) = 2 Σ (-1)^{j-1} e^{-2 j² λ²} and
  the usual finite-n correction. KS-on-binned-data is an approximation
  (SURVEY.md section 7.3) — bucket width is pinned in CheckConfig and
  tested against raw-data KS at small scale.

Verdict: FAIL if either p < alpha (given ≥ min_drift_rows rows);
UNKNOWN when the source has no baseline — mirroring the reference's
missing-input default (bin/analyze_joss.py:96-105).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig

CHECK = "drift"

_RESULT_SCHEMA = (
    "source string, n_rows long, chi2 double, chi2_p double, "
    "ks_d double, ks_p double, out_frac double, has_baseline boolean"
)


# ---------------------------------------------------------------------------
# p-value math (pure numpy/math, standard textbook evaluations)
# ---------------------------------------------------------------------------
def _gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x), a>0, x>=0."""
    if x <= 0.0:
        return 1.0
    if x < a + 1.0:
        # lower series: P(a,x), return 1-P
        term = 1.0 / a
        total = term
        for n in range(1, 500):
            term *= x / (a + n)
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        p = total * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return max(0.0, min(1.0, 1.0 - p))
    # continued fraction for Q(a,x) (modified Lentz)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for n in range(1, 500):
        an = -n * (n - a)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return max(0.0, min(1.0, h * math.exp(-x + a * math.log(x) - math.lgamma(a))))


def chi2_sf(stat: float, dof: int) -> float:
    """P[X >= stat] for chi-square with `dof` degrees of freedom."""
    if dof <= 0:
        return 1.0
    return _gammainc_upper_reg(dof / 2.0, stat / 2.0)


def ks_pvalue(d: float, n: float) -> float:
    """Asymptotic one-sample Kolmogorov p-value with finite-n correction."""
    if n <= 0 or d <= 0:
        return 1.0
    lam = (math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * d
    if lam < 0.3:
        # alternating series is numerically useless here; Q(0.3) > 1-1e-7
        return 1.0
    s = 0.0
    for j in range(1, 101):
        term = 2.0 * (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        s += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, s))


def drift_stats_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-source group: observed bucket counts + baseline p → statistics.

    Input columns: source, bucket, cnt (observed; 0/NaN ok), p (baseline
    probability; NaN if the source has no baseline row for that bucket).
    """
    pdf = pdf.sort_values("bucket")  # group rows arrive unordered; CDF needs order
    src = pdf["source"].iloc[0]
    has_base = bool(pdf["p"].notna().any())
    obs = pdf["cnt"].fillna(0.0).to_numpy(dtype=np.float64)
    n = float(obs.sum())
    if not has_base or n == 0:
        return pd.DataFrame(
            [{"source": src, "n_rows": int(n), "chi2": float("nan"), "chi2_p": float("nan"),
              "ks_d": float("nan"), "ks_p": float("nan"), "out_frac": float("nan"),
              "has_baseline": has_base}]
        )
    p = pdf["p"].fillna(0.0).to_numpy(dtype=np.float64)
    p = p / p.sum() if p.sum() > 0 else p
    # chi-square over the baseline's support, renormalized; mass observed
    # outside the support is reported separately as out_frac (a baseline
    # built from a finite snapshot has hard zeros in its tails — a row
    # there is evidence, but graded by *rate*, not an infinite statistic)
    support = p > 0
    n_in = float(obs[support].sum())
    out_frac = float(obs[~support].sum()) / n if n > 0 else 0.0
    if n_in > 0:
        p_in = p[support] / p[support].sum()
        exp = n_in * p_in
        chi2 = float(((obs[support] - exp) ** 2 / exp).sum())
        dof = int(support.sum()) - 1
        chi2_p = chi2_sf(chi2, dof)
        cdf_obs = np.cumsum(obs[support]) / n_in
        cdf_base = np.cumsum(p_in)
        ks_d = float(np.abs(cdf_obs - cdf_base).max())
        ks_p = ks_pvalue(ks_d, n_in)
    else:
        chi2 = chi2_p = ks_d = ks_p = float("nan")
    return pd.DataFrame(
        [{"source": src, "n_rows": int(n), "chi2": chi2, "chi2_p": chi2_p,
          "ks_d": ks_d, "ks_p": ks_p, "out_frac": out_frac, "has_baseline": True}]
    )


# ---------------------------------------------------------------------------
# DataFrame-level operator
# ---------------------------------------------------------------------------
def observed_histogram(df: DataFrame, cfg: CheckConfig) -> DataFrame:
    """groupBy(source, floor(n_tok/w)) — 10^12 rows → ~sources×64 rows.

    Only (source, n_tok) are read: column pruning keeps the tokens
    array out of this scan entirely (verify via .explain / ReadSchema).
    """
    return (
        df.where(F.col("source").isNotNull() & (F.col("n_tok") > 0))
        .groupBy(
            "source",
            F.floor(F.col("n_tok") / cfg.bucket_width).cast("int").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def verdicts(df: DataFrame, baseline_hist: DataFrame, cfg: CheckConfig) -> DataFrame:
    """Per-source drift verdict rows.

    Output: (source, status, n_rows, chi2, chi2_p, ks_d, ks_p).
    """
    hist = observed_histogram(df, cfg)
    joined = hist.join(baseline_hist, on=["source", "bucket"], how="full_outer")
    stats = joined.groupBy("source").applyInPandas(drift_stats_pdf, schema=_RESULT_SCHEMA)
    alpha = float(cfg.drift_alpha)
    status = (
        F.when(~F.col("has_baseline"), F.lit("UNKNOWN"))
        .when(F.col("n_rows") < cfg.min_drift_rows, F.lit("UNKNOWN"))
        .when(
            (F.col("chi2_p") < alpha)
            | (F.col("ks_p") < alpha)
            | (F.col("out_frac") > cfg.drift_out_frac_max),
            F.lit("FAIL"),
        )
        .otherwise(F.lit("PASS"))
    )
    return stats.select(
        "source",
        status.alias("status"),
        "n_rows",
        "chi2",
        "chi2_p",
        "ks_d",
        "ks_p",
        "out_frac",
    )


def js_divergence(
    df: DataFrame,
    baseline_hist: DataFrame,
    cfg: CheckConfig,
    js_max: float = 0.1,
) -> DataFrame:
    """Jensen–Shannon divergence per source between the observed n_tok
    histogram and the baseline — the information-theoretic twin of the
    chi2/KS gate (log base 2, so JS ∈ [0, 1]; symmetric; defined even
    where one side has zero mass, which is exactly where KL explodes).

    Same scale discipline as `verdicts`: the statistic is computed over
    the AGGREGATED histograms (sources × buckets rows after the
    distributed groupBy) — but unlike chi2/KS it needs no special
    functions, so it stays entirely JVM-side in one aggregate expression
    (no Python at all). Output: (source, n_rows, js_divergence, status)
    with FAIL when js > js_max, UNKNOWN when the source has no baseline.
    """
    return js_from_histograms(observed_histogram(df, cfg), baseline_hist, js_max)


def js_from_histograms(
    hist: DataFrame, baseline_hist: DataFrame, js_max: float = 0.1
) -> DataFrame:
    """JS gate over an ALREADY-AGGREGATED (source, bucket, cnt) frame —
    the shared core of the batch gate (js_divergence) and the streaming
    gate (streaming.streaming_drift folds its stateful running
    histograms into this exact formula, so batch and stream verdicts
    are definitionally identical)."""
    tot = hist.groupBy("source").agg(F.sum("cnt").alias("n"))
    obs = hist.join(tot, "source").select(
        "source", "bucket", "n", (F.col("cnt") / F.col("n")).alias("q")
    )
    bsum = baseline_hist.groupBy("source").agg(F.sum("p").alias("psum"))
    base = baseline_hist.join(bsum, "source").select(
        "source", "bucket", (F.col("p") / F.col("psum")).alias("p")
    )
    j = obs.join(base, ["source", "bucket"], "full_outer")
    p = F.coalesce(F.col("p"), F.lit(0.0))
    q = F.coalesce(F.col("q"), F.lit(0.0))
    # 0·log(0/x) := 0 — guard each term, not the sum
    term_q = F.when(q > 0, q * F.log2(F.lit(2.0) * q / (p + q))).otherwise(F.lit(0.0))
    term_p = F.when(p > 0, p * F.log2(F.lit(2.0) * p / (p + q))).otherwise(F.lit(0.0))
    agg = j.groupBy("source").agg(
        F.max("n").alias("n_rows"),
        (F.lit(0.5) * F.sum(term_q) + F.lit(0.5) * F.sum(term_p)).alias("js_raw"),
        F.max(F.col("p").isNotNull().cast("int")).alias("has_base"),
    )
    return agg.select(
        "source",
        F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        F.round("js_raw", 6).alias("js_divergence"),
        F.when(F.col("has_base") == 0, F.lit("UNKNOWN"))
        .when(F.round("js_raw", 6) > js_max, F.lit("FAIL"))
        .otherwise(F.lit("PASS"))
        .alias("status"),
    )


def psi_stats(
    df: DataFrame,
    baseline_hist: DataFrame,
    cfg: CheckConfig,
    psi_warn: float = 0.1,
    psi_fail: float = 0.25,
) -> DataFrame:
    """Population Stability Index drift gate per source between the
    observed n_tok histogram and the baseline — the industry-standard
    model-monitoring drift statistic (sums (actual% - expected%) *
    ln(actual%/expected%)); the third member of the chi2-KS / JS
    family, graded PASS / WARN / FAIL instead of binary."""
    return psi_from_histograms(
        observed_histogram(df, cfg), baseline_hist, psi_warn, psi_fail
    )


def psi_from_histograms(
    hist: DataFrame,
    baseline_hist: DataFrame,
    psi_warn: float = 0.1,
    psi_fail: float = 0.25,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI over ALREADY-AGGREGATED (source, bucket, cnt) observations
    vs a (source, bucket, p) baseline — same shared-core shape as
    `js_from_histograms` (sources x buckets rows, one full-outer join,
    entirely JVM-side). Zero-mass buckets on either side are clamped to
    `eps` (the standard convention: a vanished or new bucket
    contributes a large-but-FINITE term where raw KL would explode).

    Output: (source, n_rows, psi, status) — status PASS below
    `psi_warn`, WARN in [psi_warn, psi_fail), FAIL at >= psi_fail
    (graded on the 6-decimal-rounded value, so the verdict is exactly
    reproducible), UNKNOWN for sources with no baseline."""
    tot = hist.groupBy("source").agg(F.sum("cnt").alias("n"))
    obs = hist.join(tot, "source").select(
        "source", "bucket", "n", (F.col("cnt") / F.col("n")).alias("q")
    )
    bsum = baseline_hist.groupBy("source").agg(F.sum("p").alias("psum"))
    base = baseline_hist.join(bsum, "source").select(
        "source", "bucket", (F.col("p") / F.col("psum")).alias("p")
    )
    j = obs.join(base, ["source", "bucket"], "full_outer")
    p = F.greatest(F.coalesce(F.col("p"), F.lit(0.0)), F.lit(eps))
    q = F.greatest(F.coalesce(F.col("q"), F.lit(0.0)), F.lit(eps))
    term = (q - p) * F.log(q / p)
    agg = j.groupBy("source").agg(
        F.max("n").alias("n_rows"),
        F.sum(term).alias("psi_raw"),
        F.max(F.col("p").isNotNull().cast("int")).alias("has_base"),
    )
    psi6 = F.round("psi_raw", 6)
    return agg.select(
        "source",
        F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        psi6.alias("psi"),
        F.when(F.col("has_base") == 0, F.lit("UNKNOWN"))
        .when(psi6 >= psi_fail, F.lit("FAIL"))
        .when(psi6 >= psi_warn, F.lit("WARN"))
        .otherwise(F.lit("PASS"))
        .alias("status"),
    )


def embedding_drift(
    cur: DataFrame,
    base: DataFrame,
    vec_col: str = "embedding",
    z_max: float = 3.0,
    eps: float = 1e-12,
) -> DataFrame:
    """Embedding-snapshot drift: per-DIMENSION mean shift of the vector
    store between two table versions, graded against the baseline's own
    spread — the vector-payload member of the snapshot family
    (`snapshot.table_diff` grades row inventory, `psi/js/chi2` grade
    scalar histograms; an embedding model swap or a re-normalization
    bug moves MEANS while leaving row counts and n_tok distributions
    untouched).

        z_d = |mean_cur(d) - mean_base(d)| / sqrt(var_base(d) + eps)

    Variance via the explicit avg(v^2) - avg(v)^2 form (no stddev
    builtin — sample-vs-population conventions differ across engines);
    z rounds to 6 decimals and the verdict grades on the rounded value,
    so Spark and any SQL replay agree exactly.

    Scale shape: each side is ONE posexplode pass partial-aggregated to
    dim-bounded (dim, n, sum, sumsq) rows — the exchange carries at
    most tasks x ndim rows; the join and grading run on the ndim-row
    tables. Null/NaN/empty vectors are excluded (embed_profile owns
    those). Dimensions present on only one side grade NEW_DIM /
    DROPPED_DIM (a width change is a schema event, surfaced here too).

    Output: (dim, n_cur, n_base, mean_cur, mean_base, z, status).
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        vec = F.col(vec_col)
        no_nan = ~F.exists(vec, lambda x: F.isnan(x))
        return (
            df.where(vec.isNotNull() & (F.size(vec) > 0) & no_nan)
            .select(F.posexplode(vec).alias("dim", "v"))
            .groupBy("dim")
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum(F.col("v").cast("double")).alias(f"s_{tag}"),
                F.sum(
                    F.col("v").cast("double") * F.col("v").cast("double")
                ).alias(f"q_{tag}"),
            )
        )

    j = side(cur, "cur").join(side(base, "base"), "dim", "full_outer")
    mean_c = F.col("s_cur") / F.col("n_cur")
    mean_b = F.col("s_base") / F.col("n_base")
    # clamp: avg(v^2) - mean^2 can come out slightly NEGATIVE from float
    # cancellation on large-magnitude dimensions; sqrt(negative + eps)
    # is NaN and NaN > z_max is false, silently grading a shifted
    # dimension OK (r5 ADVICE). greatest(_, 0) keeps the genuinely-
    # constant-dimension case loud (z explodes on any mean shift).
    var_b = F.greatest(
        F.col("q_base") / F.col("n_base") - mean_b * mean_b, F.lit(0.0)
    )
    z = F.round(F.abs(mean_c - mean_b) / F.sqrt(var_b + F.lit(eps)), 6)
    status = (
        F.when(F.col("n_base").isNull(), F.lit("NEW_DIM"))
        .when(F.col("n_cur").isNull(), F.lit("DROPPED_DIM"))
        .when(z > z_max, F.lit("SHIFTED"))
        .otherwise(F.lit("OK"))
    )
    return j.select(
        "dim",
        "n_cur",
        "n_base",
        F.round(mean_c, 6).alias("mean_cur"),
        F.round(mean_b, 6).alias("mean_base"),
        z.alias("z"),
        status.alias("status"),
    )


def token_histogram(
    df: DataFrame,
    n_buckets: int = 256,
    tokens_col: str = "tokens",
    source_col: str = "source",
) -> DataFrame:
    """Per-source histogram over token-id residue buckets — the raw
    material of the TOKEN-unigram drift gate (drift over what the
    sequences contain, where `observed_histogram` drifts over how long
    they are).

    Bucket = ``pmod(token, n_buckets)``: a systematic hash, so any shift
    in the unigram distribution (tokenizer change, template corruption,
    degenerate repetition flooding one id) moves bucket mass. Scale
    shape: the explode is narrow (source + one int — the token arrays
    never shuffle), and the groupBy partial-aggregates map-side, so at
    10^12 rows × ~1k tokens the shuffle moves at most
    tasks × sources × n_buckets count rows, same argument as
    textqc.unigram_logprob's vocab-bounded model. Output:
    (source, bucket, cnt) — directly consumable by js_from_histograms.
    """
    return (
        df.where(
            F.col(source_col).isNotNull()
            & F.col(tokens_col).isNotNull()
            & (F.size(tokens_col) > 0)
        )
        .select(F.col(source_col).alias("source"), F.explode(tokens_col).alias("__tok"))
        .groupBy("source", F.pmod("__tok", F.lit(n_buckets)).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def token_js_divergence(
    df: DataFrame,
    baseline_hist: DataFrame,
    js_max: float = 0.1,
    n_buckets: int = 256,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Token-unigram drift verdicts: JS divergence per source between the
    observed token-residue histogram and a baseline snapshot of bucket
    probabilities (source, bucket, p). Reuses js_from_histograms — the
    exact math (and UNKNOWN-without-baseline semantics) of the n_tok JS
    gate, applied to the content distribution. Note n_rows in the output
    counts TOKENS per source, not sequences (the histogram's unit)."""
    return js_from_histograms(
        token_histogram(df, n_buckets=n_buckets, tokens_col=tokens_col),
        baseline_hist,
        js_max,
    )
