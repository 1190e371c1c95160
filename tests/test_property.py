"""Property-based cross-check: the engine's fused row-gate flags must
agree with an independent pandas recomputation on arbitrary inputs —
not just on the planted fixtures (hypothesis drives the corners:
NULLs everywhere, empty strings, unicode ids, huge/negative n_tok)."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tokenqc.checks import base as cb
from tokenqc.checks import completeness, format as format_check, structural

CFG = cb.CheckConfig(n_partitions=4)

doc_ids = st.one_of(
    st.none(),
    st.from_regex(r"doc-[0-9]{8}", fullmatch=True),
    st.text(min_size=0, max_size=12),
)
tokens = st.one_of(
    st.none(), st.lists(st.integers(min_value=0, max_value=50256), max_size=8)
)
n_toks = st.one_of(st.none(), st.integers(min_value=-3, max_value=12))
sources = st.one_of(st.none(), st.sampled_from(["web", "books", "zzz", ""]))
rows = st.lists(st.tuples(doc_ids, tokens, n_toks, sources), min_size=1, max_size=12)


def _expected_flags(pdf: pd.DataFrame) -> pd.DataFrame:
    """Independent (pandas) re-statement of the gate semantics."""
    out = pd.DataFrame(index=pdf.index)
    out["null_doc_id"] = pdf.doc_id.isna()
    out["null_tokens"] = pdf.tokens.isna()
    out["empty_tokens"] = pdf.tokens.map(lambda t: t is not None and len(t) == 0, na_action=None) & ~pdf.tokens.isna()
    out["null_n_tok"] = pdf.n_tok.isna()
    out["null_source"] = pdf.source.isna()
    out["ntok_mismatch"] = pdf.apply(
        lambda r: r.tokens is not None
        and not (isinstance(r.tokens, float))
        and pd.notna(r.n_tok)
        and int(r.n_tok) != len(r.tokens),
        axis=1,
    )
    out["negative_n_tok"] = pdf.n_tok.map(lambda v: pd.notna(v) and v < 0)
    out["bad_doc_id"] = pdf.doc_id.map(
        lambda d: d is not None and not isinstance(d, float) and not re.fullmatch(r"doc-\d{8}", d)
    ).fillna(False)
    return out.fillna(False)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows)
def test_row_gate_flags_match_pandas(spark, data):
    df = spark.createDataFrame(
        data, "doc_id string, tokens array<int>, n_tok int, source string"
    ).withColumn("partition_id", cb.partition_id_col(CFG))
    facets = completeness.facets(CFG) + structural.facets(CFG) + format_check.facets(CFG)
    proj = cb.project_facets(df, facets)
    got = proj.toPandas()
    pdf = pd.DataFrame(data, columns=["doc_id", "tokens", "n_tok", "source"])
    want = _expected_flags(pdf)
    for i, f in enumerate(facets):
        g = got[f"__c{i}"].fillna(False).tolist()
        w = want[f.facet].tolist()
        assert g == w, f"facet {f.facet}: spark={g} pandas={w} data={data}"
