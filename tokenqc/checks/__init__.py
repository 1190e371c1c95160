"""QC check operators.

Each gate mirrors one capability row of SURVEY.md section 2.10 (the
reference's check map). Row-level gates (completeness, structural,
format, referential) expose ``facets(df)`` — named boolean Columns —
so the runner fuses them into a single scan; key/join/group-level gates
(uniqueness, invariant, drift) expose ``violations``/``verdicts``
builders of their own.
"""

from tokenqc.checks.base import CheckConfig, Facet  # noqa: F401
