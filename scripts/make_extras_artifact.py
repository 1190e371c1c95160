"""Regenerate CORRECTNESS_extra_r{N}.json from the CURRENT
``extra_queries()`` × ``extra_oracle_sql()`` surface, so the extras
evidence cannot silently go stale when extras change (r4 verdict #5).

Runs the same oracle contract the driver applies to the 50-row surface
(tests/oracle_util.compare, sf0.01 by default); queries without an
oracle twin (simhash_pairs) are recorded rows-only, exactly as the
driver would.

Usage: python scripts/make_extras_artifact.py --round 5
       [--sf-dir /root/testdata/sf0.01] [--out CORRECTNESS_extra_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        REPO, f"CORRECTNESS_extra_r{args.round:02d}.json"
    )

    import __spark_entry__ as E
    from oracle_util import compare
    from tokenqc.session import get_spark

    spark = get_spark("extras-artifact", master="local[16]", shuffle_partitions=16)
    extras, oracles = E.extra_queries(), E.extra_oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in extras.items():
        try:
            df = fn(spark, args.sf_dir)
            if name in oracles:
                ok, msg = compare(df, args.sf_dir, oracles[name])
                results[name] = {
                    "mode": "oracle",
                    "match": bool(ok),
                    "detail": msg if not ok else "ok",
                }
            else:
                results[name] = {
                    "mode": "rows_only",
                    "rows": df.count(),
                    "match": None,
                }
        except Exception as e:  # record, never abort the artifact
            results[name] = {"mode": "error", "match": False, "detail": repr(e)}
        status = results[name].get("match")
        print(f"{name}: {results[name]['mode']} match={status}", file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    n_bad = sum(1 for r in results.values() if r["match"] is False)
    print(f"wrote {out_path}: {len(results)} extras, {n_bad} failures")
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
