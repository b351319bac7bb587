"""Capture `.explain("formatted")` output for named queries.

Writes plans/r17/<query>_<tag>.txt for each name — the optimization
round's before/after plan evidence (the judge checks plan claims
against these files).

Usage:
  python scripts/explain_capture.py --tag before [--sf DIR] name [name...]

Shared stages are bypassed (AUDIT_BYPASS_SHARED) so the capture shows
the full pipeline shape, not a memoized-checkpoint scan — same
discipline as scripts/plan_audit.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out-dir", default="/root/repo/plans/r17")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from bq_nvd_spark.operators import checkpoint as _cp
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.session import get_spark

    spark = get_spark(app_name="explain-capture")
    os.makedirs(args.out_dir, exist_ok=True)
    _cp.AUDIT_BYPASS_SHARED = True
    rc = 0
    for name in args.names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            rc = 1
            continue
        df = QUERIES[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: wrote {path} ({len(plan)} chars)")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
