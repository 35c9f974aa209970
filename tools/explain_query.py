"""Dump `.explain("formatted")` for named declared queries to files.

Usage: python tools/explain_query.py OUTDIR SUFFIX [sf_dir] name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt per query — the r12 optimization
round's evidence files (plans/r12/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    import __spark_entry__ as entrymod
    from text_sentiment_analysis_in_hadoop_and_spark_spark.session import (
        get_spark,
    )

    spark = get_spark("explain_dump")
    qs = entrymod.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
