#!/usr/bin/env python
"""Round-8 optimization helper bench (bench.py is FROZEN for measurement).

Times a selected subset of registry queries with the noop sink — same
methodology as bench.py's query loop (warmup query + python-worker
prefork, per-query wall, caches shared across the loop, release at the
end) — and optionally dumps .explain("formatted") per query.

Usage:
  python bench_extra.py q1,q2,...            # time queries at $SPARK_GRAFT_SF_DIR
  python bench_extra.py q1 --explain out/    # also write plans to out/<q>.txt
  python bench_extra.py all                  # whole registry
  --repeat N   (default 1) min-of-N per query
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain_dir = None
    if "--explain" in sys.argv:
        explain_dir = sys.argv[sys.argv.index("--explain") + 1]
        os.makedirs(explain_dir, exist_ok=True)
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    suffix = ""
    if "--suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--suffix") + 1]

    from ms_ocr_spark import queries as Q
    from ms_ocr_spark.plans.cache import release_all
    from ms_ocr_spark.session import get_spark

    qs = Q.queries()
    names = list(qs) if args[0] == "all" else args[0].split(",")
    spark = get_spark(app="bench_extra", cores=CPUS)
    # warmup: JVM/codegen/parquet footers + python worker prefork
    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(CPUS * 2, numPartitions=CPUS).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in names:
        samples = []
        for r in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{r}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(min(samples), 3)
        if explain_dir:
            plan = qs[name](spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                qs[name](spark, SF_DIR)._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(explain_dir, f"{name}{suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        print(f"{name}: {timings[name]}", file=sys.stderr)
    release_all()
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "queries": timings}))


if __name__ == "__main__":
    main()
