#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1.1/§1.4) — NOT part
of the driver contract (bench.py is frozen for measurement; this file
exists so optimization evidence can be captured without touching it).

Modes:
  python bench_extra.py q1,q2,...            time the named registry
      queries exactly the way bench.py does (.count(), min-of-R)
  python bench_extra.py q1,... --noop        noop-sink isolation: every
      column of every row computed, result discarded (guide §1.4)
  python bench_extra.py q1,... --explain DIR dump .explain("formatted")
      per query into DIR/<name>.txt (no timing)
  python bench_extra.py --all                the full bench.py HEADLINE

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPEATS as in
bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    explain_dir = None
    if "--explain" in sys.argv:
        explain_dir = Path(sys.argv[sys.argv.index("--explain") + 1])
        explain_dir.mkdir(parents=True, exist_ok=True)
        args = [a for a in args if str(explain_dir) != a]

    from bench import HEADLINE

    from deepref_spark.queries import REGISTRY
    from deepref_spark.session import get_spark

    names = HEADLINE if "--all" in flags else args[0].split(",")
    for n in names:
        if n not in REGISTRY:
            raise SystemExit(f"unknown query: {n}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))

    spark = get_spark("bench_extra", cores=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd  # noqa: F401

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1).count()
    spark.range(64).mapInPandas(lambda it: it, schema="id long").count()

    if explain_dir is not None:
        for name in names:
            df = REGISTRY[name]["spark"](spark, sf_dir)
            (explain_dir / f"{name}.txt").write_text(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {explain_dir}/{name}.txt")
        spark.stop()
        return

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            fn = REGISTRY[name]["spark"]
            t0 = time.time()
            if "--noop" in flags:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).count()
            runs[name].append(round(time.time() - t0, 3))
    spark.stop()
    timings = {n: min(ts) for n, ts in runs.items()}
    print(json.dumps({
        "metric": "bench_extra",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "mode": "noop" if "--noop" in flags else "count",
        "queries": timings,
        "samples": runs,
        "repeats": repeats,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
