#!/usr/bin/env python3
"""Optimization measurement harness (rounds 11-12).

Times individual registry queries with the noop sink (guide §1.4),
labels jobs (§1.5), and dumps .explain("formatted") per query to
plans/<round>/<name>_<tag>.txt so plan claims in OPTIMIZATION_r*.md
are checkable without running Spark.

Usage:
  python tools/measure.py --names q1,q2 [--tag before] [--runs 2]
                          [--sf-dir DIR] [--no-explain] [--warm]
                          [--eventlog DIR] [--round r12]

Separate from bench.py on purpose: bench.py is the driver contract
and stays untouched by measurement tooling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_only_importer_prototype_spark import queries as q  # noqa: E402
from clickhouse_only_importer_prototype_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--tag", default=None, help="suffix for plan files; omit to skip writing")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("--warm", action="store_true", help="run bench-style subsystem warm-up first")
    ap.add_argument("--eventlog", default=None, help="dir for spark event logs (per-job profiling)")
    ap.add_argument("--round", default="r12", help="plans/<round>/ subdir for explain dumps")
    args = ap.parse_args()

    names = [n.strip() for n in args.names.split(",") if n.strip()]
    registry = q.queries()
    missing = [n for n in names if n not in registry]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    extra = {}
    if args.eventlog:
        os.makedirs(args.eventlog, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": args.eventlog,
        }
    spark = get_spark(app_name="cips-opt-measure", extra_conf=extra)
    if args.warm:
        import bench

        q.q6_forecast_revenue(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        bench._warm_subsystems(spark, args.sf_dir)

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        fn = registry[name]
        best = None
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"opt:{name}:run{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {name} run{i}: {dt:.3f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        if args.tag and not args.no_explain:
            # fresh build so the explain reflects an un-executed plan
            spark.catalog.clearCache()
            df = registry[name](spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(txt)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
