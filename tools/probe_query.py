"""Round-10 optimization probe: time one registered query in isolation and
dump its formatted plan.

Usage:
  python tools/probe_query.py <query> [<query> ...] [--plan-dir plans/r10]
      [--suffix before] [--runs 3] [--no-time]

Times with the bench methodology (noop sink, warmup + min-of-N, cache
cleared between queries) at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; writes <plan-dir>/<query>_<suffix>.txt with the
explain("formatted") output.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plan_dir = None
    suffix = "before"
    runs = 3
    do_time = True
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plan-dir":
            plan_dir = args[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--no-time":
            do_time = True if False else False
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import momyre_spark.plans as plans
    from momyre_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="momyre-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    for name in names:
        fn = plans.QUERIES[name]
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            spark.catalog.clearCache()
        if do_time:
            spark.sparkContext.setJobDescription(f"probe:{name}")

            def run() -> float:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0

            run()  # warmup
            times = [run() for _ in range(runs)]
            print(
                f"{name}: min={min(times):.3f}s "
                f"all=[{', '.join(f'{t:.3f}' for t in times)}]",
                flush=True,
            )
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
