"""Round-10 optimization probe for the bench-internal synthetic rows
(`dedup_cc_distributed_1m2`, `dedup_freqcap_giga_synthetic`,
`dedup_linkage_synthetic_170k`, `dedup_entity_synthetic_170k`,
`dedup_linkage_jumbo_synthetic`) — the exact fixtures and timing
methodology of bench.py, runnable one row at a time.

Usage: python tools/probe_synthetic.py <row> [<row> ...] [--runs 3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from momyre_spark.session import get_spark

    spark = get_spark(app_name="momyre-probe-syn")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if name == "dedup_cc_distributed_1m2":
            from momyre_spark.operators.dedup import duplicate_components
            from momyre_spark.plans.dedup_queries import _syn_edges

            fixture = _syn_edges(spark)

            def one() -> float:
                handles: list = []
                t0 = time.perf_counter()
                duplicate_components(fixture, persisted=handles).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.perf_counter() - t0
                for h in handles:
                    h.unpersist()
                return dt

        elif name == "dedup_cc_hubskew_synthetic":
            from momyre_spark.operators.dedup import duplicate_components
            from momyre_spark.plans.dedup_queries import _syn_edges_hub

            fixture = _syn_edges_hub(spark)

            def one() -> float:
                handles: list = []
                t0 = time.perf_counter()
                duplicate_components(fixture, persisted=handles).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.perf_counter() - t0
                for h in handles:
                    h.unpersist()
                return dt

        elif name == "dedup_freqcap_giga_synthetic":
            from momyre_spark.operators.dedup import frequency_cap
            from momyre_spark.plans.dedup_queries import _syn_freqcap

            fixture = _syn_freqcap(spark)

            def one() -> float:
                handles: list = []
                t0 = time.perf_counter()
                frequency_cap(fixture, k=2, persisted=handles).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.perf_counter() - t0
                for h in handles:
                    h.unpersist()
                return dt

        elif name in (
            "dedup_linkage_synthetic_170k",
            "dedup_entity_synthetic_170k",
        ):
            from momyre_spark.operators.linkage import (
                blocked_edit_pairs,
                entity_groups,
            )
            from momyre_spark.plans.dedup_queries import _syn_names

            fixture = _syn_names(spark)
            fn = (
                blocked_edit_pairs
                if name == "dedup_linkage_synthetic_170k"
                else entity_groups
            )

            def one(fn=fn) -> float:
                t0 = time.perf_counter()
                fn(fixture, text_col="t", id_col="id", max_distance=1).write.format(
                    "noop"
                ).mode("overwrite").save()
                return time.perf_counter() - t0

        elif name == "dedup_linkage_jumbo_synthetic":
            from pyspark.sql import functions as SF2

            from momyre_spark.operators.linkage import blocked_edit_pairs

            _alpha = (
                "abcdefghijklmnopqrstuvwxyz"
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
            )
            _stub = "".join(_alpha[(i * 7 + 3) % 62] for i in range(90))
            _pos = (SF2.col("id") / SF2.lit(62)).cast("bigint")
            _ch = SF2.substring(
                SF2.lit(_alpha),
                (SF2.pmod(SF2.col("id"), SF2.lit(62)) + 1).cast("int"),
                1,
            )
            fixture = spark.range(5_100).select(
                SF2.col("id"),
                SF2.concat(
                    SF2.substring(SF2.lit(_stub), SF2.lit(1), _pos),
                    _ch,
                    SF2.substring(
                        SF2.lit(_stub), (_pos + 1).cast("int"), SF2.lit(len(_stub))
                    ),
                ).alias("name"),
            )

            def one() -> float:
                t0 = time.perf_counter()
                blocked_edit_pairs(fixture, max_distance=1).write.format(
                    "noop"
                ).mode("overwrite").save()
                return time.perf_counter() - t0

        else:
            raise SystemExit(f"unknown probe row: {name}")

        times = [one() for _ in range(runs)]
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
