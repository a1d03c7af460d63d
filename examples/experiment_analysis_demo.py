"""End-to-end tour of the experiment-analysis / statistics operators.

Run: ``python examples/experiment_analysis_demo.py`` (local Spark, reads
the sf0.001 test tables). Walks the readout stack an A/B owner or a
data-quality monitor runs over a 100 TB event stream:

  distribution health (profile, Benford, Gini, entropy, Hill tail)
  -> experiment readouts (Welch t, CUPED adjustment, KS shape test,
     Wilson intervals)
  -> relationship diagnostics (AUC, Spearman, OLS vs Theil-Sen,
     chi-squared independence)
  -> time structure (ACF, weekday indices, seasonal-naive error,
     CUSUM changepoints)

Every statistic is computed by an aggregation-shaped plan (moment sums,
distinct-value windows — never per-row ranks or driver loops) and is
cross-engine deterministic: the exact values printed here are pinned by
DuckDB value-hash oracles in the query registry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from momyre_spark.operators.profile import (  # noqa: E402
    benford_report,
    cuped_report,
    entropy_report,
    gini_concentration,
    group_auc,
    group_ols_trend,
    hill_tail_index,
    ks_2sample,
    spearman_corr,
    welch_ab_report,
    wilson_bounds,
)
from momyre_spark.operators.timeseries import (  # noqa: E402
    acf_report,
    seasonal_naive_error,
    theil_sen_trend,
    weekday_seasonal_index,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from momyre_spark.sources.parquet import load_table

    events = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents")

    day = F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    centi = (
        F.floor(F.col("value").cast("double") * 100.0 + F.lit(0.5))
        .cast("bigint")
        .alias("v")
    )
    ev = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select("event_type", "user_id", "value", day, centi)

    print("=== 1. distribution health ===")
    print("-- Benford first-digit conformance (fabricated-feed detector)")
    benford_report(ev, "event_type", "value").orderBy("event_type").show()
    print("-- size concentration per source (Gini)")
    gini_concentration(docs, ["source"], "n_chars").orderBy(
        F.desc("gini")
    ).show(5)
    print("-- language diversity per source (entropy)")
    entropy_report(docs, "source", "lang").orderBy(
        F.desc("entropy")
    ).show(5)
    print("-- tail heaviness of document sizes (Hill)")
    hill_tail_index(docs, ["source"], "n_chars", k=10).orderBy(
        "source"
    ).show(5)

    print("=== 2. experiment readouts (arms = user-id parity) ===")
    arm = ev.withColumn("arm", F.pmod(F.col("user_id"), F.lit(2)))
    print("-- Welch unequal-variance t per event type")
    welch_ab_report(arm, ["event_type"], "arm", "value", 0, 1).orderBy(
        "event_type"
    ).show()
    print("-- CUPED: same comparison, pre-period covariate removes noise")
    pre = arm.withColumn(
        "post", F.pmod(F.col("day"), F.lit(2)) == F.lit(1)
    )
    cuped_report(
        pre, ["event_type"], "user_id", "arm", "post", "value", 0, 1
    ).orderBy("event_type").show()
    print("-- KS: did the SHAPE move, not just the mean?")
    ks_2sample(arm, ["event_type"], "arm", "value", 0, 1).orderBy(
        "event_type"
    ).show()
    print("-- Wilson bounds on a conversion-style rate")
    wilson_bounds(
        ev.select("event_type", (F.col("value") > 250.0).alias("ok")),
        ["event_type"],
        "ok",
    ).orderBy("event_type").show()

    print("=== 3. relationship diagnostics ===")
    print("-- does document length separate English from the rest? (AUC)")
    group_auc(
        docs.select(
            "source", (F.col("lang") == "en").alias("is_en"), "n_chars"
        ),
        ["source"],
        "is_en",
        "n_chars",
    ).orderBy(F.desc("auc")).show(5)
    print("-- monotonic trend of value over time (Spearman, robust)")
    spearman_corr(ev, ["event_type"], "day", "v").orderBy(
        "event_type"
    ).show()
    print("-- linear trend (OLS) vs robust trend (Theil-Sen)")
    group_ols_trend(ev, ["event_type"], "day", "value", y_scale=100).orderBy(
        "event_type"
    ).show()
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.sum("v").alias("su"), F.count(F.lit(1)).alias("cnt"))
        .select(
            "event_type",
            "day",
            F.floor(
                F.col("su").cast("double") / F.col("cnt").cast("double")
                + F.lit(0.5)
            ).cast("bigint").alias("x"),
        )
    )
    theil_sen_trend(daily, ["event_type"], "day", "x").orderBy(
        "event_type"
    ).show()

    print("=== 4. time structure (daily mean series) ===")
    print("-- autocorrelation at lags 1-3")
    acf_report(daily, ["event_type"], "day", "x", lags=(1, 2, 3)).orderBy(
        "event_type", "lag"
    ).show(9)
    print("-- weekday seasonal indices")
    weekday_seasonal_index(ev, ["event_type"], "day", "v").orderBy(
        "event_type", "weekday"
    ).show(7)
    print("-- seasonal-naive error floor (low = strongly weekly)")
    seasonal_naive_error(
        daily, ["event_type"], "day", "x", season=7
    ).orderBy("event_type").show()

    print("=== 5. round-7 additions ===")
    print("-- robust location: 5%-trimmed mean vs the raw mean")
    from momyre_spark.operators.profile import (
        bootstrap_ci,
        kaplan_meier,
        trimmed_mean,
    )

    trimmed_mean(events, ["event_type"], "value").orderBy(
        "event_type"
    ).show()
    print("-- Poisson-bootstrap 95% CI for the mean (200 replicates, "
          "hash-derived weights: deterministic on any cluster layout)")
    bootstrap_ci(
        events, ["event_type"], "event_id", "value", n_boot=200
    ).orderBy("event_type").show()
    print("-- Kaplan-Meier: hours to first purchase, censored at last "
          "event (head of the curve)")
    u = events.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase",
                     F.col("ts"))).alias("tp"),
        F.max("ts").alias("tmax"),
    )
    d = u.select(
        F.floor((F.unix_timestamp(F.coalesce("tp", "tmax"))
                 - F.unix_timestamp("t0")) / F.lit(3600)).alias("dur_h"),
        F.when(F.col("tp").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .alias("observed"),
    )
    kaplan_meier(d, [], "dur_h", "observed").orderBy("t").show(8)

    spark.stop()


if __name__ == "__main__":
    main()
