"""End-to-end tour of the versioned snapshot store.

Run: ``python examples/versioned_lake_demo.py`` (local Spark, writes under
a temp dir). Walks the full table lifecycle a CDC feed produces:

  snapshot -> CDC merges (COW versions) -> time travel -> CDF diff
  -> small-file compaction -> stats-skipped reads -> vacuum

Every step prints what a 100 TB operator would care about: which
partitions were rewritten vs re-referenced, how many files exist, what a
read actually scans.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from momyre_spark.session import get_spark  # noqa: E402
from momyre_spark.sinks.snapshots import (  # noqa: E402
    current_version,
    read_manifest,
    snapshot_compact,
    snapshot_diff,
    snapshot_merge_cdc,
    snapshot_read,
    snapshot_vacuum,
    snapshot_write,
)


def n_files(man) -> int:
    return sum(
        len(glob.glob(os.path.join(d, "*.parquet")))
        for d in man["partitions"].values()
    )


def main() -> None:
    spark = get_spark(app_name="versioned-lake-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.mkdtemp(prefix="lake-demo-"), "users")
    fields = {"balance": "bigint", "region": "string"}

    # 1. initial snapshot: partitioned, stats-tracked, clustered on balance
    base = spark.createDataFrame(
        [(f"u{i}", i * 10, "eu" if i % 2 else "us") for i in range(1000)],
        "_id string, balance bigint, region string",
    )
    snapshot_write(spark, base, root, partition_by=["region"],
                   stats_cols=["balance"], sort_by=["balance"],
                   max_records_per_file=100)
    print(f"v1 committed; files={n_files(read_manifest(spark, root, 1))}")

    # 2. five CDC micro-batches: each touches ONLY eu (us is re-referenced)
    for b in range(5):
        acts = spark.createDataFrame(
            [(f"u{2*i+1}", "upsert", 999_000 + b, "eu", None) for i in range(20)],
            "_id string, __action string, balance bigint, region string, "
            "__present array<string>",
        )
        snapshot_merge_cdc(spark, root, acts, fields,
                           partition_by=["region"], batch_id=b,
                           max_records_per_file=100)
    v = current_version(spark, root)
    man = read_manifest(spark, root, v)
    man1 = read_manifest(spark, root, 1)
    shared = sum(
        1 for k, d in man["partitions"].items() if man1["partitions"].get(k) == d
    )
    print(f"after 5 merges: v{v}; re-referenced partitions={shared}; "
          f"files={n_files(man)}")

    # 3. time travel + CDF diff
    before = snapshot_read(spark, root, version=1).filter("_id = 'u1'").collect()
    after = snapshot_read(spark, root).filter("_id = 'u1'").collect()
    print(f"u1 balance: v1={before[0]['balance']} -> v{v}={after[0]['balance']}")
    changes = snapshot_diff(spark, root, 1, v)
    n_upd = changes.filter("__change = 'update'").count()
    print(f"diff v1..v{v}: {changes.count()} changed rows ({n_upd} updates)")

    # 4. compaction: fragmented eu rewritten, us untouched, history intact
    cv = snapshot_compact(spark, root, target_file_bytes=512 * 1024 * 1024)
    print(f"compacted -> v{cv}; files={n_files(read_manifest(spark, root, cv))}; "
          f"diff vs parent={snapshot_diff(spark, root, v, cv).count()} rows")

    # 5. stats skipping: the hot-balance read touches only eu's files
    hot = snapshot_read(spark, root, stats_filter={"balance": (900_000, None)})
    dirs = {
        f.split("region=")[1].split("/")[0]
        for f in hot.inputFiles()
        if "region=" in f
    }
    print(f"stats-filtered read scans partitions: {sorted(dirs)}")

    # 6. vacuum: retention window + crashed-commit sweep
    dropped = snapshot_vacuum(spark, root, keep_last=2, sweep_orphans=True)
    print(f"vacuumed versions: {dropped}; "
          f"current still reads {snapshot_read(spark, root).count()} rows")


if __name__ == "__main__":
    main()
