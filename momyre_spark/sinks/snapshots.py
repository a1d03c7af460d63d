"""Versioned lake snapshots: manifest-tracked table versions with time
travel and copy-on-write CDC merges (Iceberg-lite, no table-format runtime
required).

The in-place lake sink (sinks/lake.py) overwrites affected partitions;
history is gone the moment the batch lands. This module adds the missing
warehouse property: every commit is a new immutable VERSION described by a
small JSON manifest mapping partition values to data directories. Readers
resolve a manifest (any version — time travel) and scan exactly the listed
directories; writers never mutate files a previous version references, so
concurrent readers of version N are isolated from the commit of N+1.

Layout::

    root/_manifests/v{N}.json   {"version": N, "parent": M,
                                 "partition_by": [...],
                                 "partitions": {"<part-key>": "data dir"}}
    root/_manifests/CURRENT     the committed version number
    root/data/v{N}/<part-key>/  parquet written BY version N (partition
                                columns kept in the files, so a manifest's
                                directory list reads back whole)

Copy-on-write merge: version N+1 re-references the parent's directories for
untouched partitions and writes new directories only for affected ones —
a 100 TB table with a one-partition batch writes one partition and one
manifest. Manifest-driven pruning: a partition filter selects manifest
entries on the driver before any file IO, the lake analog of partition
pruning (no directory listing of the whole table, which at 100 TB is
itself a cost).

Commit protocol: write ``v{N}.json``, then move CURRENT via copy+rename —
atomic on HDFS-like filesystems. Single-writer by assumption (the Spark
driver of the CDC stream); multi-writer needs a catalog/lock service,
exactly as with every manifest-based table format.

Retention: old versions stay readable until ``snapshot_vacuum`` drops
their unreferenced data directories.
"""

from __future__ import annotations

import json
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from momyre_spark.sinks.lake import apply_actions

_M = "_manifests"


# ------------------------------------------------------------------ fs ----
def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _jpath(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    jvm, fs = _fs(spark, path)
    out = fs.create(_jpath(jvm, path), True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str | None:
    jvm, fs = _fs(spark, path)
    p = _jpath(jvm, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        buf = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            buf.append(b)
        return buf.decode("utf-8")
    finally:
        stream.close()


# ------------------------------------------------------------ manifests ---
def _part_key(row, partition_by: list[str]) -> str:
    return "/".join(f"{c}={quote(str(row[c]), safe='')}" for c in partition_by)


def part_key_values(key: str, partition_by: list[str]) -> dict[str, str]:
    vals = {}
    for piece in key.split("/"):
        c, v = piece.split("=", 1)
        vals[c] = unquote(v)
    return {c: vals[c] for c in partition_by}


def current_version(spark: SparkSession, root: str) -> int | None:
    txt = _read_text(spark, f"{root}/{_M}/CURRENT")
    return int(txt.strip()) if txt else None


def read_manifest(spark: SparkSession, root: str, version: int) -> dict:
    txt = _read_text(spark, f"{root}/{_M}/v{version}.json")
    if txt is None:
        raise FileNotFoundError(f"no manifest for version {version} at {root}")
    return json.loads(txt)


def list_versions(spark: SparkSession, root: str) -> list[int]:
    jvm, fs = _fs(spark, root)
    d = _jpath(jvm, f"{root}/{_M}")
    if not fs.exists(d):
        return []
    out = []
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _commit(spark: SparkSession, root: str, manifest: dict) -> int:
    v = manifest["version"]
    _write_text(spark, f"{root}/{_M}/v{v}.json", json.dumps(manifest, sort_keys=True))
    jvm, fs = _fs(spark, root)
    tmp, cur = f"{root}/{_M}/CURRENT.tmp", f"{root}/{_M}/CURRENT"
    _write_text(spark, tmp, str(v))
    fs.delete(_jpath(jvm, cur), False)
    fs.rename(_jpath(jvm, tmp), _jpath(jvm, cur))
    return v


# --------------------------------------------------------------- writes ---
def _write_version_data(
    df: DataFrame,
    root: str,
    version: int,
    partition_by: list[str] | None,
    max_records_per_file: int,
) -> dict[str, str]:
    """Write ``df`` under data/v{version}; return partition-key -> dir.

    Partition columns STAY in the data files (the physical dirs split on
    shadow ``__p_*`` copies), so a manifest's directories read back whole
    with no basePath reconstruction."""
    spark = df.sparkSession
    base = f"{root}/data/v{version}"
    if not partition_by:
        df.write.mode("overwrite").option(
            "maxRecordsPerFile", str(max_records_per_file)
        ).parquet(base)
        return {"": base}
    shadows = {c: f"__p_{c}" for c in partition_by}
    out = df
    for c, s in shadows.items():
        out = out.withColumn(s, F.col(c).cast("string"))
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*shadows.values())
        .parquet(base)
    )
    parts = (
        df.select(*partition_by).distinct().collect()
    )  # one row per partition — bounded by the batch's partition count
    dirs = {}
    for r in parts:
        key = _part_key(r, partition_by)
        shadow_dir = "/".join(
            f"{shadows[c]}={quote(str(r[c]), safe='')}" for c in partition_by
        )
        dirs[key] = f"{base}/{shadow_dir}"
    return dirs


def snapshot_write(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    batch_id: int | None = None,
) -> int:
    """Commit ``df`` as a full new version. Returns the version number."""
    parent = current_version(spark, root)
    v = (parent or 0) + 1
    dirs = _write_version_data(df, root, v, partition_by, max_records_per_file)
    man = {
        "version": v,
        "parent": parent,
        "partition_by": list(partition_by or []),
        "partitions": dirs,
    }
    if batch_id is not None:
        man["batch_id"] = batch_id
    return _commit(spark, root, man)


def snapshot_read(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    partition_filter: dict[str, str] | None = None,
) -> DataFrame:
    """Read a version (default: current). ``partition_filter`` prunes
    manifest entries on the driver — files of other partitions are never
    listed, let alone read."""
    v = version if version is not None else current_version(spark, root)
    if v is None:
        raise FileNotFoundError(f"no committed version at {root}")
    man = read_manifest(spark, root, v)
    pby = man["partition_by"]
    dirs = []
    for key, d in sorted(man["partitions"].items()):
        if partition_filter and key:
            vals = part_key_values(key, pby)
            if any(str(partition_filter[c]) != vals[c] for c in partition_filter):
                continue
        dirs.append(d)
    if not dirs:
        # empty selection: preserve schema by reading nothing from any dir
        any_dir = next(iter(man["partitions"].values()), None)
        if any_dir is None:
            raise FileNotFoundError(f"version {v} has no data")
        return spark.read.parquet(any_dir).limit(0)
    out = spark.read.parquet(*dirs)
    return out.drop(*[c for c in out.columns if c.startswith("__p_")])


def snapshot_merge_cdc(
    spark: SparkSession,
    root: str,
    actions: DataFrame,
    fields: dict[str, str],
    key: str = "_id",
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    batch_id: int | None = None,
) -> int:
    """Copy-on-write MERGE as a new version.

    Untouched partitions are re-referenced from the parent manifest (zero
    IO); affected ones (holding an acted-on key, or receiving rows) are
    rewritten under the new version's data dir; emptied ones are dropped
    from the manifest. Time travel keeps the pre-merge table readable at
    the parent version.

    With ``batch_id`` set (the streaming path passes foreachBatch's epoch),
    the committed manifest records it and a replayed batch whose id is <=
    the current manifest's is skipped — exactly-once version history under
    at-least-once delivery (without it, a replay re-commits an identical
    but version-bumped state)."""
    parent = current_version(spark, root)
    if batch_id is not None and parent is not None:
        seen = read_manifest(spark, root, parent).get("batch_id")
        if seen is not None and seen >= batch_id:
            return parent  # replayed batch — state already committed
    if parent is None:
        first = apply_actions(
            spark.createDataFrame(
                [],
                f"`{key}` string, "
                + ", ".join(f"`{f}` {t}" for f, t in fields.items()),
            ),
            actions,
            fields,
            key,
        )
        return snapshot_write(
            spark, first, root, partition_by, max_records_per_file,
            batch_id=batch_id,
        )
    man = read_manifest(spark, root, parent)
    pby = man["partition_by"]
    if list(partition_by or []) != pby:
        raise ValueError(
            f"partition_by {partition_by} != table's {pby} (set at creation)"
        )
    existing = snapshot_read(spark, root, parent)
    v = parent + 1

    if not pby:
        # no lineage cut needed: the output dir (data/v{N}) never overlaps
        # the input version's files
        merged = apply_actions(existing, actions, fields, key)
        dirs = _write_version_data(merged, root, v, None, max_records_per_file)
        man = {
            "version": v, "parent": parent, "partition_by": [],
            "partitions": dirs,
        }
        if batch_id is not None:
            man["batch_id"] = batch_id
        return _commit(spark, root, man)

    touched = existing.join(actions.select(key), key, "left_semi").select(
        *pby
    ).distinct()
    incoming = (
        actions.filter(F.col("__action") != "delete").select(*pby).distinct()
    )
    affected = touched.unionByName(incoming).distinct()
    affected_keys = {_part_key(r, pby) for r in affected.collect()}

    pruned = existing.join(F.broadcast(affected), pby, "left_semi")
    merged = apply_actions(pruned, actions, fields, key).localCheckpoint(
        eager=True
    )
    new_dirs = _write_version_data(merged, root, v, pby, max_records_per_file)

    partitions = {
        k: d
        for k, d in man["partitions"].items()
        if k not in affected_keys  # untouched: re-reference parent data
    }
    partitions.update(new_dirs)  # affected-and-nonempty: new data
    man = {
        "version": v,
        "parent": parent,
        "partition_by": pby,
        "partitions": partitions,
    }
    if batch_id is not None:
        man["batch_id"] = batch_id
    return _commit(spark, root, man)


def snapshot_vacuum(
    spark: SparkSession, root: str, keep_last: int = 2
) -> list[int]:
    """Drop manifests older than the newest ``keep_last`` versions and
    delete data directories no kept version references. Returns the expired
    version numbers. Time travel works within the retention window; vacuum
    bounds storage growth."""
    versions = list_versions(spark, root)
    if len(versions) <= keep_last:
        return []
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(read_manifest(spark, root, v)["partitions"].values())
    jvm, fs = _fs(spark, root)
    for v in drop:
        for d in read_manifest(spark, root, v)["partitions"].values():
            if d not in referenced:
                fs.delete(_jpath(jvm, d), True)
        fs.delete(_jpath(jvm, f"{root}/{_M}/v{v}.json"), False)
    return drop
