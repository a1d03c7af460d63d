"""Delimited/JSON-lines file sources with the engine's schema discipline.

The reference's only source is MongoDB (``/root/reference/app/mongo.go``);
a general analytics engine also ingests flat files. These readers plug the
file formats into the same ``spec.enforce_schema`` contract the snapshot
scan uses, with the engine's fail-stop philosophy extended to malformed
records: by default a corrupt line FAILS the read (like the decode path's
unknown-shape fail-stop) instead of silently dropping or null-filling data.

Scale notes:
- Schemas are always *declared*, never inferred: inference triggers an
  extra full scan of the data before the real one — at 100 TB that is the
  difference between one pass and two. (``infer_schema_sample`` exists for
  interactive exploration and reads a bounded number of files.)
- CSV/JSON readers split by file and by block (for splittable codecs), so
  task counts stay proportional to bytes exactly like the parquet path.
- Column pruning applies (Spark only parses projected JSON fields);
  predicate pushdown does NOT reach row groups the way parquet does — these
  formats are the *ingest* edge; convert to parquet/lake layout
  (sinks/lake.py) before serving queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from momyre_spark.spec import TableSpec, enforce_schema

_CORRUPT = "_corrupt_record"


def _spec_schema(table: TableSpec) -> str:
    """DDL schema string for the reader: declared columns + corrupt capture."""
    cols = ", ".join(
        f"`{name}` {dtype}" for name, dtype in table.sql_columns.items()
    )
    return f"{cols}, `{_CORRUPT}` string"


def _finish(
    df: DataFrame, table: TableSpec, fail_on_corrupt: bool
) -> DataFrame:
    if fail_on_corrupt:
        # Fail-stop mirror of the decode path (mongo.py clusterTime guard):
        # the raise_error lives INSIDE a kept column's expression — a
        # dropped side column would be pruned by Catalyst and never fire.
        first = next(iter(table.sql_columns))
        guard = F.when(
            F.col(_CORRUPT).isNotNull(),
            F.raise_error(
                F.concat(
                    F.lit("momyre: corrupt input record: "), F.col(_CORRUPT)
                )
            ).cast(table.sql_columns[first]),
        ).otherwise(F.col(first))
        df = df.withColumn(first, guard)
    df = df.drop(_CORRUPT)
    return enforce_schema(df, table)


def load_csv(
    spark: SparkSession,
    path: str,
    table: TableSpec,
    header: bool = True,
    delimiter: str = ",",
    fail_on_corrupt: bool = True,
) -> DataFrame:
    """CSV scan against a declared TableSpec (no schema inference pass)."""
    df = (
        spark.read.schema(_spec_schema(table))
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .csv(path)
    )
    return _finish(df, table, fail_on_corrupt)


def load_jsonl(
    spark: SparkSession,
    path: str,
    table: TableSpec,
    fail_on_corrupt: bool = True,
) -> DataFrame:
    """JSON-lines scan against a declared TableSpec.

    Only declared fields are parsed (column pruning applies inside the JSON
    parser); extra fields in the input are ignored exactly like
    ``enforce_schema`` drops undeclared columns from any other source."""
    df = (
        spark.read.schema(_spec_schema(table))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _finish(df, table, fail_on_corrupt)


def infer_schema_sample(
    spark: SparkSession, path: str, fmt: str = "jsonl", sample_files: int = 1
) -> StructType:
    """Interactive helper: infer a schema from a bounded sample.

    Deliberately NOT used by the load paths — declared schemas keep ingest
    one-pass. Reads at most ``sample_files`` files."""
    import glob as _glob
    import os

    paths = sorted(_glob.glob(os.path.join(path, "*"))) or [path]
    sample = paths[:sample_files]
    reader = spark.read.option("inferSchema", "true")
    df = reader.json(sample) if fmt == "jsonl" else reader.option(
        "header", "true"
    ).csv(sample)
    return df.schema


def load_orc(
    spark: SparkSession,
    path: str,
    table: TableSpec,
) -> DataFrame:
    """ORC scan against a declared TableSpec. Columnar like parquet —
    predicate pushdown and column pruning apply — so ingest from ORC lakes
    costs the same scan shape; type drift is reconciled by
    ``enforce_schema`` (cast / NULL-fill / drop), not inference."""
    return enforce_schema(spark.read.orc(path), table)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (interop with Hive-era warehouses that read ORC only)."""
    df.write.mode(mode).orc(path)
