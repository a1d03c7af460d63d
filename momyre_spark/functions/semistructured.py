"""Semi-structured JSON columns via Spark 4 VARIANT.

The reference stores change payloads as BSON documents and decodes each
field on access (/root/reference/app/mongo.go:157-220 walks the document per
column); the pre-variant Spark analog — ``get_json_object`` per field —
re-parses the full JSON text once per extraction. VARIANT is the scale
path: ``parse_json`` parses each value ONCE into a binary encoding, and
every ``variant_get`` afterwards is a path lookup into that encoding, not a
string parse. For a props column read by 10 queries x 5 fields, that is
1 parse instead of 50 per row — at 100 TB the parse is the dominant CPU
cost of the scan.

Everything here is JVM expression composition (whole-stage codegen, no
Python); ``promote_json_fields`` is map-only and fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# out-column -> (JSON path, Spark type DDL)
FieldSpec = dict[str, tuple[str, str]]


def promote_json_fields(
    df: DataFrame,
    json_col: str,
    fields: FieldSpec,
    strict: bool = False,
    keep_variant: str | None = None,
) -> DataFrame:
    """Parse ``json_col`` once into a VARIANT and promote ``fields`` (each
    ``out_name -> (path, type)``) to typed top-level columns.

    ``strict=False`` (default) uses ``try_variant_get`` — a missing path or
    uncastable value yields NULL, the right semantics for schema-drifting
    event streams. ``strict=True`` uses ``variant_get`` which fails the
    task instead (fail-stop ingest, the reference's posture for undecodable
    ops). ``keep_variant`` optionally retains the parsed VARIANT under that
    name for downstream ad-hoc paths (parse once, share everywhere).
    """
    tmp = keep_variant or f"__variant_{json_col}"
    out = df.withColumn(tmp, F.parse_json(F.col(json_col)))
    getter = F.variant_get if strict else F.try_variant_get
    for name, (path, typ) in fields.items():
        out = out.withColumn(name, getter(F.col(tmp), path, typ))
    return out if keep_variant else out.drop(tmp)


def variant_typeof(df: DataFrame, variant_col: str, out_col: str = "vtype") -> DataFrame:
    """Tag each row with the VARIANT's top-level JSON type (schema-drift
    profiling: ``groupBy(vtype).count()`` shows what a 100 TB props column
    actually contains before anyone writes extraction paths)."""
    return df.withColumn(out_col, F.schema_of_variant(F.col(variant_col)))
