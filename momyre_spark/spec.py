"""Replication spec: declarative YAML -> Spark schemas + projections.

The reference is driven by ``momyre.yml`` (``/root/reference/momyre.yml:3-15``):
a map ``tables.<name>.<column>: <mysql-type>`` parsed order-preservingly in
``run.go:82-125``. Dotted column names (``cfg.pub``) address nested document
fields and are renamed to ``_``-joined SQL names (``col4sql``,
``mysql.go:54-56``); documents are recursively flattened the same way
(``obj2plain``/``obj2add``, ``mongo.go:141-155``); fields not declared are
silently dropped and declared-but-absent fields become NULL
(``mysql.go:381-407,449-458``); ``_id`` is implicit and ignored if configured
(``run.go:105-107``).

Here the spec compiles to *column expressions*: a flatten-select that Catalyst
prunes down to exactly the needed leaf fields (nested-column pruning reaches
the parquet reader), so schema enforcement is free at any scale.

Unlike the reference, a ``defaults:`` sub-map is actually honored (the
reference parses it at ``run.go:108-115`` but never applies it — dead code;
see the commented-out intent at ``mysql.go:286-287``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import yaml
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

ID_COL = "_id"

# MySQL declared type -> Spark SQL type (SURVEY.md §1.2). Matching is on the
# base type name; precision suffixes like (20) are ignored except tinyint(1).
_MYSQL_BASE = {
    "bigint": "bigint",
    "int": "int",
    "integer": "int",
    "mediumint": "int",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "varchar": "string",
    "char": "string",
    "text": "string",
    "mediumtext": "string",
    "longtext": "string",
    "blob": "string",  # arrays/binary are JSON-serialized text (mysql.go:402-405)
    "json": "string",
    "double": "double",
    "float": "float",
    "decimal": None,  # keep declared precision, handled below
    "datetime": "timestamp",
    "timestamp": "timestamp",
    "date": "date",
    "boolean": "boolean",
    "bool": "boolean",
}

_TYPE_RE = re.compile(r"^\s*([a-zA-Z]+)\s*(\(([\d,\s]+)\))?")


def mysql_to_spark_type(mysql_type: str) -> str:
    """Map a declared MySQL column type to a Spark SQL type string."""
    m = _TYPE_RE.match(mysql_type)
    if not m:
        raise ValueError(f"unparseable declared type: {mysql_type!r}")
    base, args = m.group(1).lower(), m.group(3)
    if base == "tinyint" and args and args.strip() == "1":
        return "boolean"  # momyre.yml:7 `srv: tinyint(1)` is a bool flag
    if base == "decimal":
        return f"decimal({args})" if args else "decimal(18,2)"
    spark = _MYSQL_BASE.get(base)
    if spark is None:
        raise ValueError(f"unsupported declared type: {mysql_type!r}")
    return spark


def col4sql(name: str) -> str:
    """Dotted config/doc path -> flat SQL column name (mysql.go:54-56)."""
    return name.replace(".", "_")


@dataclass
class TableSpec:
    """One table's declared mapping (insertion-ordered, like yaml.MapSlice)."""

    name: str
    columns: dict[str, str]  # dotted source path -> declared mysql type
    defaults: dict[str, object] = field(default_factory=dict)

    @property
    def sql_columns(self) -> dict[str, str]:
        """Flat sink column name -> Spark SQL type (``_id`` first, D3)."""
        out = {ID_COL: "string"}
        for path, mysql_t in self.columns.items():
            out[col4sql(path)] = mysql_to_spark_type(mysql_t)
        return out

    def ddl_columns(self) -> dict[str, str]:
        """Flat sink column name -> declared MySQL type (for the JDBC sink DDL)."""
        return {col4sql(path): t for path, t in self.columns.items()}


@dataclass
class Spec:
    tables: dict[str, TableSpec]


def parse_spec(text: str) -> Spec:
    """Parse a momyre.yml-style replication spec (run.go:82-125 semantics)."""
    raw = yaml.safe_load(text) or {}
    tables: dict[str, TableSpec] = {}
    for tname, cols in (raw.get("tables") or {}).items():
        columns: dict[str, str] = {}
        defaults: dict[str, object] = {}
        for cname, ctype in (cols or {}).items():
            if cname == "defaults":  # run.go:108-115
                defaults = {col4sql(k): v for k, v in (ctype or {}).items()}
                continue
            if cname == ID_COL:  # implicit, ignored if configured (run.go:105-107)
                continue
            columns[cname] = str(ctype)
        tables[tname] = TableSpec(name=tname, columns=columns, defaults=defaults)
    return Spec(tables=tables)


# --------------------------------------------------------------------------
# Flatten projection (reference P1: obj2plain, mongo.go:141-155)
# --------------------------------------------------------------------------
def flatten_exprs(schema: StructType, prefix: str = "", sep: str = "_") -> list[Column]:
    """Recursive flatten: struct field ``a.b`` -> column ``a_b``.

    Arrays are NOT flattened — the reference JSON-serializes them whole
    (mysql.go:402-405); callers convert with ``to_json`` via
    ``enforce_schema``.
    """
    out: list[Column] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, StructType):
            out.extend(
                flatten_exprs(f.dataType, prefix=f"{path}.", sep=sep)
            )
        else:
            out.append(F.col(f"`{path}`".replace(".", "`.`")).alias(path.replace(".", sep)))
    return out


def flatten_names(schema: StructType, prefix: str = "", sep: str = "_") -> list[str]:
    out: list[str] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, StructType):
            out.extend(flatten_names(f.dataType, prefix=f"{path}.", sep=sep))
        else:
            out.append(path.replace(".", sep))
    return out


def flatten(df: DataFrame, sep: str = "_") -> DataFrame:
    # '_'-joined flattening can collide ({a:{b:1}} and a literal a_b field
    # both become a_b). The reference silently overwrites map entries
    # (mongo.go:141-155); silently losing a column is not acceptable here.
    names = flatten_names(df.schema, sep=sep)
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"flatten name collision(s): {sorted(dupes)}")
    return df.select(*flatten_exprs(df.schema, sep=sep))


# --------------------------------------------------------------------------
# Schema-enforcement projection (reference P2+P3: mysql.go:381-407,449-458)
# --------------------------------------------------------------------------
def enforce_schema(df: DataFrame, table: TableSpec) -> DataFrame:
    """Project ``df`` onto the table's declared sink schema.

    - nested structs flattened with ``_`` names (P1);
    - only declared columns kept; extra source fields dropped (P3);
    - declared-but-absent columns become NULL (mysql.go:381-407), unless a
      default is declared;
    - arrays / binary JSON-serialized to text for blob columns
      (mysql.go:402-405; uniformly, fixing the reference's insert-path gap
      at mysql.go:399-406);
    - values cast to the declared type.
    """
    flat = flatten(df)
    have = {f.name: f.dataType for f in flat.schema.fields}
    exprs: list[Column] = []
    for name, spark_t in table.sql_columns.items():
        if name in have:
            src_t = have[name]
            col = F.col(f"`{name}`")
            if isinstance(src_t, ArrayType) or (
                src_t.typeName() in ("binary",) and spark_t == "string"
            ):
                col = F.to_json(col) if isinstance(src_t, ArrayType) else F.base64(col)
            expr = col.cast(spark_t)
            if name in table.defaults:
                expr = F.coalesce(expr, F.lit(table.defaults[name]).cast(spark_t))
            exprs.append(expr.alias(name))
        else:
            default = table.defaults.get(name)
            exprs.append(F.lit(default).cast(spark_t).alias(name))
    return flat.select(*exprs)
