"""Sink-side DDL reconciliation (reference D1–D3, ``mysql.go:146-290``).

Given the declared spec and the sink's current schema, compute a plan of DDL
statements plus the set of columns needing backfill — exactly the
reference's semantics:

- extra tables dropped only with ``force`` (mysql.go:168-170);
- missing tables created with ``_id varchar(24) PRIMARY KEY`` first
  (mysql.go:183-198), columns in declared order (D3);
- column type mismatch (exact string compare, mysql.go:224-236) ->
  drop + re-add, and the column is marked for resync;
- extra columns dropped only with ``force`` (mysql.go:238-240);
- missing columns added NULL-able (mysql.go:251-266) and marked for resync.

Pure computation: takes current schema as plain dicts, returns SQL strings —
trivially unit-testable and executable over any DBAPI/JDBC connection. The
engine applies them driver-side (DDL is not a distributed operation).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from momyre_spark.sinks.dialects import Dialect
from momyre_spark.spec import ID_COL, TableSpec

ID_DDL_TYPE = "varchar(24)"  # mysql.go:185-188


@dataclass
class DDLPlan:
    statements: list[str] = field(default_factory=list)
    resync_columns: dict[str, list[str]] = field(default_factory=dict)
    skipped_drops: list[str] = field(default_factory=list)  # would need force

    def mark_resync(self, table: str, column: str) -> None:
        self.resync_columns.setdefault(table, []).append(column)


def create_table_sql(spec: TableSpec, dialect: Dialect) -> str:
    q = dialect.q
    cols = [f"{q(ID_COL)} {ID_DDL_TYPE} NOT NULL"]
    cols += [f"{q(name)} {typ} NULL" for name, typ in spec.ddl_columns().items()]
    cols.append(f"PRIMARY KEY ({q(ID_COL)})")
    return f"CREATE TABLE {q(spec.name)} ({', '.join(cols)})"


def reorder_columns_sql(
    spec: TableSpec, current_order: list[str], dialect: Dialect
) -> list[str]:
    """D3 (mysql.go:267-285): `_id` FIRST, then declared order via a
    CHANGE ... AFTER chain. Cosmetic — emitted only for dialects whose DDL
    supports column positioning (MySQL); others return []."""
    if dialect.name != "mysql":
        return []
    q = dialect.q
    want = [ID_COL, *spec.ddl_columns().keys()]
    if current_order == want:
        return []
    types = {ID_COL: ID_DDL_TYPE, **spec.ddl_columns()}
    stmts = [
        f"ALTER TABLE {q(spec.name)} MODIFY {q(ID_COL)} {ID_DDL_TYPE} NOT NULL FIRST"
    ]
    for prev, col in zip(want, want[1:]):
        stmts.append(
            f"ALTER TABLE {q(spec.name)} MODIFY {q(col)} {types[col]} NULL "
            f"AFTER {q(prev)}"
        )
    return stmts


def reconcile(
    specs: dict[str, TableSpec],
    current: dict[str, dict[str, str]],
    dialect: Dialect,
    force: bool = False,
) -> DDLPlan:
    """Diff declared spec vs current sink schema -> DDL plan + resync set.

    ``current``: table -> {column -> declared-type-string} as reported by the
    sink (``SHOW TABLES`` / ``SHOW COLUMNS``, mysql.go:150-162,203-222).
    """
    plan = DDLPlan()
    q = dialect.q

    for tname in sorted(current):
        if tname in specs or tname == "momyre_progress":
            continue
        if force:  # mysql.go:168-170: destructive, force-gated
            plan.statements.append(f"DROP TABLE {q(tname)}")
        else:
            plan.skipped_drops.append(f"table:{tname}")

    for tname, spec in specs.items():
        want = spec.ddl_columns()
        if tname not in current:
            plan.statements.append(create_table_sql(spec, dialect))
            for col in want:
                plan.mark_resync(tname, col)
            continue

        have = {c: t for c, t in current[tname].items() if c != ID_COL}
        for col, typ in want.items():
            if col not in have:
                plan.statements.append(
                    f"ALTER TABLE {q(tname)} ADD COLUMN {q(col)} {typ} NULL"
                )
                plan.mark_resync(tname, col)  # mysql.go:265
            elif have[col].lower() != typ.lower():  # exact compare, mysql.go:224-236
                plan.statements.append(f"ALTER TABLE {q(tname)} DROP COLUMN {q(col)}")
                plan.statements.append(
                    f"ALTER TABLE {q(tname)} ADD COLUMN {q(col)} {typ} NULL"
                )
                plan.mark_resync(tname, col)
        for col in have:
            if col not in want:
                if force:  # mysql.go:238-240
                    plan.statements.append(
                        f"ALTER TABLE {q(tname)} DROP COLUMN {q(col)}"
                    )
                else:
                    plan.skipped_drops.append(f"column:{tname}.{col}")
    return plan
