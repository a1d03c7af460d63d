"""SQL dialect abstraction for the JDBC/DBAPI sink.

The reference hardcodes MySQL (backtick identifiers, ``ON DUPLICATE KEY
UPDATE`` via error-1062 fallback, ``SHOW TABLES/COLUMNS`` —
``/root/reference/app/mysql.go``). The engine keeps those semantics behind a
dialect object so tests can run on sqlite (no MySQL server in CI) and
production points at MySQL/MariaDB. Identifiers are validated + quoted —
the reference concatenates them raw (mysql.go:173,408,482,516), a SQL
injection the engine does not reproduce (SURVEY.md §7 non-goals).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


def check_ident(name: str) -> str:
    if not _IDENT_RE.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


@dataclass(frozen=True)
class Dialect:
    name: str
    quote_char: str
    ph: str = "?"  # DBAPI parameter placeholder

    def q(self, ident: str) -> str:
        return f"{self.quote_char}{check_ident(ident)}{self.quote_char}"

    def upsert_sql(self, table: str, columns: list[str], key: str) -> str:
        raise NotImplementedError

    def guarded_upsert_sql(
        self, table: str, columns: list[str], key: str, ts_col: str
    ) -> str:
        """Upsert that only overwrites when the incoming row's sequence
        column is >= the stored one — last-writer-wins under out-of-order
        cross-batch delivery. ``ts_col`` must be in ``columns``."""
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join(self.ph for _ in columns)
        sets = ", ".join(
            f"{self.q(c)} = excluded.{self.q(c)}" for c in columns if c != key
        )
        return (
            f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) "
            f"ON CONFLICT({self.q(key)}) DO UPDATE SET {sets} "
            f"WHERE excluded.{self.q(ts_col)} >= {self.q(table)}.{self.q(ts_col)}"
        )

    def guarded_delete_sql(self, table: str, key: str, ts_col: str) -> str:
        return (
            f"DELETE FROM {self.q(table)} WHERE {self.q(key)} = {self.ph} "
            f"AND {self.q(ts_col)} <= {self.ph}"
        )

    # two-arg least/greatest spelling (sqlite scalar MIN/MAX; others
    # LEAST/GREATEST)
    least_fn = "MIN"
    greatest_fn = "MAX"

    def merge_upsert_sql(
        self, table: str, columns: list[str], key: str, merge: dict[str, str]
    ) -> str:
        """Upsert that COMBINES with the stored row instead of replacing it:
        ``merge`` maps column -> 'sum' | 'min' | 'max' | 'replace'. This is
        what lets a streaming micro-batch fold pre-aggregated deltas into a
        maintained aggregate table with one statement per row — the
        sink-side half of operators/incremental.py. NOT idempotent ('sum'
        double-applies on replay) — callers must pair it with the in-txn
        batch progress marker, which is exactly what merge_upsert_partition
        does."""
        t, e = self.q(table), "excluded"

        def combine(c: str) -> str:
            qc = self.q(c)
            kind = merge.get(c, "replace")
            if kind == "replace":
                return f"{qc} = {e}.{qc}"
            stored, new = f"{t}.{qc}", f"{e}.{qc}"
            if kind == "sum":
                return f"{qc} = {stored} + {new}"
            if kind == "min":
                return f"{qc} = {self.least_fn}({stored}, {new})"
            if kind == "max":
                return f"{qc} = {self.greatest_fn}({stored}, {new})"
            raise ValueError(f"unknown merge kind {kind!r} for column {c!r}")

        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join(self.ph for _ in columns)
        sets = ", ".join(combine(c) for c in columns if c != key)
        return (
            f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) "
            f"ON CONFLICT({self.q(key)}) DO UPDATE SET {sets}"
        )

    def delete_sql(self, table: str, key: str) -> str:
        return f"DELETE FROM {self.q(table)} WHERE {self.q(key)} = ?"

    def insert_sql(self, table: str, columns: list[str]) -> str:
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join("?" for _ in columns)
        return f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph})"


class MySQLDialect(Dialect):
    """MySQL/MariaDB: INSERT ... ON DUPLICATE KEY UPDATE (the set-based form
    of the reference's insert-then-update-on-1062 dance, mysql.go:357-374)."""

    def __init__(self) -> None:
        super().__init__(name="mysql", quote_char="`", ph="%s")

    def upsert_sql(self, table: str, columns: list[str], key: str) -> str:
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join("%s" for _ in columns)
        sets = ", ".join(
            f"{self.q(c)} = VALUES({self.q(c)})" for c in columns if c != key
        )
        return (
            f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )

    def guarded_upsert_sql(
        self, table: str, columns: list[str], key: str, ts_col: str
    ) -> str:
        # MySQL has no WHERE on ON DUPLICATE KEY UPDATE; per-column IF with
        # the sequence column assigned LAST (assignments evaluate in order)
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join("%s" for _ in columns)
        guard = f"VALUES({self.q(ts_col)}) >= {self.q(ts_col)}"
        data_cols = [c for c in columns if c not in (key, ts_col)]
        sets = ", ".join(
            f"{self.q(c)} = IF({guard}, VALUES({self.q(c)}), {self.q(c)})"
            for c in data_cols
        )
        sets += (f", {self.q(ts_col)} = IF({guard}, VALUES({self.q(ts_col)}), "
                 f"{self.q(ts_col)})")
        return (
            f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )

    def merge_upsert_sql(
        self, table: str, columns: list[str], key: str, merge: dict[str, str]
    ) -> str:
        # MySQL spelling: ON DUPLICATE KEY UPDATE, incoming row via
        # VALUES(col), stored row via the bare column name
        def combine(c: str) -> str:
            qc = self.q(c)
            kind = merge.get(c, "replace")
            if kind == "replace":
                return f"{qc} = VALUES({qc})"
            if kind == "sum":
                return f"{qc} = {qc} + VALUES({qc})"
            if kind == "min":
                return f"{qc} = LEAST({qc}, VALUES({qc}))"
            if kind == "max":
                return f"{qc} = GREATEST({qc}, VALUES({qc}))"
            raise ValueError(f"unknown merge kind {kind!r} for column {c!r}")

        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join("%s" for _ in columns)
        sets = ", ".join(combine(c) for c in columns if c != key)
        return (
            f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )

    def delete_sql(self, table: str, key: str) -> str:
        return f"DELETE FROM {self.q(table)} WHERE {self.q(key)} = %s"

    def insert_sql(self, table: str, columns: list[str]) -> str:
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join("%s" for _ in columns)
        return f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph})"


class SQLiteDialect(Dialect):
    """sqlite: INSERT ... ON CONFLICT(key) DO UPDATE (test stand-in)."""

    def __init__(self) -> None:
        super().__init__(name="sqlite", quote_char='"')

    def upsert_sql(self, table: str, columns: list[str], key: str) -> str:
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join("?" for _ in columns)
        sets = ", ".join(
            f"{self.q(c)} = excluded.{self.q(c)}" for c in columns if c != key
        )
        return (
            f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) "
            f"ON CONFLICT({self.q(key)}) DO UPDATE SET {sets}"
        )


class PostgresDialect(Dialect):
    """PostgreSQL: INSERT ... ON CONFLICT (key) DO UPDATE."""

    least_fn = "LEAST"
    greatest_fn = "GREATEST"

    def __init__(self) -> None:
        super().__init__(name="postgres", quote_char='"', ph="%s")

    def upsert_sql(self, table: str, columns: list[str], key: str) -> str:
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join("%s" for _ in columns)
        sets = ", ".join(
            f"{self.q(c)} = EXCLUDED.{self.q(c)}" for c in columns if c != key
        )
        return (
            f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) "
            f"ON CONFLICT ({self.q(key)}) DO UPDATE SET {sets}"
        )

    def delete_sql(self, table: str, key: str) -> str:
        return f"DELETE FROM {self.q(table)} WHERE {self.q(key)} = %s"

    def insert_sql(self, table: str, columns: list[str]) -> str:
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join("%s" for _ in columns)
        return f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph})"


DIALECTS: dict[str, Dialect] = {
    "mysql": MySQLDialect(),
    "sqlite": SQLiteDialect(),
    "postgres": PostgresDialect(),
}
