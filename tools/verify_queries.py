"""Driver-style side-by-side verifier: run registered queries at a given
SF against their DuckDB oracles and compare row count, schema width, and
a value hash (columns sorted by name, rows sorted, 12dp float format —
mirrors the driver's compare).

Usage: python tools/verify_queries.py q1 q2 ...  [SF_DIR via env]
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.md5()
    for row in sorted(
        tuple(_fmt(row[i]) for i in order) for row in rows
    ):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _fmt(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_fmt(x) for x in v) + "]"
    return str(v)


def main(names):
    import duckdb

    import __spark_entry__ as entry
    from momyre_spark.session import get_spark

    spark = get_spark(app_name="verify")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    failed = []
    for name in names:
        df = qs[name](spark, SF)
        rows = df.collect()
        cols = df.columns
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = [
            m
            for m in ("CartesianProduct", "BatchEvalPython")
            if m in plan
        ]
        if name not in oracles:
            print(f"{name}: rows={len(rows)} (rows-only) plan_bad={bad}")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_rows = len(rows) == len(orows)
        ok_schema = sorted(cols) == sorted(ocols)
        hs = _hash(rows, cols)
        ho = _hash(orows, ocols)
        ok = ok_rows and ok_schema and hs == ho
        status = "PASS" if ok and not bad else "FAIL"
        if status == "FAIL":
            failed.append(name)
        print(
            f"{name}: {status} rows={len(rows)}/{len(orows)} "
            f"schema={'ok' if ok_schema else (cols, ocols)} "
            f"hash={'ok' if hs == ho else (hs, ho)} plan_bad={bad}"
        )
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1:])
