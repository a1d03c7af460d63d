"""PII detection/scrubbing (operators/pii.py): planted examples, scrub
idempotence, ordering contract, and the map-only plan."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from momyre_spark.operators.pii import (
    PII_PATTERNS,
    pii_report,
    pii_summary,
    scrub_pii,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="mail alice@example.org or bob@test.co now"),
            Row(doc_id=1, text="ssn 219-09-9999 phone (415) 555-0100"),
            Row(doc_id=2, text="server at 192.168.1.100 and 10.0.0.1"),
            Row(doc_id=3, text="clean document with no identifiers 12345"),
            Row(doc_id=4, text="call 415.555.0199 or 415-555-0100 twice"),
        ]
    )


def test_report_counts_planted_examples(spark):
    rep = {r["doc_id"]: r for r in pii_report(_docs(spark)).collect()}
    assert rep[0]["n_email"] == 2 and rep[0]["n_pii"] == 2
    assert rep[1]["n_ssn"] == 1 and rep[1]["n_phone"] == 1
    assert rep[2]["n_ip"] == 2
    assert rep[3]["n_pii"] == 0
    assert rep[4]["n_phone"] == 2
    # SSNs (3-2-4 digits) never double-count as phones (3-3-4)
    assert rep[1]["n_pii"] == 2


def test_scrub_replaces_all_and_is_idempotent(spark):
    once = scrub_pii(_docs(spark))
    rows = {r["doc_id"]: r["text"] for r in once.collect()}
    assert rows[0] == "mail <EMAIL> or <EMAIL> now"
    assert rows[1] == "ssn <SSN> phone <PHONE>"  # (415) opener consumed
    assert rows[2] == "server at <IP> and <IP>"
    assert rows[3] == "clean document with no identifiers 12345"
    # idempotent: placeholders match no pattern
    twice = {r["doc_id"]: r["text"] for r in scrub_pii(once).collect()}
    assert twice == rows
    # nothing matching any pattern survives a scrub
    leftover = pii_report(once).agg(F.sum("n_pii")).collect()[0][0]
    assert leftover == 0


def test_scrub_out_col_preserves_original(spark):
    out = scrub_pii(_docs(spark), out_col="clean")
    r = {x["doc_id"]: x for x in out.collect()}
    assert "@example.org" in r[0]["text"] and "<EMAIL>" in r[0]["clean"]


def test_summary_rolls_up(spark):
    s = {r["kind"]: r for r in pii_summary(_docs(spark)).collect()}
    assert s["email"]["n_matches"] == 2 and s["email"]["n_docs"] == 1
    assert s["phone"]["n_matches"] == 3 and s["phone"]["n_docs"] == 2
    assert s["ip"]["n_matches"] == 2 and s["ip"]["n_docs"] == 1
    assert s["ssn"]["n_matches"] == 1


def test_plan_is_map_only_no_python(spark):
    df = scrub_pii(_docs(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    rep = pii_report(_docs(spark))
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_pattern_table_is_ordered_contract(spark):
    # scrub order is part of the contract (module docstring)
    assert list(PII_PATTERNS) == ["email", "ssn", "phone", "ip"]
