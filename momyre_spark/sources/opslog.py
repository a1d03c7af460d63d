"""Raw oplog decode: normalize MongoDB oplog entries to the engine's ops IR.

Re-expression of the reference's ``handleChange`` (C1-C9,
``/root/reference/app/mongo.go:157-454`` — its single largest function):

- C1 insert  (``op='i'``)   : whole document is the row
- C2 update  ``$set``       : partial field map, key from ``o2._id``
- C3 update  ``$v:2 diff``  : ``i``/``u``/``d`` top-level sections
- C4 update  ``diff.s<f>``  : nested-subdocument diff sections, re-nested
                              then flattened (the reference stops at the
                              third level, mongo.go:354-355; this decoder
                              recurses to any depth)
- C5 update  full-replace   : no ``$set``/``$v`` -> o1 IS the document
- C6 delete  (``op='d'``)   : emit ``{_id}`` delete
- C7 noop    (``op='n'``)   : dropped
- C8 txn     (``op='c'``)   : ``applyOps`` array unwrapped recursively, each
                              inner entry stamped with the outer ``ts`` plus
                              ``seq`` = array position (ts alone ties within
                              a txn; apply with ``order=("ts", "seq")``)
- C9 stamping               : every op carries (ts, seq, ns-table, op, _id)

Timestamps pack as ``T<<32 | I`` exactly like the resume token the reference
persists (mongo.go:171,613).

Decode runs as Arrow-batched ``mapInPandas``: oplog entries are
dynamic-schema JSON (no stable StructType exists by construction), so this is
the one ingest boundary where Python-per-batch is the right trade — the
per-batch work is pure dict walking, and everything downstream
(merge/apply) is JVM-side. In production the MongoDB Spark connector's change
streams surface ``updatedFields`` directly and C3/C4 never materialize
(SURVEY.md §2.3); this decoder exists for raw-oplog parity and tests.

Error semantics preserved: unknown shapes raise (failing the batch/query) —
the reference fail-stops via log.Fatalln (mongo.go:183 et al.); silently
dropping data is the one thing a replicator must never do.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "ts long, seq long, ns string, op string, `_id` string, payload string"
)
# quarantine-mode schema: decoded rows carry error=NULL; undecodable rows
# carry op='__reject', the raw entry text in payload, and the reason
DECODED_SCHEMA_Q = DECODED_SCHEMA + ", error string"


def pack_ts(t: int, i: int) -> int:
    """Resume token: T<<32|I (mongo.go:171,613)."""
    return (int(t) << 32) | int(i)


def flatten_doc(doc: dict, prefix: str = "") -> dict:
    """obj2plain (mongo.go:141-155): nested dicts -> '_'-joined flat keys;
    arrays/scalars pass through (arrays JSON-serialize at the sink)."""
    out: dict[str, Any] = {}
    for k, v in doc.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_doc(v, prefix=f"{key}_"))
        else:
            out[key] = v
    return out


def _strip_ns(ns: str) -> str:
    """'db.users' -> 'users' (P6, mongo.go:166-169)."""
    return ns.split(".", 1)[1] if "." in ns else ns


def _decode_v2_diff(diff: dict) -> dict:
    """$v:2 diff document -> flat partial-update map (C3+C4).

    Sections: 'i' (insert fields), 'u' (update fields), 'd' (delete fields ->
    explicit null), 's<name>' (sub-document diff, recursed)."""
    fields: dict[str, Any] = {}
    for section, body in diff.items():
        if section in ("i", "u"):
            if not isinstance(body, dict):
                raise ValueError(f"malformed $v:2 '{section}' section: {body!r}")
            fields.update(flatten_doc(body))
        elif section == "d":
            if not isinstance(body, dict):
                raise ValueError(f"malformed $v:2 'd' section: {body!r}")
            for f in body:
                fields[f] = None
        elif section.startswith("s"):
            sub = _decode_v2_diff(body)  # any depth, unlike mongo.go:354-355
            fields.update({f"{section[1:]}_{k}": v for k, v in sub.items()})
        elif section == "a":  # array-diff marker bool inside 's' sections
            continue
        else:
            raise ValueError(f"unknown $v:2 diff section: {section!r}")
    return fields


def decode_entry(entry: dict) -> list[dict]:
    """One raw oplog entry -> zero or more normalized ops."""
    op = entry.get("op")
    ns = entry.get("ns", "")
    ts_raw = entry.get("ts", {})
    ts = pack_ts(ts_raw.get("t", 0), ts_raw.get("i", 0)) if isinstance(ts_raw, dict) else int(ts_raw)
    o1 = entry.get("o") or {}
    o2 = entry.get("o2") or {}

    if op == "n":  # C7
        return []
    if op == "c":  # C8: transaction unwrap
        inner = o1.get("applyOps")
        if inner is None:
            return []  # other admin commands are not data
        out: list[dict] = []
        for sub in inner:
            sub = dict(sub)
            sub.setdefault("ts", {"t": ts >> 32, "i": ts & 0xFFFFFFFF})
            out.extend(decode_entry(sub))
        # All inner ops share the outer ts (same T<<32|I), so ts alone cannot
        # order a txn touching one key twice (e.g. insert then update). The
        # reference applies applyOps strictly in array order (mongo.go:428-454);
        # seq preserves that order as a secondary sort key — apply with
        # order=("ts", "seq").
        for i, norm in enumerate(out):
            norm["seq"] = i
        return out

    table = _strip_ns(ns)
    if op == "i":  # C1
        doc = flatten_doc(o1)
        _id = str(doc.pop("_id", ""))
        return [{"ts": ts, "seq": 0, "ns": table, "op": "insert", "_id": _id,
                 "payload": doc}]
    if op == "d":  # C6
        _id = str(o1.get("_id", ""))
        return [{"ts": ts, "seq": 0, "ns": table, "op": "delete", "_id": _id,
                 "payload": {}}]
    if op == "u":
        _id = str(o2.get("_id", o1.get("_id", "")))
        if "$set" in o1 or "$unset" in o1:  # C2 (v1 update)
            fields = flatten_doc(o1.get("$set", {}))
            fields.update({k: None for k in flatten_doc(o1.get("$unset", {}))})
            return [{"ts": ts, "seq": 0, "ns": table, "op": "update",
                     "_id": _id, "payload": fields}]
        if o1.get("$v") == 2 and "diff" in o1:  # C3/C4
            return [{"ts": ts, "seq": 0, "ns": table, "op": "update",
                     "_id": _id, "payload": _decode_v2_diff(o1["diff"])}]
        if any(k.startswith("$") for k in o1):
            raise ValueError(f"unknown update shape: {sorted(o1)}")  # fail-stop
        # C5 full replace: o1 is the complete document -> an insert-like reset
        doc = flatten_doc(o1)
        doc.pop("_id", None)
        return [{"ts": ts, "seq": 0, "ns": table, "op": "insert", "_id": _id,
                 "payload": doc}]
    raise ValueError(f"unknown oplog op: {op!r}")  # fail-stop (mongo.go:183)


def decode_oplog(
    raw: DataFrame,
    tables: list[str] | None = None,
    entry_col: str = "entry",
    on_error: str = "fail",
) -> DataFrame:
    """DataFrame of raw oplog JSON entries -> normalized ops frame.

    ``raw[entry_col]``: JSON text of one oplog entry per row. Namespace
    filtering (P4) happens post-decode here; with a real connector the
    ns IN-list is pushed into the source query (mongo.go:463-479).

    ``on_error``:
    - ``'fail'`` (default): unknown shapes raise, failing the batch — the
      reference's log.Fatalln semantics (mongo.go:183), correct for
      replication where a skipped op is silent divergence.
    - ``'quarantine'``: undecodable entries become ``op='__reject'`` rows
      (raw text in ``payload``, reason in ``error``; decoded rows carry
      ``error=NULL``) and the schema gains the ``error`` column — the
      dead-letter shape for bulk backfills, where one poison record must
      not kill a day-long job. Split with :func:`split_rejects`; the
      engine's apply path never consumes ``__reject`` rows silently (the
      op-type dispatch has no route for them).
    """
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"momyre: unknown on_error mode {on_error!r}")
    quarantine = on_error == "quarantine"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for text in pdf[entry_col]:
                try:
                    decoded = [
                        (
                            norm["ts"],
                            norm["seq"],
                            norm["ns"],
                            norm["op"],
                            norm["_id"],
                            json.dumps(norm["payload"]),
                        )
                        for norm in decode_entry(json.loads(text))
                    ]
                except Exception as exc:
                    if not quarantine:
                        raise
                    rows.append((0, 0, "", "__reject", None, text, str(exc)))
                    continue
                if quarantine:
                    rows.extend(r + (None,) for r in decoded)
                else:
                    rows.extend(decoded)
            cols = ["ts", "seq", "ns", "op", "_id", "payload"]
            if quarantine:
                cols.append("error")
            yield pd.DataFrame(rows, columns=cols).astype(
                {"ts": "int64", "seq": "int64"}
            )

    out = raw.mapInPandas(
        run, schema=DECODED_SCHEMA_Q if quarantine else DECODED_SCHEMA
    )
    if tables is not None:
        from pyspark.sql import functions as F

        cond = F.col("ns").isin(tables)
        if quarantine:
            cond = cond | (F.col("op") == "__reject")
        out = out.filter(cond)
    return out


def split_rejects(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a quarantine-mode decode into (ops, rejects). The ops side
    drops the all-NULL ``error`` column so it is plug-compatible with the
    fail-mode schema; the rejects side keeps (payload=raw entry, error)
    for the dead-letter sink."""
    from pyspark.sql import functions as F

    is_reject = F.col("op") == "__reject"
    ops = decoded.filter(~is_reject).drop("error")
    rejects = decoded.filter(is_reject).select("payload", "error")
    return ops, rejects
