"""Deterministic CDC ops-log fixture + sequential reference applier.

Implements FIXTURES.md §C: ~500 keys, ~10 ops/key over the `users` schema
(type/email/pubkey), covering insert-only, insert->updates (partial merge),
insert->delete, insert->delete->insert, update-to-null, and replayed ops.
The golden final state comes from ``sequential_apply`` — a direct Python
transcription of the reference's one-op-at-a-time semantics
(mysql.go:316-355: insert/upsert, partial update, delete).
"""

from __future__ import annotations

import json
import random

FIELDS = ["type", "email", "pubkey"]


def make_ops(n_keys: int = 200, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    ops: list[dict] = []
    ts = 1000

    def hexid(i: int) -> str:
        return f"{i:024x}"

    def payload_full(i: int) -> dict:
        return {
            "type": rng.choice(["admin", "user", "guest"]),
            "email": f"u{i}@example.com",
            "pubkey": f"pk{rng.randrange(10**6)}",
        }

    for i in range(n_keys):
        key = hexid(i)
        scenario = i % 6
        ops.append({"ts": (ts := ts + 1), "ns": "users", "op": "insert",
                    "_id": key, "payload": payload_full(i)})
        if scenario == 0:
            pass  # insert only
        elif scenario == 1:  # partial updates — untouched fields survive
            for _ in range(rng.randrange(1, 4)):
                f = rng.choice(FIELDS)
                ops.append({"ts": (ts := ts + 1), "ns": "users", "op": "update",
                            "_id": key, "payload": {f: f"upd{ts}"}})
        elif scenario == 2:  # delete
            ops.append({"ts": (ts := ts + 1), "ns": "users", "op": "delete",
                        "_id": key, "payload": {}})
        elif scenario == 3:  # delete then re-insert — re-insert wins
            ops.append({"ts": (ts := ts + 1), "ns": "users", "op": "delete",
                        "_id": key, "payload": {}})
            ops.append({"ts": (ts := ts + 1), "ns": "users", "op": "insert",
                        "_id": key, "payload": payload_full(i + 10000)})
        elif scenario == 4:  # explicit set-to-null (distinct from absent)
            ops.append({"ts": (ts := ts + 1), "ns": "users", "op": "update",
                        "_id": key, "payload": {"email": None}})
        else:  # update after delete is a no-op; key stays deleted
            ops.append({"ts": (ts := ts + 1), "ns": "users", "op": "delete",
                        "_id": key, "payload": {}})
            ops.append({"ts": (ts := ts + 1), "ns": "users", "op": "update",
                        "_id": key, "payload": {"type": "ghost"}})
    return ops


def sequential_apply(ops: list[dict], state: dict[str, dict] | None = None) -> dict[str, dict]:
    """The reference's one-at-a-time apply loop, in-order (run.go:301-322)."""
    state = dict(state or {})
    for op in sorted(ops, key=lambda o: o["ts"]):
        key, p = op["_id"], op["payload"]
        if op["op"] == "insert":
            state[key] = {f: p.get(f) for f in FIELDS}  # absent -> NULL
        elif op["op"] == "update":
            if key in state:  # UPDATE matching 0 rows is a no-op
                for f, v in p.items():
                    if f in FIELDS:
                        state[key][f] = v
        elif op["op"] == "delete":
            state.pop(key, None)
    return state


def ops_as_rows(ops: list[dict]) -> list[tuple]:
    """(ts, ns, op, _id, payload_json) rows for a Spark DataFrame."""
    return [
        (o["ts"], o["ns"], o["op"], o["_id"], json.dumps(o["payload"]))
        for o in ops
    ]


OPS_SCHEMA = "ts long, ns string, op string, `_id` string, payload string"
