"""Chat/SFT transcript operators: parse, gate features, pair assembly."""

from __future__ import annotations

import json

from pyspark.sql import Row

from momyre_spark.operators.chat import chat_pairs, chat_stats, chat_turns


def _convos(spark):
    rows = [
        # well-formed, alternating, user-first
        Row(doc_id=1, convo=json.dumps([
            {"role": "user", "content": "hello there"},
            {"role": "assistant", "content": "hi how can I help"},
            {"role": "user", "content": "what is spark"},
            {"role": "assistant", "content": "a distributed engine"},
        ])),
        # assistant-first: must fail the alternates gate
        Row(doc_id=2, convo=json.dumps([
            {"role": "assistant", "content": "unprompted"},
            {"role": "user", "content": "ok"},
        ])),
        # double user turn: must fail the alternates gate
        Row(doc_id=3, convo=json.dumps([
            {"role": "user", "content": "a"},
            {"role": "user", "content": "b"},
            {"role": "assistant", "content": "c"},
        ])),
        # malformed JSON: zero turns, gate false
        Row(doc_id=4, convo="{not json"),
        # quotes/backslashes survive the JSON roundtrip
        Row(doc_id=5, convo=json.dumps([
            {"role": "user", "content": 'say "hi\\there"'},
            {"role": "assistant", "content": '"hi\\there"'},
        ])),
        # an assistant turn with MISSING content must not poison the sum
        Row(doc_id=6, convo=json.dumps([
            {"role": "user", "content": "hi"},
            {"role": "assistant"},
            {"role": "user", "content": "q"},
            {"role": "assistant", "content": "hello world"},
        ])),
    ]
    return spark.createDataFrame(rows)


def test_chat_turns_explode_and_escaping(spark):
    turns = chat_turns(_convos(spark), "convo")
    got = {(r["doc_id"], r["turn_idx"]): (r["role"], r["content"])
           for r in turns.collect()}
    assert got[(1, 0)] == ("user", "hello there")
    assert got[(1, 3)] == ("assistant", "a distributed engine")
    # malformed doc contributes no rows
    assert not any(d == 4 for d, _ in got)
    # escaping round-trips
    assert got[(5, 1)] == ("assistant", '"hi\\there"')


def test_chat_stats_gates(spark):
    stats = {r["doc_id"]: r for r in chat_stats(_convos(spark), "convo").collect()}
    assert (stats[1]["n_turns"], stats[1]["n_user"], stats[1]["n_assistant"]) == (4, 2, 2)
    assert stats[1]["alternates"] is True
    # loss tokens: assistant turns only ("hi how can I help" = 5,
    # "a distributed engine" = 3)
    assert stats[1]["assistant_tokens"] == 8
    assert stats[2]["alternates"] is False  # assistant-first
    assert stats[3]["alternates"] is False  # double user
    assert stats[4]["n_turns"] == 0 and stats[4]["alternates"] is False
    assert stats[4]["assistant_tokens"] == 0
    # null-content turn counts 0; the other assistant turn still counts
    assert stats[6]["assistant_tokens"] == 2
    assert stats[6]["alternates"] is True


def test_chat_pairs_assembly(spark):
    pairs = chat_pairs(chat_turns(_convos(spark), "convo"))
    got = {(r["doc_id"], r["response_idx"]): (r["prompt"], r["response"])
           for r in pairs.collect()}
    assert got[(1, 1)] == ("hello there", "hi how can I help")
    assert got[(1, 3)] == ("what is spark", "a distributed engine")
    # doc 2's assistant turn has no preceding user turn -> no pair
    assert not any(d == 2 for d, _ in got)
    # doc 3: assistant at idx 2 pairs with the user turn directly before
    assert got[(3, 2)] == ("b", "c")


def test_chat_stats_no_explode_plan(spark):
    """Gate features must stay map-only: no Generate (explode) and no
    exchange in the plan."""
    plan = (
        chat_stats(_convos(spark), "convo")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan
    assert "Exchange" not in plan


def test_preference_pairs_top_vs_bottom_disjoint(spark):
    from momyre_spark.operators.chat import build_preference_pairs
    from pyspark.sql import Row

    # group a: scores 1..6 -> pairs (6,1),(5,2),(4,3); group b: 3 rows ->
    # one pair, the median row 2 sits out
    rows = [Row(g="a", doc_id=i, s=float(i)) for i in range(1, 7)]
    rows += [Row(g="b", doc_id=i, s=float(i)) for i in (1, 2, 3)]
    out = build_preference_pairs(
        spark.createDataFrame(rows), ["g"], "s", id_col="doc_id"
    ).collect()
    got = {(r["g"], r["pair_idx"]): (r["chosen_id"], r["rejected_id"], r["margin"])
           for r in out}
    assert got == {
        ("a", 1): (6, 1, 5.0),
        ("a", 2): (5, 2, 3.0),
        ("a", 3): (4, 3, 1.0),
        ("b", 1): (3, 1, 2.0),
    }
    # no candidate appears on both sides
    chosen = {(r["g"], r["chosen_id"]) for r in out}
    rejected = {(r["g"], r["rejected_id"]) for r in out}
    assert not chosen & rejected


def test_preference_pairs_margin_filter_and_tie_determinism(spark):
    from momyre_spark.operators.chat import build_preference_pairs
    from pyspark.sql import Row

    # all-equal scores -> every margin is 0 -> no pairs survive the default
    flat = spark.createDataFrame([Row(g="a", doc_id=i, s=1.0) for i in range(4)])
    assert build_preference_pairs(flat, ["g"], "s").count() == 0
    # min_margin keeps only wide pairs
    rows = [Row(g="a", doc_id=i, s=float(i)) for i in range(1, 5)]
    out = build_preference_pairs(
        spark.createDataFrame(rows), ["g"], "s", min_margin=2.5
    ).collect()
    assert [(r["chosen_id"], r["rejected_id"]) for r in out] == [(4, 1)]
    # score ties inside a group break on id, identically in repeat runs
    tied = spark.createDataFrame(
        [Row(g="a", doc_id=i, s=float(i % 2)) for i in range(6)]
    )
    a = sorted(map(tuple, build_preference_pairs(tied, ["g"], "s").collect()))
    b = sorted(map(tuple, build_preference_pairs(tied, ["g"], "s").collect()))
    assert a == b


def test_preference_pairs_null_scores_excluded(spark):
    from pyspark.sql import Row

    from momyre_spark.operators.chat import build_preference_pairs

    rows = [Row(g="a", doc_id=1, s=0.9), Row(g="a", doc_id=2, s=0.5),
            Row(g="a", doc_id=3, s=0.1), Row(g="a", doc_id=4, s=None)]
    out = build_preference_pairs(
        spark.createDataFrame(rows, "g string, doc_id long, s double"),
        ["g"], "s",
    ).collect()
    # the NULL row neither consumes a slot nor nulls the widest pair:
    # ranking runs over the 3 scored docs -> one pair (best, worst)
    assert [(r["chosen_id"], r["rejected_id"]) for r in out] == [(1, 3)]


def test_chat_loss_mask_spans_slice_assistant_contents(spark):
    import json as _json

    from momyre_spark.operators.chat import chat_loss_mask

    convo = [
        {"role": "user", "content": "hi there"},
        {"role": "assistant", "content": "hello!"},
        {"role": "user", "content": "bye"},
        {"role": "assistant", "content": "see ya"},
    ]
    no_assistant = [{"role": "user", "content": "just me"}]
    rows = [
        (1, _json.dumps(convo)),
        (2, _json.dumps(no_assistant)),
        (3, "not json at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in chat_loss_mask(df).collect()}
    assert set(got) == {1, 2}  # malformed JSON dropped visibly
    r = got[1]
    spans = [(s["start"], s["end"]) for s in r["loss_spans"]]
    assert len(spans) == 2
    sliced = [r["train_text"][a:b] for a, b in spans]
    assert sliced == ["hello!", "see ya"]
    # headers/sentinels are outside every span
    for a, b in spans:
        assert "<|" not in r["train_text"][a:b]
    # full reassembly: the template is exactly role-header+content+end
    expect = "".join(
        f"<|{t['role']}|>\n{t['content']}<|end|>\n" for t in convo
    )
    assert r["train_text"] == expect
    assert got[2]["loss_spans"] == []


def test_chat_loss_mask_drops_null_role_or_content(spark):
    # a well-formed JSON turn MISSING role or content would NULL the
    # concat fold and poison the spans — the conversation must be
    # dropped visibly, same contract as malformed JSON
    from momyre_spark.operators.chat import chat_loss_mask

    rows = [
        (1, '[{"role":"user","content":"ok"},'
            '{"role":"assistant","content":"fine"}]'),
        (2, '[{"role":"user"}]'),  # no content
        (3, '[{"content":"orphan"}]'),  # no role
        (4, '[{"role":"user","content":"a"},{"role":"assistant"}]'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in chat_loss_mask(df).collect()}
    assert set(got) == {1}
    assert got[1]["train_text"] is not None


def test_chat_loss_mask_is_map_only(spark):
    from momyre_spark.operators.chat import chat_loss_mask

    df = spark.createDataFrame(
        [(1, '[{"role":"user","content":"x"}]')], "doc_id long, text string"
    )
    plan = (
        chat_loss_mask(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
    assert "Generate" not in plan  # HOF fold, no explode
