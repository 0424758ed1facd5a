"""Chat/SFT assembly operators (operators/chat.py, r8): template
rendering, structural validation, loss-mask span offsets, prompt-level
dedup. Every golden is hand-computed from the DEFAULT_TEMPLATE
constants so a template edit fails loudly here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.operators import chat as C


def _df(spark, turns):
    return spark.createDataFrame(
        [(1, turns)], f"doc_id long, turns {C.TURNS_SCHEMA}")


def _one(spark, col, turns):
    return _df(spark, turns).select(col.alias("v")).head()["v"]


def test_render_hand_golden(spark):
    turns = [("system", "Be helpful."), ("user", "Hi"),
             ("assistant", "Hello!")]
    got = _one(spark, C.render_chat(F.col("turns")), turns)
    assert got == ("<|system|>\nBe helpful.\n"
                   "<|user|>\nHi\n"
                   "<|assistant|>\nHello!<|end|>\n")


def test_render_null_content_and_custom_template(spark):
    got = _one(spark, C.render_chat(F.col("turns")),
               [("user", None), ("assistant", "a")])
    assert got == "<|user|>\n\n<|assistant|>\na<|end|>\n"
    tpl = {"user": ("U:", "\n"), "assistant": ("A:", "\n")}
    got = _one(spark, C.render_chat(F.col("turns"), tpl),
               [("user", "q"), ("assistant", "a")])
    assert got == "U:q\nA:a\n"


@pytest.mark.parametrize("turns,reason", [
    ([], "empty"),
    ([("tool", "x"), ("assistant", "y")], "unknown_role"),
    ([("assistant", "y")], "bad_start"),
    ([("user", "q"), ("system", "s"), ("assistant", "a")],
     "misplaced_system"),
    ([("user", "q"), ("user", "q2"), ("assistant", "a")],
     "repeated_role"),
    ([("user", "  "), ("assistant", "a")], "empty_content"),
    ([("user", "q"), ("assistant", None)], "empty_content"),
    ([("system", "s"), ("user", "q")], "no_final_assistant"),
    ([("user", "q"), ("assistant", "a")], None),
    ([("system", "s"), ("user", "q"), ("assistant", "a"),
      ("user", "q2"), ("assistant", "a2")], None),
])
def test_validate_first_failing_rule(spark, turns, reason):
    got = _one(spark, C.validate_chat(F.col("turns")), turns)
    assert got == reason, (turns, got)


def test_assistant_spans_hand_golden(spark):
    turns = [("system", "Be helpful."), ("user", "Hi"),
             ("assistant", "Hello!"), ("user", "More?"),
             ("assistant", "Sure.")]
    rendered = _one(spark, C.render_chat(F.col("turns")), turns)
    spans = _one(spark, C.assistant_spans(F.col("turns")), turns)
    # hand arithmetic: system 11+11+1=23, user 9+2+1 -> pos 35,
    # assistant prefix 14 -> start 49 + len("Hello!") -> 55; after
    # <|end|>\n (8) pos 63, user2 15 -> 78, +14 -> 92 + 5 -> 97
    assert [tuple(s) for s in spans] == [(49, 55), (92, 97)]
    # the definition test: each span slices exactly its content out of
    # the rendered string
    assert rendered[49:55] == "Hello!"
    assert rendered[92:97] == "Sure."
    # markers never train
    for s, e in [tuple(x) for x in spans]:
        assert "<|" not in rendered[s:e]


def test_assistant_spans_empty_and_no_assistant(spark):
    assert _one(spark, C.assistant_spans(F.col("turns")),
                [("user", "q")]) == []


def test_sft_pair_dedup_keep_best_and_quarantine(spark):
    rows = [
        (1, "what is spark", 0.9),
        (2, "what is spark", 0.4),   # same prompt, better (lower) score
        (3, "what is spark", 0.7),
        (4, "other prompt", 0.5),
        (5, "", 0.1), (6, None, 0.2),  # quarantined, never collapsed
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, prompt string, neg_reward double")
    kept = {r.doc_id for r in C.sft_pair_dedup(
        df, "prompt", "doc_id", order_col="neg_reward").collect()}
    assert kept == {2, 4, 5, 6}
    # layout independence
    again = {r.doc_id for r in C.sft_pair_dedup(
        df.repartition(5), "prompt", "doc_id",
        order_col="neg_reward").collect()}
    assert again == kept


def test_spans_plan_is_shuffle_free(spark):
    import contextlib
    import io

    df = spark.createDataFrame(
        [(1, [("user", "q"), ("assistant", "a")])],
        f"doc_id long, turns {C.TURNS_SCHEMA}")
    out = df.select(C.render_chat(F.col("turns")),
                    C.validate_chat(F.col("turns")),
                    C.assistant_spans(F.col("turns")))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_sft_prepare_end_to_end(spark):
    """One-call recipe: invalid rows drop with attributed reasons, the
    prompt (conversation minus final assistant turn) dedups keep-best,
    survivors carry rendered text + spans."""
    rows = [
        # two answers to ONE prompt: keep the better (lower order) one
        (1, [("user", "q1"), ("assistant", "long answer")], 0.9),
        (2, [("user", "q1"), ("assistant", "better answer")], 0.2),
        # distinct prompt survives
        (3, [("system", "s"), ("user", "q2"), ("assistant", "a2")], 0.5),
        # invalid: no final assistant
        (4, [("user", "q3")], 0.1),
        # invalid: repeated role
        (5, [("user", "x"), ("user", "y"), ("assistant", "a")], 0.1),
    ]
    df = spark.createDataFrame(
        rows, f"doc_id long, turns {C.TURNS_SCHEMA}, neg_reward double")
    samples, report = C.sft_prepare(df, "turns", "doc_id",
                                    order_col="neg_reward")
    got = {r.doc_id: r for r in samples.collect()}
    assert set(got) == {2, 3}
    assert got[2].text == ("<|user|>\nq1\n"
                           "<|assistant|>\nbetter answer<|end|>\n")
    s, e = tuple(got[2].spans[0])
    assert got[2].text[s:e] == "better answer"
    assert got[3].n_turns == 3
    rep = {r.reason: r.n for r in report.collect()}
    assert rep == {"kept": 3, "no_final_assistant": 1,
                   "repeated_role": 1}


def test_validate_null_role_is_unknown(spark):
    """Review regression (r8): a NULL role must flag unknown_role, not
    slip through every three-valued-logic check as valid."""
    got = _one(spark, C.validate_chat(F.col("turns")),
               [("user", "hi"), (None, "injected"), ("assistant", "ok")])
    assert got == "unknown_role"
    # NULL role in the LAST slot must not pass no_final_assistant
    got = _one(spark, C.validate_chat(F.col("turns")),
               [("user", "hi"), (None, "x")])
    assert got == "unknown_role"


def test_validate_custom_role_names(spark):
    """Review regression (r8): renamed-role templates validate when the
    role-function params are passed."""
    tpl = {"instruction": ("I:", "\n"), "response": ("R:", "\n")}
    turns = [("instruction", "do x"), ("response", "done")]
    got = _one(spark, C.validate_chat(
        F.col("turns"), tpl, start_roles=("instruction",),
        system_role="__none__", train_role="response"), turns)
    assert got is None
    spans = _one(spark, C.assistant_spans(F.col("turns"), tpl,
                                          train_role="response"), turns)
    rendered = _one(spark, C.render_chat(F.col("turns"), tpl), turns)
    s, e = tuple(spans[0])
    assert rendered[s:e] == "done"


def test_sft_pair_dedup_default_keeps_first_arrival(spark):
    """Review regression (r8): without order_col the keep is min-id
    (first arrival), matching url_dedup and the streaming index."""
    rows = [(7, "p"), (3, "p"), (5, "p"), (9, "q")]
    df = spark.createDataFrame(rows, "doc_id long, prompt string")
    kept = {r.doc_id for r in C.sft_pair_dedup(
        df, "prompt", "doc_id").collect()}
    assert kept == {3, 9}


def test_offset_spans_composes_with_whole_packing(spark):
    """offset_spans + pack_samples_whole: after concatenating the
    rendered samples of one pack in id order, every shifted span still
    slices exactly its assistant content."""
    from australia_company_etl_pipeline_spark.operators import (
        textstats as ts,
    )

    rows = [(i, [("user", f"q{i}"), ("assistant", f"answer {i}")])
            for i in range(12)]
    df = spark.createDataFrame(rows,
                               f"doc_id long, turns {C.TURNS_SCHEMA}")
    rendered = df.select(
        "doc_id", C.render_chat(F.col("turns")).alias("text"),
        C.assistant_spans(F.col("turns")).alias("spans"),
        F.length(C.render_chat(F.col("turns"))).alias("n_chars"))
    plan = ts.pack_samples_whole(rendered, "n_chars", "doc_id",
                                 budget=256)
    packed = (rendered.join(plan.select("doc_id", "pack_id",
                                        "pack_offset"), "doc_id")
              .withColumn("spans_shifted",
                          C.offset_spans(F.col("spans"),
                                         F.col("pack_offset"))))
    rowsby = {}
    for r in packed.collect():
        rowsby.setdefault(r.pack_id, []).append(r)
    for pid, members in rowsby.items():
        members.sort(key=lambda m: m.doc_id)
        seq = "".join(m.text for m in members)
        for m in members:
            for s, e in [tuple(x) for x in m.spans_shifted]:
                assert seq[s:e] == f"answer {m.doc_id}", (pid, m.doc_id)


# ------------------------------------------------------- preference pairs

def _resp(spark, rows):
    return spark.createDataFrame(
        rows, "prompt string, response string, score double, rid long")


def _pairs(spark, rows, **kw):
    df = _resp(spark, rows)
    return C.preference_pairs(df, "prompt", "response", "score",
                                 "rid", **kw).collect()


def test_preference_pairs_hand_golden(spark):
    got = _pairs(spark, [("a", "r1", 0.9, 1), ("a", "r2", 0.1, 2),
                         ("a", "r3", 0.5, 3)])
    assert len(got) == 1
    p = got[0]
    assert (p.chosen_id, p.rejected_id) == (1, 2)
    assert (p.chosen, p.rejected) == ("r1", "r2")
    assert p.margin == pytest.approx(0.8)
    assert p.n_candidates == 3


def test_preference_pairs_tie_breaks_are_deterministic(spark):
    # full score tie: chosen = larger id, rejected = smaller id —
    # chosen != rejected whenever >= 2 candidates exist
    got = _pairs(spark, [("a", "x", 0.5, 1), ("a", "y", 0.5, 2),
                         ("a", "z", 0.5, 3)])
    assert (got[0].chosen_id, got[0].rejected_id) == (3, 1)
    assert got[0].margin == 0.0


def test_preference_pairs_min_margin_gate(spark):
    rows = [("lo", "a", 0.50, 1), ("lo", "b", 0.48, 2),
            ("hi", "c", 0.90, 3), ("hi", "d", 0.10, 4)]
    got = _pairs(spark, rows, min_margin=0.05)
    assert [p.prompt for p in got] == ["hi"]


def test_preference_pairs_drops_singletons_and_empty_prompts(spark):
    rows = [("solo", "a", 0.9, 1),
            ("", "b", 0.9, 2), ("", "c", 0.1, 3),
            (None, "d", 0.9, 4), (None, "e", 0.1, 5)]
    assert _pairs(spark, rows) == []


def test_preference_pairs_null_score_rejected_never_chosen(spark):
    # a failed generation loses to any scored response and passes the
    # margin gate as maximal contrast (NULL margin)
    got = _pairs(spark, [("a", "ok", 0.2, 1), ("a", "fail", None, 2)],
                 min_margin=0.5)
    assert (got[0].chosen_id, got[0].rejected_id) == (1, 2)
    assert got[0].rejected_score is None and got[0].margin is None
    # all-NULL prompt emits nothing
    assert _pairs(spark, [("b", "x", None, 1), ("b", "y", None, 2)]) == []


def test_preference_pairs_plan_has_no_window(spark):
    df = _resp(spark, [("a", "x", 0.5, 1), ("a", "y", 0.4, 2)])
    plan = C.preference_pairs(
        df, "prompt", "response", "score", "rid") \
        ._sc._jvm.PythonSQLUtils.explainString(
            C.preference_pairs(df, "prompt", "response", "score",
                                  "rid")._jdf.queryExecution(), "extended")
    assert "Window" not in plan
