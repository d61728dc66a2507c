"""Bigram-LM perplexity filter (operators/lm.py): hand-derived weights,
twin equality, backoff/OOV/short-doc semantics."""

import math

import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark.operators import lm as LM


def _micro(x: float) -> int:
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x * 1e6)).quantize(Decimal("1"), ROUND_HALF_UP))


def test_train_weights_hand_derived(spark):
    """3-doc reference corpus, weights checked against hand-computed
    add-one bigram log-probs (V=5, prefix counts as bigram prefixes)."""
    ref = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("a cat sat",)], "text string"
    )
    bw, pw = LM.train_bigram_lm(ref)
    w = {(r.w1, r.w2): r.w_micro for r in bw.collect()}
    b = {r.w1: r.backoff_micro for r in pw.collect()}
    # V = 5 (the, cat, sat, ran, a); prefix counts: the=2, cat=3, a=1
    assert w[("the", "cat")] == _micro(math.log((2 + 1) / (2 + 5 + 1)))
    assert w[("cat", "sat")] == _micro(math.log((2 + 1) / (3 + 5 + 1)))
    assert w[("cat", "ran")] == _micro(math.log((1 + 1) / (3 + 5 + 1)))
    assert w[("a", "cat")] == _micro(math.log((1 + 1) / (1 + 5 + 1)))
    assert b["the"] == _micro(math.log(1 / (2 + 5 + 1)))
    assert b["cat"] == _micro(math.log(1 / (3 + 5 + 1)))
    assert set(w) == {("the", "cat"), ("cat", "sat"), ("cat", "ran"), ("a", "cat")}


def test_score_backoff_oov_and_short_docs(spark):
    ref = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("a cat sat",)], "text string"
    )
    bw, pw = LM.train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [(0, "the cat sat"),        # all observed
         (1, "the cat slept"),      # (cat, slept) unseen -> backoff(cat)
         (2, "zebra quux things"),  # OOV prefixes -> floor penalty
         (3, "single"),             # <2 tokens -> vacuous keep
         (4, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in LM.lm_score(docs, bw, pw).collect()}
    w_tc = _micro(math.log(3 / 8))
    w_cs = _micro(math.log(3 / 9))
    assert out[0].lp_micro == w_tc + w_cs and out[0].n_bigrams == 2
    assert out[1].lp_micro == w_tc + _micro(math.log(1 / 9))
    assert out[2].lp_micro == 2 * LM.MISS_PENALTY_MICRO
    assert out[2].keep is False  # OOV junk fails the default threshold
    for i in (3, 4):
        assert out[i].n_bigrams == 0 and out[i].lp_micro == 0
        assert out[i].avg_logprob == 0.0 and out[i].keep is True
    assert out[0].avg_logprob == pytest.approx(
        (w_tc + w_cs) / 2 / 1e6, abs=1e-6
    )


def test_lm_twin_property(spark):
    """The Arrow scale path equals the SQL-expressible form row-for-row
    on a corpus mixing observed / backoff / OOV / short documents."""
    ref = spark.createDataFrame(
        [(f"w{i} w{(i * 3) % 11} common tail phrase",) for i in range(24)],
        "text string",
    )
    bw, pw = LM.train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [(i, f"w{i % 13} common tail phrase w{(i * 5) % 17} novel{i % 4}")
         for i in range(80)] + [
            (80, "x"),
            (81, ""),
            # Unicode whitespace (NBSP / line-sep / ideographic space) must
            # NOT split tokens: Java-regex \s is ASCII-only, and the Arrow
            # twin must match it exactly (ADVICE r7 — str.split() diverged).
            (82, "common tail phrase common tail common　tail"),
        ],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, LM.lm_score(docs, bw, pw).collect()))
    b = sorted(map(tuple, LM.lm_score_udf(docs, bw, pw).collect()))
    assert a == b


def test_lm_scale_path_plan(spark):
    """The UDF twin is ONE Arrow stage — no explode, no shuffle."""
    ref = spark.createDataFrame([("a b c a b",)], "text string")
    bw, pw = LM.train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [(i, "a b c a b") for i in range(32)], "doc_id long, text string"
    )
    out = LM.lm_score_udf(docs, bw, pw)
    assert out.filter(F.col("keep")).count() == 32
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1 and "Exchange" not in plan, plan
