"""Prefix-filter set-similarity join: brute-force agreement + edges."""

from __future__ import annotations

import itertools
import random
import re

from datalake2anomali_spark.operators.setsim import jaccard_self_join, token_sets


def _jac(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def _brute(texts, t, shingle=1):
    def toks(s):
        ws = [w for w in re.split(r"\s+", s) if w]
        if shingle == 1:
            return set(ws)
        return {
            " ".join(ws[i : i + shingle]) for i in range(len(ws) - shingle + 1)
        }
    sets = {i: toks(s) for i, s in enumerate(texts)}
    return {
        (i, j)
        for i, j in itertools.combinations(sets, 2)
        if sets[i] and sets[j] and _jac(sets[i], sets[j]) >= t
    }


def _run(spark, texts, t, shingle=1):
    df = spark.createDataFrame(list(enumerate(texts)), "id long, body string")
    return {
        (r.id_a, r.id_b)
        for r in jaccard_self_join(df, "id", "body", t, shingle).collect()
    }


def test_matches_brute_force_random_word_salad(spark):
    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for _ in range(50)
    ]
    for t in (0.5, 0.8):
        assert _run(spark, texts, t) == _brute(texts, t), t


def test_matches_brute_force_bigram_shingles(spark):
    rng = random.Random(17)
    vocab = ["a", "b", "c", "d", "e"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15)))
        for _ in range(40)
    ]
    assert _run(spark, texts, 0.5, shingle=2) == _brute(texts, 0.5, shingle=2)


def test_identical_and_disjoint_sets(spark):
    texts = ["x y z", "z y x", "p q r", ""]
    got = _run(spark, texts, 0.99)
    assert got == {(0, 1)}  # same set, any order/duplication; empty excluded


def test_high_threshold_prefix_still_complete(spark):
    # threshold 0.9 with 10-token sets: prefix length 1 — the single
    # rarest token must still connect every qualifying pair
    base = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    texts = [base, base + " t11", "t99 t98"]
    got = _run(spark, texts, 0.9)
    assert got == {(0, 1)}  # J = 10/11 ≈ 0.909


def test_token_sets_shingle_shorter_than_width(spark):
    df = spark.createDataFrame([(1, "only")], "id long, body string")
    assert token_sets(df, "id", "body", shingle=2).count() == 0


def test_no_cross_join_in_plan(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "id long, body string"
    )
    plan = (
        jaccard_self_join(df, "id", "body", 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
