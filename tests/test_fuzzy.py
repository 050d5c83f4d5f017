"""Completeness + edge tests for operators/fuzzy.py (deletion blocking)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.operators import fuzzy


def _pairs(spark, names):
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    return {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy.fuzzy_self_join(df, "id", "name").collect()
    }


def test_substitution_insertion_deletion_all_found(spark):
    names = ["spark", "spork", "sparks", "park", "walk"]
    out = _pairs(spark, names)
    assert out[(0, 1)] == 1  # substitution
    assert out[(0, 2)] == 1  # insertion
    assert out[(0, 3)] == 1  # deletion
    assert (0, 4) not in out and (1, 4) not in out  # distance > 1
    # transitive NON-pairs must not appear: spork↔sparks is distance 2
    assert (1, 2) not in out


def test_exhaustive_agreement_on_random_short_strings(spark):
    # blocked join must equal brute force on every pair (completeness)
    import random

    rng = random.Random(7)
    names = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 4)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = set(_pairs(spark, names))
    brute = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _lev(a, b) <= 1
    }
    assert got == brute


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_identical_strings_pair_with_distance_zero(spark):
    out = _pairs(spark, ["same", "same"])
    assert out == {(0, 1): 0}


def test_repeated_char_variants_do_not_duplicate_pairs(spark):
    # "aaa" yields the variant "aa" three times; dedup must keep one pair
    out = _pairs(spark, ["aaa", "aa"])
    assert out == {(0, 1): 1}


def test_max_distance_guard(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy.fuzzy_self_join(df, "id", "name", max_distance=3)


def test_no_cross_join_in_plan(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, name string")
    plan = (
        fuzzy.fuzzy_self_join(df, "id", "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# -- distance-2 path (q-gram count filtering) --------------------------------


def _pairs2(spark, names):
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    return {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy.fuzzy_self_join(df, "id", "name", max_distance=2).collect()
    }


def test_d2_finds_two_edit_pairs_and_excludes_three(spark):
    names = ["spark", "spork", "stork", "remarkable", "remarkably", "rewardable"]
    out = _pairs2(spark, names)
    assert out[(0, 1)] == 1
    assert out[(0, 2)] == 2  # two substitutions
    assert out[(1, 2)] == 1
    assert out[(3, 4)] == 1
    assert out[(3, 5)] == 2
    assert (2, 3) not in out  # unrelated


def test_d2_exhaustive_agreement_mixed_lengths(spark):
    """Blocked d=2 join equals brute force over strings spanning the
    short-block / q-gram-block boundary (lengths 1..9, zero-overlap pairs
    like 'ab' vs 'cd' included)."""
    import random

    rng = random.Random(13)
    names = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
        for _ in range(60)
    ]
    got = set(_pairs2(spark, names))
    brute = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _lev(a, b) <= 2
    }
    assert got == brute


def test_d2_exhaustive_agreement_long_strings(spark):
    """Realistic-entity shape: long strings with shared vocabulary; the
    segment blocking must not drop any true pair on low-entropy text."""
    import random

    rng = random.Random(99)
    words = ["alpha", "beta", "gamma", "delta", "omega"]
    names = []
    for _ in range(40):
        base = " ".join(rng.choice(words) for _ in range(3))
        names.append(base)
        if rng.random() < 0.5:  # planted near-duplicates
            i = rng.randrange(len(base))
            names.append(base[:i] + "x" + base[i + 1 :])
    got = set(_pairs2(spark, names))
    brute = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _lev(a, b) <= 2
    }
    assert got == brute


def test_d2_no_cross_join_in_plan(spark):
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcxyz")], "id long, name string"
    )
    plan = (
        fuzzy.fuzzy_self_join(df, "id", "name", max_distance=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
