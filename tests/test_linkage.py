"""Blocked edit-distance join (operators/linkage.py) edge semantics.

The deletion-neighborhood claim is exactness for distance <= 1: every
true pair must survive blocking (recall), and the verify step must
kill every shared-variant false positive (precision).  Pinned here on
hand-built rows where the naive answer is computable by eye, plus a
brute-force equivalence sweep on generated strings.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from etl_cpc_schema_spark.operators.linkage import (
    deletion_variants,
    edit_distance_join,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, name string")


def _pairs(spark, left_rows, right_rows, **kw):
    out = edit_distance_join(
        _df(spark, left_rows), _df(spark, right_rows), "id", "id", "name", **kw
    )
    return {(r.left_id, r.right_id, r.dist) for r in out.collect()}


def test_substitution_insertion_deletion_and_exact(spark):
    rows = [
        (1, "karen"),
        (2, "caren"),   # substitution, dist 1
        (3, "karren"),  # insertion, dist 1
        (4, "karn"),    # deletion, dist 1
        (5, "karen"),   # identical text, different id — dist 0
        (6, "corwin"),  # unrelated
    ]
    got = _pairs(spark, rows, rows)
    want_from_1 = {(1, 2, 1), (1, 3, 1), (1, 4, 1), (1, 5, 0)}
    assert {p for p in got if p[0] == 1} == want_from_1
    # symmetric: both orderings emitted when both sides carry the row
    assert (2, 1, 1) in got and (5, 1, 0) in got
    # self pairs (same id) never appear
    assert not [p for p in got if p[0] == p[1]]


def test_shared_variant_distance2_rejected(spark):
    # "ab" and "ba" share deletion variants {"a","b"} but sit at
    # distance 2 — blocking recalls them, verify must reject.
    got = _pairs(spark, [(1, "ab")], [(2, "ba")])
    assert got == set()


def test_brute_force_equivalence_alphabet_soup(spark):
    # every string of length <= 3 over {a, b}: blocking+verify must
    # equal the naive all-pairs levenshtein filter exactly.
    strings = [""] + [
        "".join(t)
        for n in (1, 2, 3)
        for t in itertools.product("ab", repeat=n)
    ]
    rows = list(enumerate(strings))
    got = _pairs(spark, rows, rows)
    df = _df(spark, rows)
    naive = (
        df.alias("a")
        .crossJoin(df.alias("b"))
        .filter(F.col("a.id") != F.col("b.id"))
        .withColumn(
            "dist", F.levenshtein(F.col("a.name"), F.col("b.name")).cast("bigint")
        )
        .filter(F.col("dist") <= 1)
        .select(
            F.col("a.id").alias("l"), F.col("b.id").alias("r"), "dist"
        )
    )
    want = {(r.l, r.r, r.dist) for r in naive.collect()}
    assert got == want


def test_max_variant_freq_drops_crowded_keys_only(spark):
    # ten right rows all one deletion from "xx" crowd its variant "x";
    # a cap below 10 removes those matches but keeps an uncrowded pair.
    right = [(i, "x" * 2) for i in range(10)] + [(100, "lonely")]
    left = [(50, "x"), (51, "lonelyy")]
    capped = _pairs(spark, left, right, max_variant_freq=3)
    assert capped == {(51, 100, 1)}
    uncapped = _pairs(spark, left, right)
    assert {(50, i, 1) for i in range(10)} <= uncapped


def test_non_unique_ids_emit_one_row_with_min_dist(spark):
    # an id carrying several texts must not produce contradictory
    # duplicate (left_id, right_id) rows — dist is the closest pair
    left = [(7, "karen"), (7, "caren")]
    right = [(9, "karen")]
    assert _pairs(spark, left, right) == {(7, 9, 0)}


def test_max_dist_validated(spark):
    with pytest.raises(ValueError, match="max_dist=1"):
        edit_distance_join(
            _df(spark, [(1, "a")]), _df(spark, [(2, "b")]),
            "id", "id", "name", max_dist=2,
        )


def test_hypothesis_brute_force_parity_random_strings(spark):
    # random short strings over a 3-letter-plus-unicode alphabet,
    # compared against a pure-Python O(n²) Levenshtein reference —
    # one batched Spark run over many generated corpora (per-example
    # Spark jobs would be prohibitively slow under hypothesis).
    from hypothesis import given, settings, strategies as st

    alphabet = "abĉ"
    word = st.text(alphabet=alphabet, min_size=0, max_size=4)

    def _lev(x: str, y: str) -> int:
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (cx != cy),
                    )
                )
            prev = cur
        return prev[-1]

    corpora: list[list[str]] = []

    @settings(max_examples=25, deadline=None)
    @given(st.lists(word, min_size=2, max_size=8))
    def _collect(words):
        corpora.append(words)

    _collect()
    # ONE Spark run over every corpus: rows get a doubled-character
    # corpus tag prefix (tag chars never appear in the word alphabet;
    # producing another tag's two chars needs two edits), so
    # cross-corpus distances are always >= 2 and within-corpus
    # distances are unchanged by the shared prefix — corpora cannot
    # contaminate each other's pairs.
    assert len(corpora) <= 40
    rows, want = [], set()
    for ci, words in enumerate(corpora):
        tag = chr(48 + ci) * 2
        ids = [(1000 * ci + j, w) for j, w in enumerate(words)]
        rows.extend((i, tag + w) for i, w in ids)
        want |= {
            (i, j, _lev(a, b))
            for i, a in ids
            for j, b in ids
            if i != j and _lev(a, b) <= 1
        }
    assert _pairs(spark, rows, rows) == want


def test_deletion_variants_expression(spark):
    row = spark.range(1).select(
        deletion_variants("'aab'").alias("v")
    ).first()
    # dedup inside one row: deleting either leading 'a' is the same
    # string, identity member included
    assert sorted(row.v) == ["aa", "aab", "ab"]
