"""Entity resolution: blocked edit-distance (fuzzy) similarity join.

Record linkage — "which rows in A refer to the same real-world entity
as rows in B, up to typos" — is the classic data-cleaning join.  The
naive form is a cross join with ``levenshtein(a, b) <= d`` in the
predicate: a CartesianProduct that is banned from every plan in this
repo (tests/test_plan_guards.py) because it is O(|A|·|B|) string
comparisons at 100 TB.

The scale shape here is **deletion-neighborhood blocking** (the
SymSpell trick, itself the FastSS scheme of Bocek et al. 2007): for
edit distance <= 1, two strings match only if they share a member of
their *single-deletion neighborhoods*

    D(s) = {s} ∪ { s with one character removed }

— a substitution at position i leaves both deletion-at-i variants
equal, an insertion/deletion makes one string a member of the other's
neighborhood, and equality shares s itself.  So the join becomes:

1. explode each side into its |s|+1 deletion variants (a pure
   whole-stage-codegen ``transform``/``sequence`` expression — no
   Python, no UDF);
2. one hash equi-join on the variant string (the only shuffle;
   candidate volume is O(n · L), not O(n²));
3. ``distinct`` the candidate id pairs (a shared-variant pair appears
   once per shared variant otherwise);
4. verify with ``levenshtein`` on the *candidate pairs only* — the
   neighborhood test is necessary but not sufficient ("ab" and "ba"
   share variants at distance 2), so the exact check runs on the
   blocked candidates, never the cross product.

This is the same candidates-then-verify discipline as the MinHash-LSH
and n-gram-Jaccard dedup paths (operators/dedup.py): recall is exact
(every true <=1 pair shares a variant by construction) and the verify
step restores precision.

At 100 TB the lever is variant-key occupancy: a degenerate key (e.g.
the empty string from exploding one-character values) draws a
quadratic bucket.  ``max_variant_freq`` drops variant keys shared by
more than N rows *of the build side* — the documented recall trade
(identical to ``max_doc_freq`` in dedup.ngram_jaccard_pairs), off by
default so the default result is exact.

No analog exists in the reference (its validator joins are exact-key
only — reference validator.py:64-131); this extends SURVEY §2.4's
join family the same way the as-of and range joins do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "edit_distance_join"]


def deletion_variants(col: str) -> F.Column:
    """Array of the |s|+1 single-deletion neighborhood members of
    string column ``col`` (the string itself at index |s|), duplicates
    removed (a run of k equal characters yields one variant, not k).

    Pure codegen: ``transform(sequence(0, len), i -> prefix + suffix)``.
    """
    return F.expr(
        f"array_distinct(transform(sequence(0, length({col})), "
        f"i -> concat(substr({col}, 1, i), substr({col}, i + 2))))"
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    text_col: str,
    *,
    max_dist: int = 1,
    max_variant_freq: int | None = None,
) -> DataFrame:
    """Fuzzy join: one row per (left_id, right_id) pair holding texts
    with ``levenshtein <= max_dist``, excluding pairs whose ids are
    equal (self matches).  With non-unique ids (several texts per
    id), ``dist`` is the minimum over the qualifying text pairs.

    Only ``max_dist=1`` is supported: the single-deletion neighborhood
    is complete exactly for distance <= 1.  Distance d would need the
    depth-d deletion neighborhood (|s| choose d variants per row) —
    raise rather than silently under-recall.

    ``max_variant_freq``: if set, variant keys held by more than this
    many *right*-side rows are dropped from both sides before the
    join — the occupancy cap for adversarial key distributions, at the
    documented cost of recall on exactly those crowded keys.
    """
    if max_dist != 1:
        raise ValueError(
            f"edit_distance_join supports max_dist=1 only (got {max_dist}); "
            "deeper neighborhoods need depth-d deletion sets"
        )

    lv = (
        left.select(
            F.col(left_id).alias("left_id"), F.col(text_col).alias("_lt")
        )
        .withColumn("_v", F.explode(deletion_variants("_lt")))
    )
    rv = (
        right.select(
            F.col(right_id).alias("right_id"), F.col(text_col).alias("_rt")
        )
        .withColumn("_v", F.explode(deletion_variants("_rt")))
    )
    if max_variant_freq is not None:
        crowded = (
            rv.groupBy("_v")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_variant_freq)
            .select("_v")
        )
        lv = lv.join(crowded, "_v", "left_anti")
        rv = rv.join(crowded, "_v", "left_anti")

    cand = (
        lv.join(rv, "_v")
        .filter(F.col("left_id") != F.col("right_id"))
        .select("left_id", "_lt", "right_id", "_rt")
        .distinct()
    )
    # one row per id pair even when ids are non-unique (several texts
    # per id): dist = the closest qualifying text pair.  For unique
    # ids this grouped min is the identity on the distinct candidates.
    return (
        cand.withColumn("dist", F.levenshtein("_lt", "_rt").cast("bigint"))
        .filter(F.col("dist") <= max_dist)
        .groupBy("left_id", "right_id")
        .agg(F.min("dist").alias("dist"))
    )
