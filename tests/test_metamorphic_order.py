"""Metamorphic determinism: declared query results must be invariant
under INPUT ROW ORDER (shuffled + repartitioned copies of the same
tables) — on a cluster, scan order and partition assignment are
arbitrary, so any order sensitivity (an argmax tie broken by arrival,
a collect_list folded into a hash) is a silent wrong-answer class at
scale.  The drive-contract cpus/parts variants vary partition COUNT;
this suite varies the row placement itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cpc_schema_spark import queries as Q

#: order-sensitive-looking representatives from each heavy family:
#: window dedup, banded LSH + verify, iterative components, ANN with
#: stable-argsort tie-breaks, BPE training's greedy merges, span
#: scrub's rebuild, and a double aggregation.
QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_components",
    "ann_pq_topk",
    "text_bpe_train",
    "docs_scrub_dup_spans",
    "q65_custdist",
    # round-7: k-means seeding is orderBy+limit and the ranking window
    # has explicit tie-breaks — but the Lloyd accumulation is a
    # floating-free integer sum, so row order must not matter; the KMV
    # sketch's bottom-k and the composite's running-total packing are
    # the other new order-sensitive-looking shapes
    "docs_kmeans_prune",
    "docs_source_overlap",
    "docs_modern_corpus",
    "docs_ccnet_buckets",
    # bag-semantics multiplicities, kernel-masked hard negatives, and
    # overlapping-window replication are all order-sensitive-LOOKING
    "q80_bag_set_ops",
    "docs_hard_negatives",
    "q79_sliding_window",
    # variant-blocked candidate generation LOOKS row-order sensitive
    # (explode + self-join + distinct) but must not be
    "q81_fuzzy_join",
    # degree-oriented triangle enumeration depends on a (degree, id)
    # ranking — the orientation must come out identical under any
    # row order or partitioning
    "q82_triangle_counts",
    # iterative integer propagation: per-doc PageRank must converge
    # to the same micro-unit values under any partitioning
    "text_textrank",
    # synchronous LPA rounds + aggregate argmax tie-breaks must be
    # identical under any row order or partitioning
    "q83_label_propagation",
    # round-8: SimHash-style vote fingerprints + banded self-join
    # (order-sensitive-LOOKING: votes fold over chunk rows), the
    # per-bucket quantized JS sums, and the persisted-index probe
    # whose save/load roundtrip must not depend on write order
    "multimodal_dedup",
    "multimodal_dedup_clustered",
    "docs_corpus_drift",
    "docs_incremental_dedup",
]

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def shuffled_sf(spark, sf_dir, tmp_path_factory):
    """A copy of the sf dir with every table's rows randomly permuted
    (seeded) and spread over a different partition count."""
    out = str(tmp_path_factory.mktemp("shuffled_sf"))
    for t in _TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        (
            df.orderBy(F.xxhash64(F.concat_ws("\x00", *df.columns)))
            .repartition(7)
            .write.mode("overwrite")
            .parquet(f"{out}/{t}.parquet")
        )
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_input_order(spark, sf_dir, shuffled_sf, name):
    base = Q.SPARK_QUERIES[name](spark, sf_dir).collect()
    perm = Q.SPARK_QUERIES[name](spark, shuffled_sf).collect()
    assert base == perm, f"{name}: result depends on input row order"
