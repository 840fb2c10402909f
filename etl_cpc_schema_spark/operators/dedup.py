"""Deduplication operators for large-scale training-data pipelines.

Five families, each designed around Spark's shuffle model:

* **exact** — hash-groupBy on a normalized fingerprint (one shuffle,
  map-side partial agg).
* **n-gram Jaccard** — shingle → explode → self-equi-join on shingle →
  integer Jaccard filter.  The scale lever is ``max_doc_freq``:
  dropping shingles that occur in many documents (stopword shingles)
  bounds the join's per-key fan-out, which is what explodes at 100 TB.
* **MinHash + LSH** — fixed-size signature per doc (bounded state, no
  pairwise work), banded into buckets; only in-bucket pairs are
  compared.  Candidate generation cost is O(docs × bands), not O(docs²).
* **SimHash** — constant-size fingerprint per doc; near-dup = small
  Hamming distance, found by pivoting on fingerprint bands.
* **embedding cosine** — quantized-integer cosine (deterministic, see
  functions.vectors); brute-force for small sides, LSH-bucketed via
  operators.similarity for scale.

All expression work is JVM-side (higher-order functions); no Python
UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as TX
from ..functions import vectors as VE


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by normalized fingerprint; keep the lowest id per group.

    Returns (keep_id, n_copies, text_hash).  One shuffle on the
    fingerprint; partial aggregation runs map-side.
    """
    return (
        docs.select(
            F.col(id_col), TX.fingerprint(F.col(text_col)).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_id", "n_copies", "text_hash")
    )


def shingle_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, shingles array, n_shingles) with empty docs dropped."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            TX.word_shingles(F.col(text_col), n).alias("shingles"),
        )
        .withColumn("n_sh", F.size("shingles"))
        .filter(F.col("n_sh") > 0)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Candidate pairs with exact shingle-set overlap counts.

    Returns (d1, d2, shared, n1, n2); Jaccard = shared/(n1+n2-shared)
    can then be thresholded with *integer* arithmetic (deterministic).

    ``max_doc_freq`` drops shingles appearing in more than that many
    documents before the self-join — at web scale a handful of
    boilerplate shingles would otherwise dominate the join fan-out.
    """
    sh = shingle_table(docs, id_col, text_col, n)
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("s"))
    if max_doc_freq is not None:
        freq = ex.groupBy("s").agg(F.count("*").alias("df"))
        ex = (
            ex.join(freq.filter(F.col("df") <= max_doc_freq).select("s"), "s")
        )
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(
            F.count("*").alias("shared"),
            F.max("a.n_sh").alias("n1"),
            F.max("b.n_sh").alias("n2"),
        )
    )


def jaccard_at_least(shared: Column, n1: Column, n2: Column, num: int, den: int) -> Column:
    """Integer-exact predicate: shared/(n1+n2-shared) >= num/den."""
    return shared * den >= num * (n1 + n2 - shared)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs via MinHash signatures + LSH banding.

    Returns distinct (d1, d2) that collide on at least one band.  Per
    doc the state is ``num_hashes`` longs; the only shuffle is the
    band-key self-join whose keys are already well-distributed hashes.
    """
    rows_per_band = num_hashes // bands
    sh = shingle_table(docs, id_col, text_col, n)
    sig = sh.select(
        "doc_id", H.minhash_signature(F.col("shingles"), num_hashes).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.explode(H.band_keys(F.col("sig"), bands, rows_per_band)).alias("bk"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .distinct()
    )


def simhash_table(
    docs: DataFrame, bits: int = 16, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash) fingerprint table."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        H.simhash(TX.tokens(F.col(text_col)), bits).alias("simhash"),
    )


def simhash_near_pairs(
    docs: DataFrame,
    bits: int = 16,
    max_hamming: int = 2,
    band_bits: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of each other.

    Scale path: pivot on ``bits/band_bits`` bands (a pair within the
    distance budget must agree exactly on at least one band when
    ``bands > max_hamming``), join per band, then verify with
    ``bit_count(xor)``.
    """
    t = simhash_table(docs, bits, id_col, text_col)
    bands = bits // band_bits
    banded = t.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(i)),
                        (F.shiftright(F.col("simhash"), i * band_bits) % (2**band_bits)),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_near_dup_pairs(
    embs: DataFrame,
    threshold_num: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with quantized-integer cosine ≥ threshold.

    Brute force (for dimension-sized inputs and for verifying LSH
    candidates); the quantized math makes the predicate deterministic
    across engines.  At scale, feed candidates from
    ``similarity.hyperplane_lsh_buckets`` instead of the cross join.
    """
    q = embs.select(
        F.col(id_col).alias("vid"),
        VE.quantize(F.col(vec_col)).alias("qv"),
    ).withColumn("nsq", VE.norm_sq_q(F.col("qv")))
    a, b = q.alias("a"), q.alias("b")
    dot = VE.dot_q(F.col("a.qv"), F.col("b.qv"))
    cos = VE.cosine_q(dot, F.col("a.nsq"), F.col("b.nsq"))
    return (
        a.join(F.broadcast(b), F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("v1"),
            F.col("b.vid").alias("v2"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold_num)
        .select("v1", "v2")
    )
