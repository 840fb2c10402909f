"""Sequence packing: assign documents to fixed-token-budget bins.

LLM pre-training concatenates documents into fixed-length context
windows; the distributed version of "concat the corpus, then chunk
every ``budget`` tokens" is a running token total per stream and
``bin = floor(preceding_total / budget)`` — each document lands in the
bin where its first token would fall.

Shape: one window over (stream, stable order).  Streams (e.g. ``lang``)
partition the window, so at 100 TB the shuffle is by stream key and
each stream's running sum is a single ordered pass — the same plan as
any cumulative metric.  No Python, no state, deterministic under
re-execution (ordering key is the stable doc id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int,
    stream_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, stream, n_tokens, bin_id): token-budget bin per document.

    ``bin_id`` = floor(tokens-before-this-doc / budget) within the
    stream, ordered by ``id_col``.  A document longer than ``budget``
    still gets the bin of its first token (downstream chunking splits
    it), matching the concat-then-chunk semantics exactly.
    """
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(stream_col),
            token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            id_col,
            stream_col,
            "n_tokens",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget)
            .cast("bigint")
            .alias("bin_id"),
        )
    )
