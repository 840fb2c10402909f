"""Content-defined chunking: model parity and the edit-robustness
property that is the operator's reason to exist."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_cpc_schema_spark.functions import text as TX


def _model(text: str, divisor: int = 16) -> list[tuple[int, int]]:
    """Pure-python twin of functions.text.cdc_chunks."""
    t = [x for x in text.strip().split() if x]
    closes = [
        i
        for i, tok in enumerate(t)
        if int(hashlib.md5(f"cdc:{tok}".encode()).hexdigest()[:15], 16) % divisor
        == 0
    ]
    ends = [i + 1 for i in closes]
    if t and (not closes or closes[-1] != len(t) - 1):
        ends.append(len(t))
    starts = [0] + ends[:-1]
    return [(s, e) for s, e in zip(starts, ends) if e > s]


CASES = [
    "",
    "   ",
    "single",
    "two tokens",
    "the quick brown fox jumps over the lazy dog " * 8,
    " ".join(f"tok{i}" for i in range(100)),
    " ".join(f"tok{i}" for i in range(30, 0, -1)),  # boundary position shift
    "\ttab\nand newline separated tokens here\r\nok",
]


@pytest.mark.parametrize("text", CASES, ids=range(len(CASES)))
def test_cdc_chunks_matches_python_model(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(TX.cdc_chunks(TX.tokens(F.col("text"))).alias("ch")).first()[
        "ch"
    ]
    assert [(c["start"], c["end"]) for c in got] == _model(text)


def test_cdc_chunks_cover_and_partition(spark):
    """Chunks tile the token array exactly: contiguous, non-empty,
    starting at 0 and ending at len(tokens)."""
    text = " ".join(f"w{i % 37}" for i in range(500))
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        F.size(TX.tokens(F.col("text"))).alias("n"),
        TX.cdc_chunks(TX.tokens(F.col("text"))).alias("ch"),
    ).first()
    ch = [(c["start"], c["end"]) for c in row["ch"]]
    assert ch[0][0] == 0 and ch[-1][1] == row["n"]
    for (s1, e1), (s2, e2) in zip(ch, ch[1:]):
        assert e1 == s2 and e1 > s1
    assert ch[-1][1] > ch[-1][0]


def test_cdc_chunks_survive_insertion(spark):
    """The edit-robustness property: inserting a sentence in the middle
    of a document must leave the chunk hashes outside the edit region
    unchanged (fixed-window chunking shifts EVERY downstream window).
    """
    base_toks = [f"alpha{i % 53}x{i % 11}" for i in range(400)]
    edited_toks = base_toks[:200] + ["entirely", "new", "sentence"] + base_toks[200:]
    df = spark.createDataFrame(
        [(1, " ".join(base_toks)), (2, " ".join(edited_toks))],
        "doc_id bigint, text string",
    )
    t = df.select("doc_id", TX.tokens(F.col("text")).alias("t"))
    c = t.select(
        "doc_id", "t", F.posexplode(TX.cdc_chunks(F.col("t"))).alias("i", "c")
    )
    hashes = c.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("t"),
                    F.col("c.start") + 1,
                    F.col("c.end") - F.col("c.start"),
                ),
            )
        ).alias("h"),
    ).collect()
    by_doc: dict[int, set[str]] = {}
    for r in hashes:
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    shared = by_doc[1] & by_doc[2]
    # all but the chunk(s) containing the edit point must survive
    assert len(shared) >= len(by_doc[1]) - 2, (
        f"only {len(shared)} of {len(by_doc[1])} chunks survived an insertion"
    )
    assert by_doc[1] != by_doc[2]  # the edit itself is visible
