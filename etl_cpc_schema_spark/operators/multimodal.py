"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; the
compute pattern is Arrow-batched ``mapInPandas`` so decoders see whole
byte buffers, never row-at-a-time Python.  The actual codecs
(Pillow/ffmpeg/librosa) are NOT in this container, so the decode step
is STUBBED: ``decode_image_real`` raises ``NotImplementedError`` and
the pipeline uses ``fake_decode_meta`` — a deterministic stand-in that
derives pseudo width/height from the payload's md5, keeping every
Spark-side contract (schema, batching, partitioning) real and testable.

At 100 TB the shape matters more than the codec: binary payloads ride
in their own column (parquet keeps them out of unrelated scans via
column pruning), metadata is a narrow struct, and the decode stage is
a map-only pass with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id bigint, byte_len bigint, fake_width bigint, fake_height bigint"


def attach_fake_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media ingestion: utf-8 bytes of the text as the payload.

    Real pipelines land payloads via ``binaryFile`` scans; the column
    shape (binary + id) is identical.
    """
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image_real(payload: bytes):  # pragma: no cover - stub
    """STUB — real image decode requires Pillow/libjpeg, absent here."""
    raise NotImplementedError(
        "image decoding libraries are not available in this environment; "
        "use fake_decode_meta for the deterministic stand-in"
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic pseudo-dimensions from the payload's md5.

    Matches the SQL formulation used by the correctness oracle:
    h = int(md5[:15], 16); width = h % 64 + 1; height = (h >> 6) % 64 + 1.
    """
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return h % 64 + 1, (h >> 6) % 64 + 1


def extract_meta(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, byte_len, fake_width, fake_height) via mapInPandas.

    Arrow delivers whole binary buffers per batch; the loop below is
    where a real decoder (resize / frame-sample / feature-extract)
    would run over each buffer.
    """

    # NB: the closure must be fully self-contained (stdlib imports
    # inside, no references to module-level helpers).  Spark pickles
    # module-level functions BY REFERENCE, and executors don't share
    # the driver's sys.path mutations — a closure that points back
    # into this package would fail to unpickle on workers whenever
    # the repo isn't on the executors' PYTHONPATH.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            widths: list[int] = []
            heights: list[int] = []
            lens: list[int] = []
            for payload in pdf["payload"]:
                buf = bytes(payload)
                h = int(_hashlib.md5(buf).hexdigest()[:15], 16)
                lens.append(len(buf))
                widths.append(h % 64 + 1)
                heights.append((h >> 6) % 64 + 1)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "byte_len": lens,
                    "fake_width": widths,
                    "fake_height": heights,
                }
            )

    return with_payload.select(id_col, "payload").mapInPandas(run, META_SCHEMA)
