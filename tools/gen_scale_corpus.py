"""Deterministic synthetic corpus generator for the scale-curve bench.

Produces documents.parquet + embeddings.parquet shaped like the driver
testdata (same schemas, similar length/word distributions, planted
exact-dup / near-dup documents and near-neighbor embedding pairs) at
1x / 10x / 100x the sf0.1 row counts, so tools/scale_bench.py can
measure how the dedup/ANN occupancy levers hold as the corpus grows.

Everything derives from a fixed numpy PCG64 seed — regenerating
yields byte-identical logical content (row order and values), so
curve points are comparable across rounds.

Usage: python tools/gen_scale_corpus.py [out_root]
Writes out_root/x{1,10,100}/{documents,embeddings}.parquet
(default out_root: /root/repo/scale_data — git-ignored).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: sf0.1 shape: 5000 docs (~50 words each), 2000 x 64-dim embeddings.
BASE_DOCS = 5000
BASE_VECS = 2000
DIMS = 64

VOCAB = (
    "the a and of to data spark query table row column join filter group "
    "sort window stream batch hash merge scan agg key value line part "
    "order customer fast slow big small wide narrow cache shuffle stage "
    "task plan codegen skew salt bucket probe build spill"
).split()

LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]  # en-heavy like testdata


def _docs(n_docs: int, rng: np.random.Generator) -> pa.Table:
    # Zipf-ish word weights: rank r gets weight 1/(r+1)
    w = 1.0 / (np.arange(len(VOCAB)) + 1.0)
    w /= w.sum()
    texts: list[str] = []
    lengths = rng.integers(40, 75, size=n_docs)
    for i in range(n_docs):
        words = rng.choice(len(VOCAB), size=lengths[i], p=w)
        texts.append(" ".join(VOCAB[j] for j in words))
    # plant exact duplicates (~0.2%) and near-duplicates (~1%): a near
    # dup copies an earlier doc and edits 2 words — above the 0.8
    # Jaccard verify threshold for ~50-word docs, so LSH must find it
    n_exact = max(2, n_docs // 500)
    n_near = max(4, n_docs // 100)
    dup_src = rng.integers(0, n_docs // 2, size=n_exact + n_near)
    for k in range(n_exact):
        texts[n_docs - 1 - k] = texts[dup_src[k]]
    for k in range(n_near):
        toks = texts[dup_src[n_exact + k]].split()
        for pos in rng.integers(0, len(toks), size=2):
            toks[pos] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        texts[n_docs - 1 - n_exact - k] = " ".join(toks)
    doc_id = np.arange(n_docs, dtype=np.int64)
    lang = [LANGS[int(x)] for x in rng.integers(0, len(LANGS), size=n_docs)]
    source = [f"src{int(x)}" for x in rng.integers(0, 20, size=n_docs)]
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": doc_id,
            "text": texts,
            "lang": lang,
            "source": source,
            "n_chars": n_chars,
        }
    )


def _embeddings(n_vecs: int, rng: np.random.Generator) -> pa.Table:
    # near-uniform directions at testdata-like magnitudes, with ~1%
    # planted near-neighbor pairs (small perturbations of earlier rows)
    mat = rng.normal(0.0, 0.12, size=(n_vecs, DIMS)).astype(np.float32)
    n_near = max(4, n_vecs // 100)
    src = rng.integers(0, n_vecs // 2, size=n_near)
    for k in range(n_near):
        noise = rng.normal(0.0, 0.01, size=DIMS).astype(np.float32)
        mat[n_vecs - 1 - k] = mat[src[k]] + noise
    return pa.table(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": pa.array(
                [row for row in mat], type=pa.list_(pa.float32())
            ),
            "label": rng.integers(0, 10, size=n_vecs).astype(np.int32),
        }
    )


def generate(out_root: str, factors=(1, 10, 100)) -> None:
    for f in factors:
        out = os.path.join(out_root, f"x{f}")
        os.makedirs(out, exist_ok=True)
        # independent, factor-tagged streams: regenerating one factor
        # never disturbs another
        rng_d = np.random.Generator(np.random.PCG64(1234 + f))
        rng_e = np.random.Generator(np.random.PCG64(5678 + f))
        pq.write_table(_docs(BASE_DOCS * f, rng_d), f"{out}/documents.parquet")
        pq.write_table(
            _embeddings(BASE_VECS * f, rng_e), f"{out}/embeddings.parquet"
        )
        print(f"wrote {out}: {BASE_DOCS * f} docs, {BASE_VECS * f} vecs")


if __name__ == "__main__":
    generate(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data")
