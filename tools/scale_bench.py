"""Scale-curve bench: measure the dedup/ANN occupancy levers empirically.

Runs the four bucketed candidate-generation operators the 100 TB
argument leans on (dedup_lsh_jaccard, dedup_components,
ann_lsh_topk_probed, ann_ivf_topk) over the deterministic synthetic
corpora from tools/gen_scale_corpus.py at 1x / 10x / 100x the sf0.1
row counts, and asserts SUB-QUADRATIC wall-time growth: a bucketed
plan whose candidate volume is occupancy-bounded should scale
near-linearly with corpus size; an accidental all-pairs plan scales
with its square and fails the gate loudly.

Gate: t(100x)/t(1x) < 0.3 * 100^2 per operator (generous CPU-noise
headroom below the quadratic ratio 10,000; observed ratios are
10-60).  Writes SCALE_BENCH.json at the repo root.

Usage: python tools/scale_bench.py  (expects scale_data/ generated;
regenerates it if absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OPERATORS = [
    "dedup_lsh_jaccard",
    "dedup_components",
    "ann_lsh_topk_probed",
    "ann_ivf_topk",
    # round-5 widening: exact-dedup shuffle, two-phase cumulative-sum
    # packing, vocab-bounded BPE training, and arrival-vs-corpus
    # incremental dedup — each a distinct shuffle shape
    "dedup_exact",
    "docs_pack_sequences",
    "text_bpe_train",
    "docs_incremental_dedup",
    # late round-5: span-level duplication (Arrow span pass + hashed
    # gram joins) — the duplicated-span tail grows with corpus size,
    # so this is the operator most exposed to an accidental
    # all-spans-broadcast or string-shuffle regression
    "docs_dup_spans",
    # round-6 widening (VERDICT r5 #6): the END-TO-END corpus
    # materialization — quality gate → exact dedup → LSH cluster
    # dedup → decontamination → split as ONE composed plan, so the
    # flagship pipeline (not just its stages) has a measured curve
    "docs_corpus_build",
    # the ANN occupancy lever DEMONSTRATED: fixed-parameter LSH is
    # inherently quadratic (occupancy = n / 2^planes grows linearly),
    # so the registry ann_knn_join is deliberately NOT on this curve;
    # this scheduled variant raises planes with corpus size
    # (occupancy ~16 held constant, probe fan-out capped at 6 bits)
    # — candidate volume O(n · tables · probes · occupancy) = O(n)
    "ann_knn_join_scaled",
    # round-7 widening (VERDICT r6 #3/#4/#6): the two PQ-compressed
    # ANN members (the heaviest bench entries) and the SemDeDup
    # composite.  ann_pq_topk runs the registry parameters (ADC has
    # no pruning lever — O(queries · n) by construction);
    # ann_ivfpq_topk_scaled and docs_semdedup_scaled schedule their
    # occupancy levers (n_centroids ∝ n, planes ∝ log2 n) the way the
    # operator docstrings prescribe for a growing corpus
    "ann_pq_topk",
    "ann_ivfpq_topk_scaled",
    "docs_semdedup_scaled",
    # late round-7: prototype-distance pruning with k ∝ √n (training
    # flops n·k = n^1.5 and cluster width n/k = √n both stay
    # sub-quadratic), and the Bloom decontamination prefilter with
    # m_bits ∝ benchmark shingles (fixed m would saturate the bitmap
    # at 100× and silently degrade to the exact path's volume)
    "docs_kmeans_prune_scaled",
    "docs_bloom_contamination_scaled",
    # the modern-stack end-to-end composite (gates -> bloom decontam
    # -> packing): every stage linear, so the composition must be too
    "docs_modern_corpus",
    # entity resolution: FULL fuzzy self-join (every row a probe) —
    # variant-key occupancy over dense id-derived strings is bounded
    # by alphabet x positions, so candidates are O(n · L), not O(n²)
    "q81_fuzzy_join_scaled",
    # graph analytics: triangle counting over a synthetic basket
    # graph whose group count grows with n (occupancy ~8 held
    # constant) — degree stays O(1), so wedge volume is O(n · d²)
    "q82_triangles_scaled",
    # iterative grouped PageRank: per-doc word graphs are
    # corpus-size-independent, so 3 iterations of join+agg grow
    # linearly with the document count (registry parameters)
    "text_textrank",
    # mode-propagation: 2 LPA rounds over the same constant-occupancy
    # basket graph as the triangle curve — per-round cost is one join
    # + two aggregates at edge volume, O(n) with bounded degree
    "q83_lpa_scaled",
    # round-8: perceptual-hash multimodal dedup with the fingerprint
    # WIDTH as the occupancy lever (band-key cardinality 4·2^(bits/4)
    # grows with the corpus so band buckets stay ~constant; the
    # registry's fixed 16-bit geometry would be quadratic at scale
    # exactly like text simhash banding, which is why the registry
    # query is not on the curve unscaled)
    "multimodal_dedup_scaled",
    # round-8: per-source snapshot drift — one tokenize map pass,
    # then all aggregation on the bounded source×1024 domain
    "docs_corpus_drift",
    # round-9: video-level near-dup with the frame-hash WIDTH as the
    # occupancy lever (hash space 2^bits grows with the 4n frame
    # count so equi-join buckets hold ~16 — the registry's fixed
    # 16-bit geometry would be quadratic at scale exactly like the
    # image path), and the IVFADC index lifecycle end-to-end
    # (save-on-half → frozen-geometry append → probe) with the same
    # n_centroids ∝ n occupancy schedule as ann_ivfpq_topk_scaled
    "multimodal_video_dedup_scaled",
    "ann_ivfpq_appended_scaled",
    # round-10: the two streaming index classes' PER-BATCH cost with
    # the arrivals FIXED and the standing corpus grown — the curve
    # that can falsify the "batch-sized, not corpus-sized" claim
    # (VERDICT r9 #7); the save is memoized outside the timed region,
    # replays are idempotent via the staged-delta protocol
    "stream_incremental_dedup_scaled",
    "stream_ann_probe_scaled",
    # round-10: the audio near-dup composition with sub-fingerprint
    # WIDTH as the occupancy lever (bands 16 → 20 → 24, the
    # PHASH_BITS dilution pattern)
    "multimodal_audio_dedup_scaled",
    # round-10: metadata-filtered vector search — constant-selectivity
    # label filter over the n_centroids ∝ n occupancy schedule; the
    # filter multiplies candidate volume by a constant (1/10), it
    # does not change the growth order
    "ann_filtered_topk_scaled",
    # the same filter at the IVFADC tier (extra candidate-join keys,
    # label as a payload column in the codes side)
    "ann_ivfpq_filtered_scaled",
    # round-11: the MAINTENANCE passes — generational compaction of
    # both persisted indexes (fold base + committed deltas −
    # tombstones into a fresh generation behind the pointer swap).
    # The 100 TB story prices every probe as batch-sized BECAUSE this
    # fold runs on the maintenance cadence; these curves pin the fold
    # itself as linear (it is a rewrite of corpus-sized tables, never
    # a re-derivation)
    "ann_ivfpq_compacted_scaled",
    "dedup_index_compacted_scaled",
]
FACTORS = [1, 10, 100]
RUNS = 2
QUAD_FRACTION = 0.3  # gate: ratio must stay under 30% of quadratic


def main() -> int:
    # validate subset filters BEFORE any Spark/data work: a typo must
    # fail loudly, not silently rewrite SCALE_BENCH.json from prior
    # entries with exit 0
    filters = sys.argv[1:]
    selected = [
        n for n in OPERATORS if not filters or any(f in n for f in filters)
    ]
    if not selected:
        raise SystemExit(
            f"no operator matches filters {filters!r}; known: {OPERATORS}"
        )

    data_root = os.path.join(REPO, "scale_data")
    if not os.path.isdir(os.path.join(data_root, "x100")):
        from gen_scale_corpus import generate

        generate(data_root)

    from pyspark.sql import SparkSession

    from etl_cpc_schema_spark import queries as Q

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("scale_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _knn_scaled(spark, sf_dir):
        import math

        from etl_cpc_schema_spark.operators import similarity as SIM

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = embs.count()
        planes = max(6, math.ceil(math.log2(max(n, 16) / 16)))
        return SIM.lsh_knn_join_blas(
            embs, k=3, planes=planes, tables=8, probe_bits=6
        )

    # "ann_pq_topk" runs its REGISTRY definition directly: ADC has no
    # pruning lever (every code is scored per query), so with the
    # fixed 64-query contract the cost is O(64 · n) LUT lookups plus
    # the O(n) encode pass — linear by construction, no scheduling.

    def _ivfpq_scaled(spark, sf_dir):
        # IVFADC's occupancy lever, exercised the way the ivf_topk
        # docstring prescribes: n_centroids grows with the corpus so
        # cell occupancy holds ~64 and the candidate volume stays
        # O(queries · nprobe · occupancy) regardless of corpus size.
        # Training cost is O(n · n_centroids) BLAS — sub-quadratic in
        # wall time because the per-row work is a vectorized matmul.
        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.similarity import ivfpq_topk

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = embs.count()
        return ivfpq_topk(
            embs,
            k=3,
            n_centroids=max(32, n // 64),
            nprobe=10,
            m_subspaces=16,
            ksub=16,
            shortlist=48,
            query_pred=F.col("vec_id") < 64,
            ivf_lloyd_iters=1,
            pq_lloyd_iters=1,
        )

    def _semdedup_scaled(spark, sf_dir):
        # round-7 composite (VERDICT r6 #6 asks for a scale point):
        # k-NN graph -> tau edge filter -> components ->
        # representatives end-to-end, with the same scheduled-planes
        # occupancy lever as ann_knn_join_scaled (fixed planes would
        # make the whole-corpus probe quadratic by construction).
        import math

        from etl_cpc_schema_spark.queries import semdedup

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = embs.count()
        planes = max(6, math.ceil(math.log2(max(n, 16) / 16)))
        return semdedup(embs, k=3, planes=planes, tables=8, probe_bits=6)

    def _kmeans_prune_scaled(spark, sf_dir):
        # k ∝ √n: assignment cost n·k = n^1.5 (vectorized BLAS map
        # passes), per-cluster window width n/k = √n — both
        # sub-quadratic; fixed k would grow the ranking window's
        # partitions linearly, fixed width (k ∝ n) would make training
        # quadratic.
        import math

        from etl_cpc_schema_spark.operators.similarity import (
            kmeans_prototype_prune,
        )

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = embs.count()
        return kmeans_prototype_prune(
            embs, n_clusters=max(16, int(math.isqrt(n))), lloyd_iters=1
        )

    def _bloom_contamination_scaled(spark, sf_dir):
        # m_bits ∝ benchmark shingle count (~16 bits/key at k=4 →
        # fp ≈ 0.2%): the registry's fixed 2^16 bitmap saturates once
        # the benchmark outgrows it and every probe returns true —
        # exact answers still, but the prefilter stops pruning and
        # the timing would measure the exact path plus probe overhead.
        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators import dedup as DD
        from etl_cpc_schema_spark.operators.dedup import shingle_table

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bench = d.filter(F.col("doc_id") % 50 == 0)
        corpus = d.filter(F.col("doc_id") % 50 != 0)
        n_sh = (
            shingle_table(bench, "doc_id", "text", 3)
            .select(F.explode("shingles").alias("s"))
            .distinct()
            .count()
        )
        m_bits = 1 << max(16, (16 * max(n_sh, 1) - 1).bit_length())
        return DD.bloom_contamination(corpus, bench, n=3, m_bits=m_bits)

    def _fuzzy_join_scaled(spark, sf_dir):
        # the production shape: EVERY row is a probe (full fuzzy
        # self-join).  Names are dense id-derived strings, so each
        # single-deletion variant key is shared by at most
        # alphabet × positions strings — candidate volume O(n · L)
        # with no frequency cap needed; an accidental theta-join
        # would be O(n²) and fail the gate loudly.
        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.linkage import (
            edit_distance_join,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id",
            F.format_string("d%07d", F.col("doc_id")).alias("name"),
        )
        return edit_distance_join(d, d, "doc_id", "doc_id", "name")

    def _triangles_scaled(spark, sf_dir):
        # each doc joins 2 hash-assigned baskets; basket count ∝ n
        # holds expected occupancy ~8 (so per-basket edge fan-out
        # C(8,2) and vertex degree stay O(1) as the corpus grows) —
        # the same dilution lever as LSH bands / IVF cells.  Fixed
        # basket count would grow occupancy linearly and the wedge
        # join quadratically.
        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.graph import (
            cooccurrence_edges,
            triangle_counts,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = d.count()
        n_groups = max(64, n // 4)
        members = d.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col("doc_id"), F.lit(i)),
                            F.lit(n_groups),
                        )
                        for i in range(2)
                    ]
                )
            ).alias("g"),
            "doc_id",
        )
        return triangle_counts(cooccurrence_edges(members, "g", "doc_id"))

    def _lpa_scaled(spark, sf_dir):
        # same hash-assigned basket graph as _triangles_scaled
        # (basket count ∝ n, occupancy ~8 → degree O(1)); two
        # synchronous LPA rounds are join+agg passes at edge volume
        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.graph import (
            cooccurrence_edges,
            label_propagation,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = d.count()
        n_groups = max(64, n // 4)
        members = d.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col("doc_id"), F.lit(i)),
                            F.lit(n_groups),
                        )
                        for i in range(2)
                    ]
                )
            ).alias("g"),
            "doc_id",
        )
        edges = cooccurrence_edges(members, "g", "doc_id")
        return label_propagation(edges, iterations=2)

    def _multimodal_dedup_scaled(spark, sf_dir):
        # fingerprint width ∝ log2(n): band-key cardinality 4·2^(b/4)
        # grows with the corpus so band-bucket occupancy (the
        # quadratic fan-in of the Hamming self-join) holds ~16 —
        # the dilution lever the dhash_table docstring prescribes.
        import math

        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.dedup import (
            banded_hamming_pairs,
        )
        from etl_cpc_schema_spark.operators.multimodal import (
            attach_fake_payload,
            dhash_table,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = d.count()
        band_bits = min(15, max(4, math.ceil(math.log2(max(n, 64) / 16))))
        bits = 4 * band_bits
        ph = dhash_table(attach_fake_payload(d), bits=bits)
        pairs = banded_hamming_pairs(
            ph, "phash", bits, max_hamming=2, band_bits=band_bits
        )
        return pairs.groupBy("d1").agg(F.count("*").alias("n_near"))

    def _video_dedup_scaled(spark, sf_dir):
        # frame-hash width ∝ log2(frames): the equi-join's bucket
        # occupancy (4n frame hashes over 2^bits buckets) holds ~16,
        # so pair volume stays O(n) — the dhash_table dilution lever
        # applied to the video composition.
        import math

        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.dedup import jaccard_at_least
        from etl_cpc_schema_spark.operators.iterutils import iter_checkpoint
        from etl_cpc_schema_spark.operators.multimodal import (
            attach_fake_payload,
            dhash_table,
            sample_frames,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = d.count()
        bits = min(60, max(8, 4 * math.ceil(math.log2(max(4 * n, 64) / 16) / 4)))
        frames = sample_frames(
            attach_fake_payload(d), every_n_bytes=64, max_frames=4
        )
        # one materialization for the four plan references (registry
        # query comment: the .explain audit caught a 4x recompute)
        sets = iter_checkpoint(
            dhash_table(
                frames.select(
                    "doc_id", F.col("frame_payload").alias("payload")
                ),
                bits=bits,
                use_decoder=False,
            ).distinct(),
            eager=False,
        )
        sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))
        a, b = sets.alias("a"), sets.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.phash") == F.col("b.phash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .agg(F.count("*").alias("shared"))
        )
        return (
            pairs.join(sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1")
            .join(sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")), "d2")
            .filter(jaccard_at_least(F.col("shared"), F.col("n1"), F.col("n2"), 1, 2))
        )

    def _ivfpq_appended_scaled(spark, sf_dir):
        # the full index lifecycle at scale: train+save on the first
        # half (n_centroids ∝ n holds cell occupancy ~64), encode the
        # second half under the FROZEN geometry (one Arrow/BLAS pass
        # over the new vectors only), probe the combined index.
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.similarity import (
            append_to_ivfpq_index,
            ivfpq_topk,
            save_ivfpq_index,
        )

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = embs.count()
        split = n // 2
        path = tempfile.mkdtemp(prefix="spark_scale_ivfpq_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        save_ivfpq_index(
            embs.filter(F.col("vec_id") < split),
            path,
            n_centroids=max(32, n // 64),
            m_subspaces=16,
            ksub=16,
            ivf_lloyd_iters=1,
            pq_lloyd_iters=1,
        )
        append_to_ivfpq_index(embs.filter(F.col("vec_id") >= split), path)
        return ivfpq_topk(
            embs,
            k=3,
            nprobe=10,
            shortlist=48,
            query_pred=F.col("vec_id") < 64,
            index_path=path,
        )

    # the two streaming index classes claim their PER-BATCH cost is
    # batch-sized; the curve that can falsify that holds the ARRIVALS
    # FIXED while the standing corpus grows 1x/10x/100x (VERDICT r9
    # #7).  The corpus-sized save is memoized per scale dir (it has
    # its own measured curve: ann_ivfpq_appended_scaled pays training
    # in-measurement), so the timed region is exactly what a serving
    # day pays: per batch, re-load the index handles, probe, and
    # append the batch under its batch key.  Replaying the same batch
    # keys per timed run is IDEMPOTENT by the round-10 staged-delta
    # protocol (rollback + rewrite), which is also what makes a
    # min-of-RUNS estimator valid here.  Residual corpus-size
    # dependence is the index SCAN feeding the probe joins — linear
    # bytes, the documented floor, which is why the gate is
    # sub-quadratic rather than flat.
    _stream_saved: dict[str, str] = {}

    def _stream_dedup_scaled(spark, sf_dir):
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators import dedup as DD
        from etl_cpc_schema_spark.operators import index_store as IS

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        key = f"dedup:{sf_dir}"
        path = _stream_saved.get(key)
        if path is None:
            path = tempfile.mkdtemp(prefix="spark_scale_sdedup_")
            atexit.register(shutil.rmtree, path, ignore_errors=True)
            DD.save_dedup_index(
                docs.filter(F.col("doc_id") >= 500), path, n=3
            )
            _stream_saved[key] = path
        batches = (("b0", 0, 250), ("b1", 250, 500))
        for bkey, _, _ in batches:
            IS.rollback_delta(path, bkey)
        outs = []
        for bkey, lo, hi in batches:
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            idx = DD.load_dedup_index(spark, path)
            res = DD.incremental_dedup_indexed(
                batch, idx, num=4, den=5
            ).localCheckpoint(eager=True)
            keepers = batch.join(
                res.filter(F.col("keep")).select("doc_id"),
                "doc_id",
                "left_semi",
            )
            DD.append_to_dedup_index(keepers, path, batch_key=bkey)
            outs.append(res)
        return outs[0].unionByName(outs[1])

    def _stream_ann_probe_scaled(spark, sf_dir):
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators import index_store as IS
        from etl_cpc_schema_spark.operators.similarity import (
            append_to_ivfpq_index,
            ivfpq_topk,
            save_ivfpq_index,
        )

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        key = f"ann:{sf_dir}"
        path = _stream_saved.get(key)
        if path is None:
            n = embs.count()
            path = tempfile.mkdtemp(prefix="spark_scale_sann_")
            atexit.register(shutil.rmtree, path, ignore_errors=True)
            save_ivfpq_index(
                embs.filter(F.col("vec_id") >= 512),
                path,
                n_centroids=max(32, n // 64),
                m_subspaces=16,
                ksub=16,
                ivf_lloyd_iters=1,
                pq_lloyd_iters=1,
            )
            _stream_saved[key] = path
        batches = (("b0", 0, 256), ("b1", 256, 512))
        for bkey, _, _ in batches:
            IS.rollback_delta(path, bkey)
        outs = []
        for bkey, lo, hi in batches:
            batch = embs.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            )
            res = ivfpq_topk(
                batch, k=3, nprobe=10, shortlist=48, index_path=path
            ).localCheckpoint(eager=True)
            append_to_ivfpq_index(batch, path, batch_key=bkey)
            outs.append(res)
        return outs[0].unionByName(outs[1])

    def _ivfpq_compacted_scaled(spark, sf_dir):
        """Maintenance-cost curve (round 11): generational compaction
        is the ONE corpus-sized pass of the IVFADC index lifecycle —
        the 100 TB story prices every probe as batch-sized BECAUSE the
        fold runs on the maintenance cadence, so the fold itself needs
        a measured linear curve.  The build (save on half with
        n_centroids ∝ n, staged delta append of the other half, 10%
        tombstoned) is memoized per scale dir outside the timed
        region; each timed call runs compact_ivfpq_index on the
        current live state — run 1 folds base + delta − tombstones,
        later runs re-fold the already-folded generation, and both are
        the same corpus-sized rewrite the curve pins.  The returned
        frame is the live codes table, so the noop sink re-scans what
        the fold wrote and the row counts evidence the fold volume."""
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators import index_store as IS
        from etl_cpc_schema_spark.operators.similarity import (
            append_to_ivfpq_index,
            compact_ivfpq_index,
            remove_from_ivfpq_index,
            save_ivfpq_index,
        )

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        key = f"ivfpq_cmp:{sf_dir}"
        path = _stream_saved.get(key)
        if path is None:
            n = embs.count()
            path = tempfile.mkdtemp(prefix="spark_scale_ivfpq_cmp_")
            atexit.register(shutil.rmtree, path, ignore_errors=True)
            half = n // 2
            save_ivfpq_index(
                embs.filter(F.col("vec_id") < half),
                path,
                n_centroids=max(32, n // 64),
                m_subspaces=16,
                ksub=16,
                ivf_lloyd_iters=1,
                pq_lloyd_iters=1,
            )
            append_to_ivfpq_index(
                embs.filter(F.col("vec_id") >= half), path,
                batch_key="day1",
            )
            remove_from_ivfpq_index(
                embs.filter(F.col("vec_id") % 10 == 7).select("vec_id"),
                path,
            )
            _stream_saved[key] = path
        compact_ivfpq_index(spark, path)
        return IS.read_table(spark, path, "codes")

    def _dedup_index_compacted_scaled(spark, sf_dir):
        """The dedup-index twin of _ivfpq_compacted_scaled: fold the
        fingerprint/band/shingle tables (base + committed delta −
        tombstoned docs) into a fresh generation.  Table volume is
        docs × shingles — strictly linear — so a super-linear curve
        here would mean the fold re-derives something it should only
        rewrite."""
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators import dedup as DD
        from etl_cpc_schema_spark.operators import index_store as IS

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        key = f"dedup_cmp:{sf_dir}"
        path = _stream_saved.get(key)
        if path is None:
            path = tempfile.mkdtemp(prefix="spark_scale_dedup_cmp_")
            atexit.register(shutil.rmtree, path, ignore_errors=True)
            DD.save_dedup_index(
                docs.filter(F.col("doc_id") % 10 != 0), path, n=3
            )
            DD.append_to_dedup_index(
                docs.filter(F.col("doc_id") % 10 == 0), path,
                batch_key="day1",
            )
            DD.remove_from_dedup_index(
                docs.filter(F.col("doc_id") % 7 == 3).select("doc_id"),
                path,
            )
            _stream_saved[key] = path
        DD.compact_dedup_index(spark, path)
        return IS.read_table(spark, path, "bands")

    def _audio_dedup_scaled(spark, sf_dir):
        # the audio composition with the sub-fingerprint WIDTH as the
        # occupancy lever (the PHASH_BITS pattern): rows in the
        # equi-join grow ~linearly with tracks, so BANDS widens
        # (16 → 20 → 24 bits, band width 2 held) to keep shared-subfp
        # bucket occupancy constant — the registry query pins the
        # 16-bit geometry its oracle reproduces
        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators import dedup as DD
        from etl_cpc_schema_spark.operators import multimodal as MM
        from etl_cpc_schema_spark.operators.iterutils import iter_checkpoint

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = d.count()
        bands = 16 if n <= 10_000 else (20 if n <= 100_000 else 24)
        # portable=False: the scaled run has no SQL oracle to satisfy,
        # so the band surrogate is xxhash64 (same expression shape,
        # ~10x cheaper than the registry query's oracle-portable md5)
        sets = iter_checkpoint(
            MM.audio_subfingerprints(
                MM.attach_fake_payload(d),
                frame_chars=2 * bands,
                bands=bands,
                portable=False,
            )
            .select("doc_id", "subfp")
            .distinct(),
            eager=False,
        )
        sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))
        a, b = sets.alias("a"), sets.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.subfp") == F.col("b.subfp"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
            )
            .agg(F.count("*").alias("shared"))
        )
        return (
            pairs.join(
                sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")),
                "d1",
            )
            .join(
                sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")),
                "d2",
            )
            .filter(
                DD.jaccard_at_least(
                    F.col("shared"), F.col("n1"), F.col("n2"), 1, 2
                )
            )
        )

    def _ivfpq_filtered_scaled(spark, sf_dir):
        # The persisted-index filtered probe's growth twin, measured
        # in-session (probe volume is identical; the save is the
        # amortized term the appended/indexed curves already cover):
        # same n_centroids ∝ n schedule as ann_ivfpq_topk_scaled,
        # constant-selectivity label filter as extra candidate-join
        # keys, nprobe at the selectivity-scaled 20.
        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.similarity import ivfpq_topk

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = embs.count()
        return ivfpq_topk(
            embs,
            k=3,
            n_centroids=max(32, n // 64),
            nprobe=20,
            m_subspaces=16,
            ksub=16,
            shortlist=48,
            query_pred=F.col("vec_id") < 64,
            ivf_lloyd_iters=1,
            pq_lloyd_iters=1,
            match_cols=("label",),
        )

    def _filtered_topk_scaled(spark, sf_dir):
        # Filtered vector search at scale: the label filter's
        # selectivity is CONSTANT (10 labels at every factor), so
        # candidate volume stays queries x nprobe x occupancy x 0.1
        # with the same n_centroids ∝ n occupancy schedule as the
        # unfiltered curve — the filter multiplies work by a
        # constant, it does not change the growth order.
        from pyspark.sql import functions as F

        from etl_cpc_schema_spark.operators.similarity import ivf_topk

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = embs.count()
        return ivf_topk(
            embs,
            k=3,
            n_centroids=max(32, n // 64),
            nprobe=20,
            query_pred=F.col("vid") < 64,
            lloyd_iters=1,
            match_cols=("label",),
        )

    extra = {
        "ann_filtered_topk_scaled": _filtered_topk_scaled,
        "ann_ivfpq_filtered_scaled": _ivfpq_filtered_scaled,
        "multimodal_audio_dedup_scaled": _audio_dedup_scaled,
        "ann_ivfpq_compacted_scaled": _ivfpq_compacted_scaled,
        "dedup_index_compacted_scaled": _dedup_index_compacted_scaled,
        "stream_incremental_dedup_scaled": _stream_dedup_scaled,
        "stream_ann_probe_scaled": _stream_ann_probe_scaled,
        "multimodal_video_dedup_scaled": _video_dedup_scaled,
        "ann_ivfpq_appended_scaled": _ivfpq_appended_scaled,
        "multimodal_dedup_scaled": _multimodal_dedup_scaled,
        "ann_knn_join_scaled": _knn_scaled,
        "ann_ivfpq_topk_scaled": _ivfpq_scaled,
        "docs_semdedup_scaled": _semdedup_scaled,
        "docs_kmeans_prune_scaled": _kmeans_prune_scaled,
        "docs_bloom_contamination_scaled": _bloom_contamination_scaled,
        "q81_fuzzy_join_scaled": _fuzzy_join_scaled,
        "q82_triangles_scaled": _triangles_scaled,
        "q83_lpa_scaled": _lpa_scaled,
    }

    # subset mode (filters validated at the top of main): matching
    # operators re-run and MERGE into the existing SCALE_BENCH.json —
    # adding one curve must not re-time the other nineteen.
    results: dict[str, dict] = {}
    ok = True
    for name in selected:
        fn = Q.SPARK_QUERIES.get(name) or extra[name]
        times: dict[str, float] = {}
        rows: dict[str, int] = {}
        for f in FACTORS:
            sf_dir = os.path.join(data_root, f"x{f}")
            best, n = float("inf"), -1
            for _ in range(RUNS):
                t0 = time.time()
                df = fn(spark, sf_dir)
                # noop sink, NOT count(): count() lets Catalyst eliminate
                # row-preserving left joins (aggregated unique-key build
                # sides), timing a plan that skips the actual operator —
                # docs_incremental_dedup measured 0.6 s flat that way.
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            n = fn(spark, sf_dir).count()
            times[f"x{f}"] = round(best, 3)
            rows[f"x{f}"] = n
            print(f"{name} x{f}: {best:.2f}s rows={n}", flush=True)
        ratio = times["x100"] / max(times["x1"], 1e-9)
        gate = QUAD_FRACTION * (FACTORS[-1] / FACTORS[0]) ** 2
        passed = ratio < gate
        ok = ok and passed
        results[name] = {
            "sec": times,
            "rows": rows,
            "t100_over_t1": round(ratio, 1),
            "subquadratic_gate": gate,
            "pass": passed,
        }
        print(
            f"{name}: t(x100)/t(x1) = {ratio:.1f} "
            f"({'PASS' if passed else 'FAIL'} < {gate:.0f})",
            flush=True,
        )
    spark.stop()

    path = os.path.join(REPO, "SCALE_BENCH.json")
    merged = results
    if filters and os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh).get("operators", {})
        # drop entries for operators no longer on the curve — a stale
        # renamed/removed row must not keep voting in the gate
        prior = {k: v for k, v in prior.items() if k in OPERATORS}
        prior.update(results)
        merged = prior
        ok = all(v.get("pass") for v in merged.values())

    out = {
        "factors": FACTORS,
        "base_rows": {"documents": 5000, "embeddings": 2000},
        "runs_per_point": RUNS,
        "operators": merged,
        "all_subquadratic": ok,
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({"all_subquadratic": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
