"""One profiling arm of the round-11 regression attribution protocol.

Usage: python isolate_arm.py <tree> <arm-name> <warm:0|1> <runs>

Runs the three entries VERDICT r10 flagged (docs_semdedup,
stream_stream_join, multimodal_dedup) plus two flat controls
(text_token_freq, text_stats) at sf0.1 in a fresh process on the given
source tree, with or without bench.py's INDEX_WARMED warm-up, and
prints one JSON line with the raw per-run timings.
"""
import json
import os
import sys
import time

tree, arm, warm, runs = sys.argv[1], sys.argv[2], sys.argv[3] == "1", int(sys.argv[4])
sys.path.insert(0, tree)

from etl_cpc_schema_spark import queries as Q  # noqa: E402
from etl_cpc_schema_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"isolate_{arm}")
sf = "/root/testdata/sf0.1"
load1 = os.getloadavg()[0]
Q.SPARK_QUERIES["q09_group_count"](spark, sf).collect()
t_warm0 = time.perf_counter()
if warm:
    for name in ("ann_ivfpq_appended", "ann_ivfpq_compacted", "ann_ivfpq_filtered"):
        if name in Q.SPARK_QUERIES:
            Q.SPARK_QUERIES[name](spark, sf).collect()
warm_s = round(time.perf_counter() - t_warm0, 3)

res = {}
for name in ("docs_semdedup", "stream_stream_join", "multimodal_dedup",
             "text_token_freq", "text_stats"):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        Q.SPARK_QUERIES[name](spark, sf).collect()
        ts.append(round(time.perf_counter() - t0, 3))
    res[name] = ts
print(json.dumps({"arm": arm, "tree": tree, "warm": warm, "warmup_s": warm_s,
                  "loadavg_start": load1, "loadavg_end": os.getloadavg()[0],
                  "runs": res}), flush=True)
spark.stop()
