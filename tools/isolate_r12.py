"""Round-12 quiet-host isolate (VERDICT r11 "Next round" #2/#4).

One fresh process, mirroring bench.py's warm-up exactly (JVM + python
workers + INDEX_WARMED including the round-12 stream_ann_probe
pristine save), then 7 timed runs each of:

* text_gopher_filters — the r11 weak flag (graded 1.44 s vs 0.77 r10
  on a zero-shuffle map-only pass; builder same-code runs read
  1.02-1.23 s).  The recorded median is the on-the-record host
  attribution that clears the flag.
* stream_ann_probe — the NEW timed region (save moved to warm-up);
  the median is the trustworthy round-over-round baseline for the
  changed measurement.
* text_token_freq, text_stats — the flat controls every prior isolate
  used.

Prints one JSON line; append it to ISOLATES_r12.jsonl and record the
mid-3 medians in bench.py's detail dict.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_cpc_schema_spark import queries as Q  # noqa: E402
from etl_cpc_schema_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="isolate_r12")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
load0 = os.getloadavg()[0]
Q.SPARK_QUERIES["q09_group_count"](spark, sf).collect()


def _warm_workers(batches):
    import numpy  # noqa: F401

    yield from batches


spark.range(256).repartition(64).mapInPandas(
    _warm_workers, schema="id long"
).collect()
for name in (
    "ann_ivfpq_appended",
    "ann_ivfpq_compacted",
    "ann_ivfpq_filtered",
    "stream_ann_probe",
):
    Q.SPARK_QUERIES[name](spark, sf).collect()

res = {}
for name in (
    "text_gopher_filters",
    "stream_ann_probe",
    "text_token_freq",
    "text_stats",
):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        Q.SPARK_QUERIES[name](spark, sf).collect()
        ts.append(round(time.perf_counter() - t0, 3))
    res[name] = ts
print(
    json.dumps(
        {
            "arm": "isolate_r12_final_tree",
            "sf_dir": sf,
            "loadavg_start": load0,
            "loadavg_end": os.getloadavg()[0],
            "runs": res,
        }
    ),
    flush=True,
)
spark.stop()
