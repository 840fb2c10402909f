"""7-run quiet-host isolates for the three spread-waived BENCH_r10
entries (VERDICT r10 "What's wrong" #3): dedup_embedding_cosine,
docs_corpus_drift, text_textrank — reference medians for round-over-
round comparison, recorded in BENCH_DETAIL.  Runs on the round-11
working tree."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_cpc_schema_spark import queries as Q  # noqa: E402
from etl_cpc_schema_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="isolate_waived")
sf = "/root/testdata/sf0.1"
Q.SPARK_QUERIES["q09_group_count"](spark, sf).collect()
res = {}
for name in ("dedup_embedding_cosine", "docs_corpus_drift", "text_textrank"):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        Q.SPARK_QUERIES[name](spark, sf).collect()
        ts.append(round(time.perf_counter() - t0, 3))
    res[name] = ts
print(json.dumps({"arm": "waived_isolates_r11tree", "runs": res,
                  "loadavg_end": os.getloadavg()[0]}), flush=True)
spark.stop()
