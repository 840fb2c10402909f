"""7-run isolates of the three graph entries on the FINAL round-11
tree (weakref release design) — the cold per-call reference medians
after the r10 leak/cross-run-cache removal."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_cpc_schema_spark import queries as Q  # noqa: E402
from etl_cpc_schema_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="isolate_graph")
sf = "/root/testdata/sf0.1"
Q.SPARK_QUERIES["q09_group_count"](spark, sf).collect()
res = {}
for name in ("q82_triangle_counts", "q83_label_propagation", "text_textrank"):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        Q.SPARK_QUERIES[name](spark, sf).collect()
        ts.append(round(time.perf_counter() - t0, 3))
    res[name] = ts
print(json.dumps({"arm": "graph_isolates_r11_final_tree", "runs": res,
                  "loadavg_end": os.getloadavg()[0]}), flush=True)
spark.stop()
