"""Alternating fresh-process A/B for a single headline query.

One invocation = ONE fresh JVM against ONE tree; the caller alternates
trees (r-current vs an older worktree) so box drift affects both sides
equally — the methodology that settled the q04/q05 drift questions in
earlier rounds (BENCH_SF1.md addenda).

Usage: python tools/ab_query.py <repo_root> <query_name> [reps]
Prints one JSON line: {"tree", "query", "times": [...], "loadavg"}.
"""

import json
import os
import sys
import time

root = sys.argv[1]
qname = sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 7

sys.path.insert(0, root)

import __spark_entry__ as m  # noqa: E402
from bigdata_old_spark.session import get_spark  # noqa: E402

spark = get_spark("ab")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

qs = m.queries()
st = m._store(spark, sf_dir)
st.statements.count()
st.stats()
# codegen warm-up on the smallest store (identical plan shape), then one
# uncounted cold pass on the measured store — bench.py's methodology
warm = "/root/testdata/sf0.001"
if os.path.isdir(warm) and warm != sf_dir:
    try:
        qs[qname](spark, warm).count()
    except Exception:
        pass
qs[qname](spark, sf_dir).count()

times = []
for _ in range(reps):
    t0 = time.perf_counter()
    qs[qname](spark, sf_dir).count()
    times.append(round(time.perf_counter() - t0, 3))

print(json.dumps({
    "tree": root,
    "query": qname,
    "times": times,
    "median": sorted(times)[len(times) // 2],
    "loadavg": round(os.getloadavg()[0], 2),
}))
