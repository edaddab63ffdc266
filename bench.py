"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (self-documenting, per VERDICT r4 items 2 & 9):

- "_triplify" — one-time load/triplification cost, excluded from the
  metric (at scale it is paid once at bulk-load time, matching the
  reference's DataLoader-then-query lifecycle).
- "first_run_wall_sec" — the FIRST full pass of the headline set on
  the measured store, after JVM/codegen warm-up on sf0.001 plans but
  before any same-store execution.  This is the cold-cache number.
- "headline_query_set_wall_sec" (the headline metric, "value") —
  steady-state repeat latency: after the first pass, the set runs
  N_RUNS=5 more times in-process; each query reports its MEDIAN, and
  the metric is the sum of medians.  Warm-up-mix-then-measure is the
  reference's own BSBM methodology (bigdata-perf/bsbm3/README.txt).
- "runs" — the measured pass totals; "spread" — per-query
  [min, median, max] over the measured passes, the variance evidence
  VERDICT r4 asked for (this box shows ±30% noise on sub-second
  queries).
- Noise self-diagnosis (VERDICT r6 #2): "loadavg_per_pass" records the
  1-min loadavg before every measured pass, and "best_pass_wall_sec" /
  "best_query_set_wall_sec" (sum of per-query minima) are reported
  alongside the median metric — a loaded box shows rising loadavg and
  a best-pass far below the median; a genuine regression moves both.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from bigdata_old_spark.session import get_spark

HEADLINE = [
    "q01_filter_project",
    "q02_join_group_count",
    "q03_tpch_q1",
    "q04_topk",
    "q05_optional_left_join",
    "q07_not_exists",
    "q08_minus",
    "q12_property_path_fk_chain",
    "q15_subselect",
    "q16_year_extract",
    "q18_events_agg",
]

N_RUNS = 5


def _timed_pass(qs, spark, sf_dir, report=False):
    per_query = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        per_query[name] = dt
        if report:
            print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    return per_query


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    entry_mod._store(spark, sf_dir)  # triplify + persist + materialize once
    timings["_triplify"] = round(time.perf_counter() - t0, 3)

    qs = entry_mod.queries()

    t0 = time.perf_counter()
    # The warm-up performs the SAME operations as always (r11 change is
    # scheduling only, guide §2.6): the q09 codegen warm-up, the
    # full-store statements.count() page-cache pass, the one-time
    # cardinality stats build (star-join planning), and the sf0.001
    # codegen mix now all run as CONCURRENT jobs from one pool —
    # independent jobs back-fill each other's straggler tails instead
    # of paying their walls in sequence.  The pool is joined before the
    # first measured pass, so measured medians are unaffected.
    from concurrent.futures import ThreadPoolExecutor

    st = entry_mod._store(spark, sf_dir)
    warm_dir = "/root/testdata/sf0.001"
    do_mix = os.path.isdir(warm_dir) and warm_dir != sf_dir

    def _warm(name: str) -> None:
        try:
            qs[name](spark, warm_dir).count()
        except Exception:
            pass

    def _mix() -> None:
        # the sf0.001 store build runs INSIDE the pool (overlapping the
        # sf0.1-side warm-up jobs), exactly once (_store memoizes);
        # the mix queries start only after it completes
        entry_mod._store(spark, warm_dir)
        with ThreadPoolExecutor(max_workers=4) as inner:
            list(inner.map(_warm, HEADLINE))

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [
            pool.submit(lambda: qs["q09_distinct"](spark, sf_dir).count()),
            pool.submit(st.statements.count),
            pool.submit(st.stats),
        ]
        if do_mix:
            futs.append(pool.submit(_mix))
        for f in futs:
            try:
                f.result()
            except Exception:
                pass  # warm-up only — measured passes surface real errors
    timings["_warmup"] = round(time.perf_counter() - t0, 3)

    # cold-cache pass on the measured store: reported, not the metric
    first = _timed_pass(qs, spark, sf_dir)
    first_total = sum(first.values())
    print(f"# first_run (cold): {first_total:.3f}s", file=sys.stderr)

    # measured passes: steady-state repeat latency, median-of-N_RUNS
    passes = []
    loads = []
    for i in range(N_RUNS):
        try:
            loads.append(round(os.getloadavg()[0], 2))
        except OSError:
            loads.append(None)
        p = _timed_pass(qs, spark, sf_dir, report=(i == N_RUNS - 1))
        passes.append(p)
        print(f"# pass {i + 1}/{N_RUNS}: {sum(p.values()):.3f}s "
              f"(loadavg {loads[-1]})", file=sys.stderr)

    spread = {}
    total = 0.0
    for name in HEADLINE:
        vals = sorted(p[name] for p in passes)
        med = statistics.median(vals)
        timings[name] = round(med, 3)
        spread[name] = [round(vals[0], 3), round(med, 3), round(vals[-1], 3)]
        total += med

    # micro-bench ADDITIONS (reported in "queries", excluded from the
    # headline metric, which stays the sum of the HEADLINE medians):
    # x01 exercises the non-certain EXISTS marker path (shared var
    # bound under OPTIONAL), single-left-evaluation since r11.
    x_queries = {
        "x01_exists_noncertain": entry_mod.PREFIXES + """
            SELECT ?k WHERE {
              ?c c:c_custkey ?k .
              OPTIONAL { ?c c:c_nationkey_ref ?n }
              FILTER EXISTS { ?s s:s_nationkey_ref ?n }
            }""",
    }
    st_m = entry_mod._store(spark, sf_dir)
    for name, sparql in x_queries.items():
        try:
            st_m.query(sparql).count()  # warm (compile + codegen)
            vals = []
            for _ in range(3):
                t0 = time.perf_counter()
                st_m.query(sparql).count()
                vals.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(vals), 3)
        except Exception:
            pass

    try:
        la = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        la = None
    print(json.dumps({
        "metric": "headline_query_set_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "first_run_wall_sec": round(first_total, 3),
        "runs": [round(sum(p.values()), 3) for p in passes],
        "spread": spread,
        "loadavg_1_5_15": la,  # box-contention evidence for the record
        "loadavg_per_pass": loads,
        "best_pass_wall_sec": round(min(sum(p.values()) for p in passes), 3),
        "best_query_set_wall_sec": round(
            sum(min(p[n] for p in passes) for n in HEADLINE), 3
        ),
    }))


def qmph_main(n_clients: int = 4, duration_sec: float = 120.0,
              writers: int = 0) -> None:
    """Concurrent-throughput mode (``bench.py --qmph [clients] [secs]``):
    N client threads fire the headline SPARQL mix at a live HTTP
    endpoint and the metric is QMpH — query MIXES per hour — the
    BSBM-style number the reference publishes (~2,300 QMpH @ 4 clients,
    RELEASE_0.82b.txt:32-33).  One mix = each mix query once, via real
    HTTP GET + JSON parse (server + serializer + transport included).
    Only mixes COMPLETED before the deadline count; the run reports
    per-client mixes and total queries too.  Methodology notes and the
    parameterization caveat live in BENCH_QMPH.md.

    ``writers`` > 0 adds that many UPDATE threads (the BSBM "explore
    and update" shape): each loops SPARQL UPDATE requests — INSERT DATA
    of a fresh marker triple, then DELETE DATA of it — through the
    endpoint's POST update path, exercising the store_lock writer/
    reader interleave under sustained read load.  Reported separately
    (write_ops / write_errors) so reader QMpH stays comparable with the
    read-only runs."""
    import threading
    import urllib.parse
    import urllib.request

    from bigdata_old_spark.server import serve_background

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # concurrent serving wants FAIR job scheduling (per-request pools —
    # BENCH_QMPH.md addendum 3: +34% read-only, writer cost 1.5×→1.05×);
    # single-job batch (main()) stays on the FIFO default, which the
    # alternating A/B measured 15-25% faster for one-query-at-a-time
    os.environ.setdefault("SPARK_GRAFT_SCHEDULER_MODE", "FAIR")
    spark = get_spark("bench-qmph")
    spark.sparkContext.setLogLevel("ERROR")

    st = entry_mod._store(spark, sf_dir)
    st.statements.count()
    st.stats()
    mix_names = [n for n in HEADLINE if n in entry_mod._SPARQL_QUERIES]
    mix = {n: entry_mod.PREFIXES + entry_mod._SPARQL_QUERIES[n][0]
           for n in mix_names}
    srv, _ = serve_background(st)
    base = f"http://127.0.0.1:{srv.server_address[1]}/sparql"

    def run_query(sparql: str) -> None:
        url = f"{base}?query={urllib.parse.quote(sparql)}"
        req = urllib.request.Request(
            url, headers={"Accept": "application/sparql-results+json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            json.loads(r.read())

    def run_update(sparql: str) -> None:
        req = urllib.request.Request(
            base, data=sparql.encode(),
            headers={"Content-Type": "application/sparql-update"})
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()

    # warm-up: one full mix single-threaded (codegen + plan cache, the
    # BSBM warm-up-mix-then-measure shape)
    t0 = time.perf_counter()
    for q in mix.values():
        run_query(q)
    warm = time.perf_counter() - t0
    print(f"# warm-up mix: {warm:.2f}s ({len(mix)} queries)", file=sys.stderr)

    mixes_done = [0] * n_clients
    queries_done = [0] * n_clients
    errors = [0] * n_clients
    deadline = time.perf_counter() + duration_sec

    def client(i: int) -> None:
        # a failed request (HTTP error / timeout) counts as an error and
        # the mix is abandoned — NOT silent thread death, which would
        # overstate QMpH by averaging only the surviving clients
        while time.perf_counter() < deadline:
            ok = True
            for q in mix.values():
                try:
                    run_query(q)
                except Exception:
                    errors[i] += 1
                    ok = False
                    break
                queries_done[i] += 1
            if ok and time.perf_counter() <= deadline:
                mixes_done[i] += 1

    write_ops = [0] * writers
    write_errors = [0] * writers

    def writer(i: int) -> None:
        n = 0
        while time.perf_counter() < deadline:
            n += 1
            marker = f"<http://bench/w{i}> <http://bench/op> {n}"
            try:
                run_update(f"INSERT DATA {{ {marker} }}")
                run_update(f"DELETE DATA {{ {marker} }}")
                write_ops[i] += 2
            except Exception:
                write_errors[i] += 1

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    threads += [threading.Thread(target=writer, args=(i,)) for i in range(writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    srv.shutdown()

    total_mixes = sum(mixes_done)
    try:
        la = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        la = None
    print(json.dumps({
        "metric": "qmph",
        "value": round(total_mixes * 3600.0 / wall, 1),
        "unit": "query_mixes_per_hour",
        "sf": sf,
        "clients": n_clients,
        "wall_sec": round(wall, 2),
        "mixes_per_client": mixes_done,
        "queries_total": sum(queries_done),
        "errors": sum(errors),
        "errors_per_client": errors,
        "writers": writers,
        "write_ops": sum(write_ops),
        "write_errors": sum(write_errors),
        "mix_queries": mix_names,
        "warmup_mix_sec": round(warm, 2),
        "loadavg_1_5_15": la,
    }))


if __name__ == "__main__":
    if "--qmph" in sys.argv:
        pos = [a for a in sys.argv[1:] if not a.startswith("-")]
        qmph_main(
            n_clients=int(pos[0]) if pos else 4,
            duration_sec=float(pos[1]) if len(pos) > 1 else 120.0,
            writers=int(pos[2]) if len(pos) > 2 else 0,
        )
    else:
        main()
