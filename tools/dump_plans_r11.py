"""Dump .explain("formatted") for every queries() entry (the r10-style
sweep) plus per-query before/after files for the round's touched
queries.

Usage: python tools/dump_plans_r11.py <repo_root> <out_dir> <suffix>
  repo_root — tree to import __spark_entry__ from (r10 worktree = before)
  out_dir   — plans directory to write into
  suffix    — "before" | "after" (per-query file names)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, root)

import __spark_entry__ as m  # noqa: E402
from bigdata_old_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
# every query whose compiled form this round's changes can touch:
# the star family (two-pass narrow-struct firsts), q08 (honest MINUS
# evidence re-dump, VERDICT r10 #4), q07 (same anti-join family),
# q12/q16 (regression-watch entries)
PER_QUERY = [
    "q02_join_group_count", "q03_tpch_q1", "q07_not_exists", "q08_minus",
    "q12_property_path_fk_chain", "q13_having", "q14_agg_min_max",
    "q16_year_extract", "q18_events_agg", "q26_avg_decimal",
]

os.makedirs(out_dir, exist_ok=True)
spark = get_spark("plans-r11")
spark.sparkContext.setLogLevel("ERROR")
qs = m.queries()


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


sweep_path = os.path.join(out_dir, f"SWEEP_all_entries_{suffix}.txt")
with open(sweep_path, "w") as sweep:
    for name in sorted(qs):
        try:
            p = plan_text(qs[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            p = f"ERROR: {e}\n"
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", p))
        n_py = len(re.findall(r"BatchEvalPython", p))
        n_cart = len(re.findall(r"CartesianProduct", p))
        sweep.write(f"==== {name} (Exchange={n_ex} BatchEvalPython={n_py} "
                    f"Cartesian={n_cart}) ====\n{p}\n")
        if name in PER_QUERY:
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(p)
print("wrote", sweep_path)
