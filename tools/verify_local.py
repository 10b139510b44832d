"""Local differential harness mirroring the driver's correctness gate:
run each queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same parquet tables, compare row count + schema + order-insensitive values.

Usage:  python tools/verify_local.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"rowcount spark={len(sdf)} duckdb={len(ddf)}")
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duckdb={dcols}")
        return problems
    s, d = normalize(sdf), normalize(ddf)
    if len(s) != len(d):
        return problems
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sv = pd.to_numeric(sv, errors="coerce")
            dv = pd.to_numeric(dv, errors="coerce")
            both = sv.notna() & dv.notna()
            if (sv.isna() != dv.isna()).any():
                problems.append(f"col {c}: null mismatch")
            diff = (sv[both] - dv[both]).abs()
            if len(diff) and diff.max() > 0:
                problems.append(f"col {c}: max abs diff {diff.max():.3g} "
                                f"({(diff > 0).sum()} rows differ)")
        else:
            neq = ~(sv.eq(dv) | (sv.isna() & dv.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {int(neq.sum())} rows differ, e.g. row {i}: "
                    f"spark={sv[i]!r} duckdb={dv[i]!r}"
                )
    # dtype report (informational — driver may compare schema strictly)
    for c in sdf.columns:
        st, dt = str(sdf[c].dtype), str(ddf[c].dtype)
        if st != dt:
            problems.append(f"DTYPE col {c}: spark={st} duckdb={dt}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--json",
        help="also write a CORRECTNESS_r{N}.json-shaped artifact (registration "
        "order) — interim driver-style evidence for queries outside the "
        "driver's 50-entry correctness window",
    )
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="driver rehearsal: bare SparkSession (no engine configs, default "
        "200 shuffle partitions) — queries must still pass because "
        "registry.load pins timezone/partitions per call",
    )
    ap.add_argument(
        "--window",
        type=int,
        help="only the first N ordered-registry entries (the driver's "
        "correctness gate checks the first 50)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder
            .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
            .appName("verify_vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from aws_vpc_flow_log_appender_spark.session import get_spark

        spark = get_spark("verify_local")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connect(args.sf)
    names = args.names or list(qs)
    if args.window is not None:
        if args.window < 1:
            ap.error("--window must be >= 1")
        names = names[: args.window]

    n_pass = n_fail = n_noracle = 0
    report: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark error: {e}"[:200],
            }
            n_fail += 1
            continue
        if name not in oracles:
            print(f"----  {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None, "err": "no_oracle",
            }
            n_noracle += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(sdf), "oracle_rows": None,
                "err": f"duckdb error: {e}"[:200],
            }
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        hard = [p for p in problems if not p.startswith("DTYPE")]
        report[name] = {
            "rows_match": len(sdf) == len(ddf),
            "schema_match": sorted(sdf.columns) == sorted(ddf.columns),
            "hash_match": not hard,
            "spark_rows": len(sdf),
            "oracle_rows": len(ddf),
            "err": "; ".join(hard)[:200] if hard else None,
        }
        if hard:
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            soft = "; ".join(problems)
            print(f"PASS  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)"
                  + (f"  [{soft}]" if soft else ""))
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
