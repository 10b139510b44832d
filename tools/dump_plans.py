"""Dump .explain('formatted') of named queries to per-query files.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <suffix> <q1> [q2 ...]
Writes <out_dir>/<query>_<suffix>.txt for each query — the judge-checkable
plan artifacts for the optimization rounds.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, os.path.abspath(root))
os.chdir(root)
os.makedirs(out_dir, exist_ok=True)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from aws_vpc_flow_log_appender_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

spark = get_spark("dump_plans")
qs = entry.queries()
for name in names:
    buf = io.StringIO()
    df = qs[name](spark, SF_DIR)
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}", flush=True)
