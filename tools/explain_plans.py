"""Print the physical plan of each headline query (the PLANS.md audit).

Usage: python tools/explain_plans.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry
    from bench import HEADLINE
    from aws_vpc_flow_log_appender_spark.session import get_spark

    spark = get_spark("explain")
    qs = entry.queries()
    names = sys.argv[1:] or HEADLINE
    for name in names:
        print(f"\n{'=' * 30} {name} {'=' * 30}")
        qs[name](spark, SF_DIR).explain("formatted")


if __name__ == "__main__":
    main()
