"""Drive interleaved A/B rounds of tools/ab_bench.py across two checkouts.

Usage: python tools/ab_drive.py <ref_root> <work_root> <q1,q2,...> [rounds]
Prints per-query min-over-all-trials for each side and the ratio, plus the
raw trials, so one JSON line adjudicates a change under host noise.
"""

from __future__ import annotations

import json
import subprocess
import sys


def run(root: str, qlist: str, n: int) -> dict:
    p = subprocess.run(
        [sys.executable, "tools/ab_bench.py", root, qlist, str(n)],
        capture_output=True, text=True, cwd=root, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no ABRESULT from {root}: {p.stdout[-500:]} {p.stderr[-2000:]}")


def main() -> None:
    ref, work, qlist = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    acc = {"ref": {}, "work": {}}
    for r in range(rounds):
        for side, root in (("ref", ref), ("work", work)):
            res = run(root, qlist, 2)
            for q, ts in res.items():
                acc[side].setdefault(q, []).extend(ts)
            print(f"round {r} {side}: " + json.dumps(res), flush=True)
    summary = {}
    for q in acc["ref"]:
        a, b = min(acc["ref"][q]), min(acc["work"][q])
        summary[q] = {"ref_min": a, "work_min": b,
                      "ratio": round(b / a, 3) if a else None}
    print("ABSUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
