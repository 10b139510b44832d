"""Sweep/registry parity (VERDICT r8 "Next round" #3): round 8 added a
query in the end-of-round snapshot commit AFTER the committed local sweep,
so the round-close evidence covered 226 of a 227-query surface. These pins
make that impossible to repeat silently: the NEWEST committed local sweep
artifact must cover the registry exactly, and no sweep artifact may contain
a ghost (a name no longer registered)."""

import glob
import json
import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sweep_artifacts():
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_local_r*.json"))
    def round_of(p):
        m = re.search(r"_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1
    return sorted(paths, key=round_of)


def test_no_sweep_artifact_contains_ghost_queries():
    """Every name ever swept is still a registered query — a rename or
    deletion must retire its sweep rows deliberately, not leave the
    artifact asserting coverage of a query that no longer exists."""
    registered = set(entry.queries())
    for path in _sweep_artifacts():
        keys = set(json.load(open(path)))
        ghosts = keys - registered
        assert not ghosts, (os.path.basename(path), sorted(ghosts))


def test_newest_sweep_covers_full_registry():
    """The newest committed sweep artifact covers the LIVE registry, every
    row green — an end-of-round query addition without a re-sweep turns
    this red (the r8 under-sweep, made loud). Re-run
    `python tools/verify_local.py --json CORRECTNESS_local_rN.json` after
    adding queries."""
    arts = _sweep_artifacts()
    assert arts, "no local sweep artifact committed"
    newest = arts[-1]
    rows = json.load(open(newest))
    missing = set(entry.queries()) - set(rows)
    assert not missing, (os.path.basename(newest), sorted(missing))
    bad = {k: v for k, v in rows.items() if not v.get("hash_match")}
    assert not bad, (os.path.basename(newest), bad)


def test_parity_index_names_every_registered_query():
    """PARITY.md's extension-surface index and count header are generated
    from the live registry — a query added without regenerating them was
    the r8 doc blemish (ADVICE r8 #1). Every registered name must appear in
    PARITY.md and the header count must equal the live registry size."""
    text = open(os.path.join(REPO, "PARITY.md")).read()
    qs = entry.queries()
    missing = [n for n in qs if f"`{n}`" not in text]
    assert not missing, missing
    assert f"({len(qs)} queries" in text, len(qs)
