"""Maintain the query-fingerprint artifacts (the automated recheck loop).

Round lifecycle (see plans/fingerprint.py for the design):

* Round START (a new CORRECTNESS_r{N}.json just landed):

      python tools/update_fprints.py --stamp

  For every query the driver just proved green, copy its fingerprint
  from QUERY_FPRINTS_HEAD.json (the frozen snapshot of what the driver
  actually ran) into QUERY_FPRINTS.json with the proving round.
  Queries NOT re-stamped stay fronted — forgetting this step can only
  cause extra re-proving, never a stale green.

* Round END (final code commit, before the driver runs):

      python tools/update_fprints.py --freeze

  Regenerate QUERY_FPRINTS_HEAD.json from the current tree.

* Bootstrap / explicit stamping (used once in round 7 to initialize the
  artifact from the round-6 tree's fingerprints + the cumulative r1-r6
  green union; kept for repair work):

      python tools/update_fprints.py --stamp-from FPRINT_JSON --round N name...

Prints the resulting front (changed-since-green) so the effect is
visible immediately.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movievectorsearch_spark.plans import fingerprint as FP
from movievectorsearch_spark.plans import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_correctness() -> tuple[int, dict]:
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    best, best_round = None, -1
    for p in paths:
        m = re.search(r"_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_round:
            best_round, best = int(m.group(1)), p
    if best is None:
        raise SystemExit("no CORRECTNESS_r*.json found")
    with open(best) as f:
        return best_round, json.load(f)


def _green(row: dict) -> bool:
    if row.get("err"):
        return False
    if "hash_match" in row and row["hash_match"] is not None:
        return bool(row["hash_match"])
    return bool(row.get("rows_match")) and bool(row.get("schema_match"))


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save(path: str, data: dict) -> None:
    with open(path, "w") as f:
        json.dump(dict(sorted(data.items())), f, indent=1)
        f.write("\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--freeze", action="store_true",
                    help="write QUERY_FPRINTS_HEAD.json from current tree")
    ap.add_argument("--stamp", action="store_true",
                    help="stamp greens from latest CORRECTNESS via HEAD snapshot")
    ap.add_argument("--stamp-from", metavar="JSON",
                    help="stamp the named queries from this fingerprint map")
    ap.add_argument("--round", type=int, default=0,
                    help="proving round recorded with --stamp-from")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.stamp:
        rnd, rows = _latest_correctness()
        head = _load(FP.HEAD_PATH)
        stamps = _load(FP.STAMP_PATH)
        n = 0
        for name, row in rows.items():
            if name in head and _green(row):
                stamps[name] = {"fp": head[name], "round": rnd}
                n += 1
        _save(FP.STAMP_PATH, stamps)
        print(f"stamped {n} greens from CORRECTNESS_r{rnd:02d}")

    if args.stamp_from:
        src = _load(args.stamp_from)
        stamps = _load(FP.STAMP_PATH)
        names = args.names or list(src)
        for name in names:
            if name in src:
                stamps[name] = {"fp": src[name], "round": args.round}
        _save(FP.STAMP_PATH, stamps)
        print(f"stamped {len(names)} from {args.stamp_from}")

    if args.freeze:
        fps = FP.query_fingerprints(Q.QUERIES)
        bad = [n for n, v in fps.items() if v == "fingerprint-error"]
        if bad:
            print(f"WARNING fingerprint-error for: {bad}")
        _save(FP.HEAD_PATH, fps)
        print(f"froze {len(fps)} fingerprints to QUERY_FPRINTS_HEAD.json")

    front = FP.changed_since_green(Q.QUERIES)
    print(f"changed-since-green front ({len(front)}):")
    for n in front:
        print(" ", n)


if __name__ == "__main__":
    main()
