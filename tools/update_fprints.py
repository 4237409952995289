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


def _round_of_commit(rev: str) -> int:
    """Round a commit belongs to: max CORRECTNESS_r{N} present in that
    commit's tree + 1 (a round's code commits land after the previous
    round's driver artifacts and before its own)."""
    import subprocess

    out = subprocess.run(
        ["git", "-C", REPO, "ls-tree", "--name-only", rev],
        capture_output=True, text=True,
    ).stdout
    rounds = [int(m.group(1))
              for m in re.finditer(r"CORRECTNESS_r(\d+)\.json", out)]
    return max(rounds, default=0) + 1


def staleness() -> dict:
    """STALENESS.json (round-10 judge item #3): at 254 registry entries
    vs a 50-slot driver window, window rotation is the main per-round
    audit burden — this report answers, per entry: how many rounds since
    the driver last value-checked it, when its behavior last changed,
    and which artifact (driver / hermetic / parity) vouches for it most
    recently, so the VERDICT reads an artifact instead of reconstructing
    rotation by hand."""
    import subprocess

    cur_round = _round_of_commit("HEAD")

    # last driver-green round per query, from every CORRECTNESS artifact
    driver_green: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in _load(path).items():
            if isinstance(row, dict) and _green(row):
                driver_green[name] = max(driver_green.get(name, 0), rnd)

    # behavior-change history from the committed HEAD snapshots: each
    # freeze records the fingerprints the next driver run will test
    revs = subprocess.run(
        ["git", "-C", REPO, "log", "--reverse", "--format=%H", "--",
         "QUERY_FPRINTS_HEAD.json"],
        capture_output=True, text=True,
    ).stdout.split()
    last_change: dict[str, int | None] = {}
    prev_map: dict[str, str] = {}
    first_snap = True
    for rev in revs:
        blob = subprocess.run(
            ["git", "-C", REPO, "show", f"{rev}:QUERY_FPRINTS_HEAD.json"],
            capture_output=True, text=True,
        ).stdout
        try:
            snap = json.loads(blob)
        except ValueError:
            continue
        rnd = _round_of_commit(rev)
        for name, fp in snap.items():
            if first_snap:
                # r10 ADVICE: the first freeze is a baseline, not a
                # change — diffing it against an empty prev_map stamped
                # every pre-existing entry with the first-freeze round.
                # Entries whose fingerprint never moves after the seed
                # snapshot report None (= unknown / no observed change).
                last_change.setdefault(name, None)
            elif prev_map.get(name) != fp:
                last_change[name] = rnd
        prev_map = snap
        first_snap = False
    # the working tree itself: anything whose fingerprint differs from
    # the latest committed snapshot changed THIS round
    cur_fps = FP.query_fingerprints(Q.QUERIES)
    for name, fp in cur_fps.items():
        if prev_map.get(name) != fp:
            last_change[name] = cur_round

    # non-driver value checks: hermetic (sf0.001 full sweep) and parity
    # (sf0.1 full sweep) artifacts, attributed to their tree's round
    extra_checks: dict[str, tuple[str, int]] = {}
    for fname, label in (("HERMETIC_SF001.json", "hermetic"),
                         ("PARITY_SF01.json", "parity")):
        art = _load(os.path.join(REPO, fname))
        if not art:
            continue
        commit = art.get("commit", "HEAD")
        try:
            rnd = _round_of_commit(commit)
        except Exception:
            rnd = cur_round
        names = (art.get("queries") or
                 {n: {"status": "pass"} for n in art.get("order", [])})
        for name, row in names.items():
            ok = (row.get("status") == "pass") if isinstance(row, dict) else True
            if ok and rnd >= extra_checks.get(name, ("", -1))[1]:
                extra_checks[name] = (label, rnd)

    # "stale" = the real recheck front: current fingerprint differs from
    # the stamp at last driver-green (fingerprint.changed_since_green) —
    # NOT the snapshot history, whose first freeze (round 7) would mark
    # every older-green entry as changed-at-7
    front = set(FP.changed_since_green(Q.QUERIES))

    entries: dict[str, dict] = {}
    for name in Q.QUERIES:
        dg = driver_green.get(name)
        checks = []
        if dg is not None:
            checks.append(("driver", dg))
        if name in extra_checks:
            checks.append(extra_checks[name])
        latest = max(checks, key=lambda kv: kv[1]) if checks else None
        lc = last_change.get(name)
        entries[name] = {
            "last_driver_green_round": dg,
            "rounds_since_driver_green": (cur_round - dg) if dg else None,
            "last_behavior_change_round": lc,
            "stale": name in front,
            "last_value_checked": (
                {"artifact": latest[0], "round": latest[1]} if latest else None
            ),
        }
    ages = [e["rounds_since_driver_green"] for e in entries.values()
            if e["rounds_since_driver_green"] is not None]
    report = {
        "round": cur_round,
        "n_queries": len(entries),
        "max_rounds_since_driver_green": max(ages, default=None),
        "n_never_driver_green": sum(
            1 for e in entries.values()
            if e["last_driver_green_round"] is None),
        "n_stale": len(front),
        "stale_names": sorted(front),
        "age_histogram": {
            str(a): ages.count(a) for a in sorted(set(ages))},
        "queries": entries,
    }
    return report


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
    ap.add_argument("--staleness", action="store_true",
                    help="write STALENESS.json (per-entry driver-green "
                         "age / last behavior change / last value check)")
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

    if args.staleness:
        report = staleness()
        path = os.path.join(REPO, "STALENESS.json")
        _save(path, report)
        print(f"wrote STALENESS.json: round={report['round']} "
              f"max_age={report['max_rounds_since_driver_green']} "
              f"stale={report['n_stale']} "
              f"never_green={report['n_never_driver_green']}")

    front = FP.changed_since_green(Q.QUERIES)
    print(f"changed-since-green front ({len(front)}):")
    for n in front:
        print(" ", n)


if __name__ == "__main__":
    main()
