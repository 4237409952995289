"""Quiet-box min-of-N floors per tier → {HEAVY_}QUIET_r{N}.json.

Round-10 judge item #1 (heavy) and round-11 task #1 (headline): the
driver's bench artifact reads each tier through whatever contention
window the box is in; three same-tree runs of r9's heavy tier spanned
60.5/75.6/95.9 s, and r10's headline tier read 262.4 s (driver) vs
215.7 s (same-tree quiet run) with the gap concentrated 1.7-2.5x in
Python-worker queries. This companion artifact records, per entry, a
min-of-N taken on a quiet box after warmup, min-merged across
invocations at the same commit, so the bench's normalized deltas can
be cross-checked against a low-noise floor (bench._floor_cross_check
stamps the comparison into BENCH_DETAIL).

Usage:
    python tools/heavy_quiet.py [--tier heavy|headline] [--sf DIR]
                                [--reps N] [--queries name...]

--tier heavy    (default) bench.BENCH_HEAVY   → HEAVY_QUIET_r{N}.json
--tier headline bench.QUIET_FLOOR_QUERIES     → QUIET_r{N}.json
--queries       explicit subset (rows merge into the tier artifact)

N = current round (max BENCH_r* + 1). Each invocation times the
calibration probes before the tier, after every --probe-every entries,
and after the tier (a steal window mid-run is visible in the artifact,
not averaged away), then min-merges per-query reps with a prior
same-commit artifact — separate runs decorrelate from any one
contention window, so the committed floor only tightens.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movievectorsearch_spark.plans import fingerprint as FP
from movievectorsearch_spark.plans import queries as Q
from movievectorsearch_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

TIERS = {
    "heavy": ("HEAVY_QUIET_r{:02d}.json", lambda: bench.BENCH_HEAVY),
    "headline": ("QUIET_r{:02d}.json", lambda: bench.QUIET_FLOOR_QUERIES),
}


def merge_prior(queries: dict, prior: dict, commit: str, reps_arg: int,
                cur_fps: dict | None = None) -> tuple[int, list[int], list]:
    """Cross-run min-merge (pure; unit-tested in tests/test_quiet_floor.py).

    A prior row is COMPATIBLE — and min-merges (reps lists concatenate,
    min recomputed over the union; separate invocations decorrelate
    from any one steal window, so the committed floor only tightens) —
    when either the whole prior artifact is from the same commit, or
    the row's recorded plan fingerprint (plans/fingerprint.py) equals
    the query's current one: a floor is a property of the
    IMPLEMENTATION, not of the commit hash, so infra-only commits
    (bench/tools/tests) must not discard it — the same principle the
    r10 ADVICE prescribed for SCALING_CC.json, where a stale floor
    from CHANGED code masking a regression is the failure mode both
    gates exist to prevent. Incompatible rows are dropped. Queries
    present only in the prior are retained when compatible. Mutates
    `queries`; returns (runs, reps_per_run, prior_checks) — history
    accumulates only when at least one prior row merged."""
    cur_fps = cur_fps or {}
    same_commit = prior.get("commit") == commit
    merged_any = False
    for name, row in prior.get("queries", {}).items():
        row_fp = row.get("fp")
        compatible = same_commit or (
            row_fp is not None and row_fp == cur_fps.get(name))
        if not compatible:
            continue
        if name in queries:
            queries[name]["reps"] = row["reps"] + queries[name]["reps"]
            queries[name]["min"] = min(queries[name]["reps"])
        else:
            queries[name] = row
        merged_any = True
    if not merged_any:
        return 1, [reps_arg], []
    runs = prior.get("runs", 1) + 1
    reps_per_run = (prior.get("reps_per_run")
                    or [prior.get("reps", 0)]) + [reps_arg]
    prior_checks = prior.get("calibration_checks_prior", [])
    if prior.get("calibration_checks"):
        prior_checks = prior_checks + [prior["calibration_checks"]]
    elif prior.get("calibration_pre"):
        prior_checks = prior_checks + [[
            {"after_n": 0, "probes": prior["calibration_pre"]},
            {"after_n": -1, "probes": prior["calibration_post"]},
        ]]
    return runs, reps_per_run, prior_checks


def _time_one(spark, sf_dir: str, name: str, reps: int) -> list[float]:
    fn = Q.QUERIES[name]["spark"]
    fn(spark, sf_dir).count()  # warmup / build
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", choices=sorted(TIERS), default="heavy")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--probe-every", type=int, default=6,
                    help="calibration-probe pass after every N entries")
    ap.add_argument("--queries", nargs="*", default=None,
                    help="explicit query subset (default: the tier list)")
    args = ap.parse_args()

    fname_tpl, default_names = TIERS[args.tier]
    names = args.queries or default_names()
    unknown = [n for n in names if n not in Q.QUERIES]
    if unknown:
        sys.exit(f"unknown query name(s): {unknown}")

    spark = get_spark(app_name="mvs-quiet-floor",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    Q.QUERIES["count_scan"]["spark"](spark, args.sf).collect()

    def _probe_check(after_n: int) -> dict:
        # fresh-read probe protocol (bench._timed_probes): probes time
        # the machine, not the round-12 plan-construction memo
        probes = bench._timed_probes(spark, args.sf)
        row = {"after_n": after_n, "probes": probes,
               "total": round(sum(probes.values()), 3)}
        print(f"# probes after {after_n}: {row['total']:.3f}s",
              file=sys.stderr, flush=True)
        return row

    cur_fps = FP.query_fingerprints(Q.QUERIES)
    checks = [_probe_check(0)]
    queries = {}
    for i, name in enumerate(names, start=1):
        reps = _time_one(spark, args.sf, name, args.reps)
        queries[name] = {"min": min(reps), "reps": reps,
                         "fp": cur_fps.get(name)}
        print(f"# {name}: min={min(reps):.3f}s reps={reps}",
              file=sys.stderr, flush=True)
        if i % args.probe_every == 0 and i < len(names):
            checks.append(_probe_check(i))
    checks.append(_probe_check(len(names)))

    commit = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    # tracked-file changes only: the tool's own (untracked) artifact
    # from a prior invocation must not mark the measurement dirty
    dirty = bool(subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain", "--untracked-files=no"],
        capture_output=True, text=True).stdout.strip())
    round_no = bench._round_number()
    path = os.path.join(REPO, fname_tpl.format(round_no))
    # merge with a prior same-commit run: the box shows intermittent
    # multi-second steal windows (reps swing 2-3x within one run), so
    # the committed floor accumulates reps across invocations and takes
    # the min — separate runs decorrelate from any one window. r10
    # ADVICE (low): per-invocation rep counts are kept as reps_per_run
    # (the old single top-level "reps" field understated how many reps
    # produced each min after a merge).
    runs, reps_per_run, prior_checks = 1, [args.reps], []
    if os.path.exists(path):
        try:
            with open(path) as f:
                prior = json.load(f)
            runs, reps_per_run, prior_checks = merge_prior(
                queries, prior, commit, args.reps, cur_fps)
        except (OSError, ValueError):
            pass
    out = {
        "commit": commit, "dirty": dirty, "sf": args.sf,
        "tier": args.tier, "reps_per_run": reps_per_run, "runs": runs,
        "total_min_sec": round(sum(v["min"] for v in queries.values()), 3),
        "calibration_checks": checks,
        "calibration_checks_prior": prior_checks,
        "queries": queries,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"path": os.path.basename(path),
                      "tier": args.tier, "runs": runs,
                      "total_min_sec": out["total_min_sec"]}))
    spark.stop()


if __name__ == "__main__":
    main()
