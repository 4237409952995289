"""Quiet-box min-of-3 timings for the heavy tier → HEAVY_QUIET_r{N}.json.

Round-10 judge item #1: the driver's bench artifact reads the heavy tier
through whatever contention window the box is in; three same-tree runs
of r9 spanned 60.5/75.6/95.9 s with untouched queries swinging 2.3x.
This companion artifact records, per heavy entry, a min-of-3 taken on a
quiet box after a --warm-registry-equivalent warmup, so the bench's
tier-normalized delta can be cross-checked against a low-noise floor.

Usage: python tools/heavy_quiet.py [--sf DIR] [--reps N]
Writes HEAVY_QUIET_r{N}.json (N = current round, max BENCH_r* + 1) with
per-query reps + min, the calibration-probe timings taken immediately
before and after the tier (same bracketing logic bench.py normalizes
by), and the git commit.
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

from movievectorsearch_spark.plans import queries as Q
from movievectorsearch_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


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
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="mvs-heavy-quiet",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    Q.QUERIES["count_scan"]["spark"](spark, args.sf).collect()

    pre = bench._timed_min(spark, args.sf, bench.CALIBRATION_QUERIES)
    queries = {}
    for name in bench.BENCH_HEAVY:
        reps = _time_one(spark, args.sf, name, args.reps)
        queries[name] = {"min": min(reps), "reps": reps}
        print(f"# {name}: min={min(reps):.3f}s reps={reps}",
              file=sys.stderr, flush=True)
    post = bench._timed_min(spark, args.sf, bench.CALIBRATION_QUERIES)

    commit = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    dirty = bool(subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain"],
        capture_output=True, text=True).stdout.strip())
    round_no = bench._round_number()
    path = os.path.join(REPO, f"HEAVY_QUIET_r{round_no:02d}.json")
    # merge with a prior same-commit run: the box shows intermittent
    # multi-second steal windows (reps swing 2-3x within one run), so
    # the committed floor accumulates reps across invocations and takes
    # the min — separate runs decorrelate from any one window
    runs = 1
    if os.path.exists(path):
        try:
            with open(path) as f:
                prior = json.load(f)
            if prior.get("commit") == commit:
                runs = prior.get("runs", 1) + 1
                for name, row in prior.get("queries", {}).items():
                    if name in queries:
                        queries[name]["reps"] = (
                            row["reps"] + queries[name]["reps"]
                        )
                        queries[name]["min"] = min(queries[name]["reps"])
        except (OSError, ValueError):
            pass
    out = {
        "commit": commit, "dirty": dirty, "sf": args.sf,
        "reps": args.reps, "runs": runs,
        "total_min_sec": round(sum(v["min"] for v in queries.values()), 3),
        "calibration_pre": pre, "calibration_post": post,
        "queries": queries,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"path": os.path.basename(path),
                      "total_min_sec": out["total_min_sec"]}))
    spark.stop()


if __name__ == "__main__":
    main()
