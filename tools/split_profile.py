"""Split each registry query's noop-sink wall time into build / plan / exec.

Usage: python tools/split_profile.py [--sf DIR] [--reps N] [--out FILE]
       [--tier headline|heavy] [name ...]

The bench's _timed_min times builder-call + analysis/optimization +
execution as one number (that IS the serve cost: a fresh plan is
constructed per invocation). This tool decomposes it so the round-12
constant-tail pass (r11 verdict task #2) can see WHERE each sub-second
query's time goes:

* build — the registry builder call: py4j plan construction, plus any
  driver-blocking model-build collects the builder performs;
* plan  — forcing queryExecution().executedPlan(): analysis, optimizer,
  physical planning (driver-side, single-threaded);
* exec  — the noop write of the already-planned DataFrame. NOTE: the
  noop write re-plans the write query itself, so `exec` still carries
  one planning pass; `plan` isolates the marginal cost of a SECOND
  pass, i.e. a lower bound on planner cost, not its total.

Component-wise min over reps (same rationale as _timed_min: the box has
multi-second steal windows; min decorrelates). Suite-like warmth via
the calibration probes first, same as tools/time_query.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movievectorsearch_spark.plans import queries as Q
from movievectorsearch_spark.session import get_spark


def _load_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        ),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def split_times(spark, sf_dir: str, name: str) -> tuple[float, float, float]:
    fn = Q.QUERIES[name]["spark"]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t1 = time.perf_counter()
    df._jdf.queryExecution().executedPlan()
    t2 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    return t1 - t0, t2 - t1, t3 - t2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tier", default=None, choices=[None, "headline", "heavy"])
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    bench = _load_bench()
    names = list(args.names)
    if args.tier == "headline":
        names = list(bench.BENCH_QUERIES)
    elif args.tier == "heavy":
        names = list(bench.BENCH_HEAVY)
    if not names:
        ap.error("give query names or --tier")

    spark = get_spark(app_name="mvs-split",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    # suite-like warmth (JIT, page cache, Python worker pool)
    for _ in range(2):
        for probe in bench.CALIBRATION_QUERIES:
            Q.QUERIES[probe]["spark"](spark, args.sf).write.format(
                "noop").mode("overwrite").save()

    out: dict[str, dict[str, float]] = {}
    for _ in range(args.reps):
        for name in names:
            b, p, e = split_times(spark, args.sf, name)
            cur = out.setdefault(
                name, {"build": b, "plan": p, "exec": e})
            cur["build"] = min(cur["build"], b)
            cur["plan"] = min(cur["plan"], p)
            cur["exec"] = min(cur["exec"], e)

    rows = sorted(out.items(), key=lambda kv: -(kv[1]["build"] + kv[1]["plan"]))
    tb = tp = te = 0.0
    for name, c in rows:
        tb += c["build"]; tp += c["plan"]; te += c["exec"]
        print(f"{c['build']:7.3f} {c['plan']:7.3f} {c['exec']:7.3f} "
              f"{c['build'] + c['plan'] + c['exec']:7.3f}  {name}")
    print(f"{tb:7.3f} {tp:7.3f} {te:7.3f} {tb + tp + te:7.3f}  TOTAL "
          f"(build {100 * tb / (tb + tp + te):.0f}% / plan "
          f"{100 * tp / (tb + tp + te):.0f}% / exec "
          f"{100 * te / (tb + tp + te):.0f}%)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({k: {m: round(v, 4) for m, v in c.items()}
                       for k, c in out.items()}, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
