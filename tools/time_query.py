"""Time individual registry queries (noop write, warmup, min of N).

Usage: python tools/time_query.py [--sf DIR] [--reps N] q1 q2 ...
Prints one line per query: name, min, all reps. Used for the heavy-tier
measurements and ad-hoc A/Bs; bench.py remains the committed contract.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movievectorsearch_spark.plans import queries as Q
from movievectorsearch_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="mvs-time", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    Q.QUERIES["count_scan"]["spark"](spark, args.sf).collect()

    for name in args.names:
        fn = Q.QUERIES[name]["spark"]
        n = fn(spark, args.sf).count()  # warmup
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(reps):.3f}s reps={reps} rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
