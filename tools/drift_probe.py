"""Bench-drift + DECIMAL-tax diagnostic (round-4 judge item #7).

Round 4 measured a near-uniform ~10-15% wall-time drift across ALL
benched queries — including ones whose code did not change — and could
not attribute it. This probe bounds the two candidate causes with
committed numbers:

1. **Run-to-run variance**: run ``bench.py`` twice back-to-back on
   identical code at the given SF and report the per-query ratio
   distribution (median / p90 / max of run2/run1). If identical code
   drifts by ~X% between consecutive runs, an inter-round diff of ~X%
   needs no code explanation.

2. **DECIMAL(38,0) arithmetic tax**: time one representative widened
   query (``events_trend_slope`` — quadratic sufficient statistics
   Σx², Σxy in DECIMAL) against a structurally identical int64 twin
   (exact at test SFs; the DECIMAL form exists for 100 TB operand
   ranges, not for these). Reports median-of-N wall times for both
   forms and the ratio.

Writes ``DRIFT_r5.json`` at the repo root (committed alongside the
round notes — every claim in the notes names this artifact).

Usage: python tools/drift_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=REPO,
    )
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        d = json.load(f)
    return {"value": d["value"], "timings": d["queries"]}


def int64_trend_twin(spark, sf_dir):
    """events_trend_slope with the Σx², Σxy / determinant arithmetic in
    plain int64 — identical plan shape, no DECIMAL. Exact at test SFs
    (hours³·rate « 2^63); the registry form widens because 100 TB
    operand ranges overflow int64 under ANSI mode."""
    from pyspark.sql import functions as F

    from movievectorsearch_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("c"))
    bounds = hourly.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    hours = bounds.select(
        "h0",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    series = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        F.expr(
            "CAST(floor(unix_timestamp(hr)) AS BIGINT) div 3600 "
            "- CAST(floor(unix_timestamp(h0)) AS BIGINT) div 3600"
        ).alias("x"),
        F.coalesce("c", F.lit(0)).cast("bigint").alias("y"),
    )
    sums = series.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.round(
            F.when(den == 0, F.lit(None).cast("double")).otherwise(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / den.cast("double")
            ),
            6,
        ).alias("slope_per_hour"),
        F.round(F.col("sy") / F.col("n").cast("double"), 6).alias(
            "mean_per_hour"
        ),
    ).orderBy("event_type")


def time_df(build, reps: int) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    r1 = run_bench(sf_dir)
    r2 = run_bench(sf_dir)
    ratios = sorted(
        r2["timings"][n] / max(r1["timings"][n], 1e-3) for n in r1["timings"]
    )
    m = len(ratios)
    variance = {
        "total_run1": r1["value"],
        "total_run2": r2["value"],
        "total_ratio": round(r2["value"] / r1["value"], 3),
        "per_query_ratio_median": round(ratios[m // 2], 3),
        "per_query_ratio_p90": round(ratios[int(m * 0.9)], 3),
        "per_query_ratio_max": round(ratios[-1], 3),
        "per_query_ratio_min": round(ratios[0], 3),
    }

    from movievectorsearch_spark.plans import queries as Q
    from movievectorsearch_spark.session import get_spark

    spark = get_spark(app_name="mvs-drift", cpus=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    # verify the twin is value-identical before timing it
    reg = Q.QUERIES["events_trend_slope"]["spark"](spark, sf_dir)
    twin = int64_trend_twin(spark, sf_dir)
    assert [r.asDict() for r in reg.collect()] == [
        r.asDict() for r in twin.collect()
    ], "int64 twin diverged from the DECIMAL registry form"
    t_dec = time_df(
        lambda: Q.QUERIES["events_trend_slope"]["spark"](spark, sf_dir), reps
    )
    t_int = time_df(lambda: int64_trend_twin(spark, sf_dir), reps)
    tax = {
        "query": "events_trend_slope",
        "reps": reps,
        "decimal_times": t_dec,
        "int64_times": t_int,
        "decimal_median": statistics.median(t_dec),
        "int64_median": statistics.median(t_int),
        "decimal_over_int64": round(
            statistics.median(t_dec) / statistics.median(t_int), 3
        ),
    }
    out = {"sf_dir": sf_dir, "bench_variance": variance, "decimal_tax": tax}
    with open(os.path.join(REPO, "DRIFT_r5.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
