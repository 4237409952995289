"""Bench coverage policy (round-6 judge items #1/#4): every registry
query is in exactly one of BENCH_QUERIES / BENCH_HEAVY / BENCH_EXCLUDED,
so a new query cannot be silently unmeasured — the iterative-CC family
escaped every perf artifact for five rounds exactly this way."""

import importlib.util
import os

from movievectorsearch_spark.plans import queries as Q

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_every_query_is_benched_heavy_or_excluded_with_reason():
    benched = set(bench.BENCH_QUERIES)
    heavy = set(bench.BENCH_HEAVY)
    excluded = set(bench.BENCH_EXCLUDED)
    registry = set(Q.QUERIES)
    assert benched & heavy == set()
    assert benched & excluded == set()
    assert heavy & excluded == set()
    missing = registry - benched - heavy - excluded
    assert missing == set(), f"unclassified queries: {sorted(missing)}"
    stale = (benched | heavy | excluded) - registry
    assert stale == set(), f"classified but not registered: {sorted(stale)}"


def test_no_duplicates_within_tiers():
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))
    assert len(bench.BENCH_HEAVY) == len(set(bench.BENCH_HEAVY))


def test_exclusion_reasons_are_substantive():
    for name, reason in bench.BENCH_EXCLUDED.items():
        assert isinstance(reason, str) and len(reason) > 20, name


def test_heavy_tier_is_the_iterative_family():
    # the heavy tier exists for convergence-loop queries; anything using
    # the iterative operators must be in it (or benched), never excluded
    import movievectorsearch_spark.plans.fingerprint as FP

    iter_mods = {
        "movievectorsearch_spark.operators.cluster",
        "movievectorsearch_spark.operators.iterative",
    }
    for name in bench.BENCH_EXCLUDED:
        fn = FP._inner_fn(Q.QUERIES[name]["spark"])
        fs, cs, mods = {}, {}, set()
        FP._walk(fn, fs, cs, mods)
        closure = set(FP._module_closure(mods))
        assert not (closure & iter_mods), (
            f"{name} reaches {closure & iter_mods} but is excluded from "
            "both bench tiers"
        )


def test_calibration_probes_are_plan_stable():
    """Round-10 judge item #7: no calibration probe's implementation
    fingerprint may change within a round — a probe plan change would
    launder its own speedup into the machine-drift ratio. Compares
    against the frozen QUERY_FPRINTS_HEAD.json snapshot; if this fails,
    either revert the probe's module edit or swap the probe for a
    plan-stable query AND document the normalization-chain break in the
    round notes."""
    import json

    import movievectorsearch_spark.plans.fingerprint as FP

    with open(FP.HEAD_PATH) as f:
        head = json.load(f)
    cur = FP.query_fingerprints(Q.QUERIES)
    drifted = [
        n for n in bench.CALIBRATION_QUERIES
        if n in head and head[n] != cur.get(n)
    ]
    assert drifted == [], (
        f"calibration probes changed plan this round: {drifted} — "
        "swap them for plan-stable queries or revert the module edit"
    )
    missing = [n for n in bench.CALIBRATION_QUERIES if n not in Q.QUERIES]
    assert missing == []


def _detail(queries, heavy, cal, cal_mid, cal_end, sf=0.1):
    return {
        "sf": sf,
        "queries": queries,
        "heavy": heavy,
        "calibration": cal,
        "calibration_mid": cal_mid,
        "calibration_end": cal_end,
    }


def test_normalized_delta_uses_bracketing_probe_pair(tmp_path):
    """The heavy tier runs between the mid and end probes; its delta
    must be normalized by THAT pair, not the headline median (round-10
    judge item #1). Machine runs 2x slow from mid onward: headline
    (head+mid bracket → median 1.5) and heavy (mid+end → 2.0) see
    different ratios."""
    import json

    probes = {"p1": 1.0}
    prev = _detail({"a": 10.0}, {"h": 10.0}, probes, probes, probes)
    with open(tmp_path / "BENCH_DETAIL_r09.json", "w") as f:
        json.dump(prev, f)
    cur = _detail({"a": 15.0}, {"h": 20.0},
                  {"p1": 1.0}, {"p1": 2.0}, {"p1": 2.0})
    out = bench._normalized_delta(cur, str(tmp_path), 10)
    assert out["common"]["tier_ratio"] == 1.5
    assert out["common"]["tier_probe_pair"] == ["head", "mid"]
    assert out["common"]["cur_total_normalized_sec"] == 10.0
    assert out["common"]["normalized_delta_sec"] == 0.0
    assert out["heavy"]["tier_ratio"] == 2.0
    assert out["heavy"]["tier_probe_pair"] == ["mid", "end"]
    assert out["heavy"]["cur_total_normalized_sec"] == 10.0
    assert out["heavy"]["normalized_delta_sec"] == 0.0


def test_top_lists_trim_at_zero_crossing(tmp_path):
    """An all-regression tier must report NO improvements (round-9
    heavy block listed +2.07 in both lists)."""
    import json

    probes = {"p1": 1.0}
    prev = _detail({f"q{i}": 1.0 for i in range(3)},
                   {"h1": 1.0, "h2": 1.0}, probes, probes, probes)
    with open(tmp_path / "BENCH_DETAIL_r09.json", "w") as f:
        json.dump(prev, f)
    cur = _detail(
        {"q0": 2.0, "q1": 3.0, "q2": 0.5},   # two regress, one improves
        {"h1": 2.0, "h2": 4.0},               # all regress
        probes, probes, probes,
    )
    out = bench._normalized_delta(cur, str(tmp_path), 10)
    assert set(out["common"]["top_improvements"]) == {"q2"}
    assert set(out["common"]["top_regressions"]) == {"q0", "q1"}
    assert out["heavy"]["top_improvements"] == {}
    assert set(out["heavy"]["top_regressions"]) == {"h1", "h2"}
