"""Unit tests for the quiet-floor cross-run merge protocol
(tools/heavy_quiet.py merge_prior) — the committed floor is the
instrument that adjudicates driver-vs-builder bench discrepancies
(VERDICT r10 task #1), so its merge semantics are load-bearing: a
same-commit prior must only TIGHTEN the floor; a cross-commit prior
must be discarded (its floors describe another tree)."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "heavy_quiet",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "heavy_quiet.py"),
)
hq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(hq)


def test_same_commit_merge_tightens_and_accumulates():
    queries = {"a": {"min": 5.0, "reps": [5.0, 6.0]}}
    prior = {
        "commit": "c1", "runs": 1, "reps_per_run": [3],
        "calibration_checks": [{"after_n": 0, "probes": {"p": 1.0}}],
        "queries": {"a": {"min": 4.0, "reps": [4.0, 7.0, 8.0]},
                    "only_prior": {"min": 2.0, "reps": [2.0]}},
    }
    runs, reps_per_run, prior_checks = hq.merge_prior(queries, prior, "c1", 2)
    assert runs == 2
    assert reps_per_run == [3, 2]  # r10 ADVICE: per-invocation history
    assert queries["a"]["min"] == 4.0
    assert sorted(queries["a"]["reps"]) == [4.0, 5.0, 6.0, 7.0, 8.0]
    # a query measured only in the prior run is retained, not dropped
    assert queries["only_prior"]["min"] == 2.0
    # the prior invocation's probe brackets are preserved for audit
    assert prior_checks == [[{"after_n": 0, "probes": {"p": 1.0}}]]


def test_cross_commit_prior_without_fingerprints_is_discarded():
    queries = {"a": {"min": 9.0, "reps": [9.0], "fp": "f_a"}}
    prior = {"commit": "old", "runs": 5, "reps_per_run": [3] * 5,
             "queries": {"a": {"min": 1.0, "reps": [1.0]}}}
    runs, reps_per_run, prior_checks = hq.merge_prior(
        queries, prior, "new", 3, {"a": "f_a"})
    assert (runs, reps_per_run, prior_checks) == (1, [3], [])
    # the unverifiable 1.0s floor from another tree must NOT leak in
    assert queries["a"]["min"] == 9.0 and queries["a"]["reps"] == [9.0]


def test_cross_commit_merge_is_keyed_on_plan_fingerprint():
    """A floor is a property of the implementation, not the commit:
    an infra-only commit (bench/tools) must not discard the floor of
    an untouched query, while a query whose plan changed must not
    inherit the old one — per-row fingerprint gate, same principle as
    the r10 ADVICE fix to SCALING_CC.json."""
    queries = {
        "same": {"min": 9.0, "reps": [9.0], "fp": "f1"},
        "changed": {"min": 9.0, "reps": [9.0], "fp": "f2_new"},
    }
    prior = {"commit": "old", "runs": 2, "reps_per_run": [3, 3],
             "queries": {
                 "same": {"min": 4.0, "reps": [4.0], "fp": "f1"},
                 "changed": {"min": 1.0, "reps": [1.0], "fp": "f2_old"},
                 "retained": {"min": 2.0, "reps": [2.0], "fp": "f3"},
             }}
    cur_fps = {"same": "f1", "changed": "f2_new", "retained": "f3"}
    runs, reps_per_run, _ = hq.merge_prior(queries, prior, "new", 3, cur_fps)
    assert runs == 3 and reps_per_run == [3, 3, 3]
    assert queries["same"]["min"] == 4.0          # unchanged impl: merged
    assert queries["changed"]["min"] == 9.0       # changed impl: dropped
    assert queries["changed"]["reps"] == [9.0]
    assert queries["retained"]["min"] == 2.0      # unchanged, not re-run


def test_legacy_pre_post_artifact_upgrades():
    # pre-r11 artifacts (HEAVY_QUIET_r10 shape) carried a single
    # "reps" int and calibration_pre/post maps — both must survive a
    # merge in the new shape
    queries = {"a": {"min": 3.0, "reps": [3.0]}}
    prior = {"commit": "c1", "runs": 1, "reps": 3,
             "calibration_pre": {"p": 1.0}, "calibration_post": {"p": 1.1},
             "queries": {"a": {"min": 2.5, "reps": [2.5, 3.5, 4.0]}}}
    runs, reps_per_run, prior_checks = hq.merge_prior(queries, prior, "c1", 1)
    assert runs == 2 and reps_per_run == [3, 1]
    assert queries["a"]["min"] == 2.5
    assert prior_checks == [[
        {"after_n": 0, "probes": {"p": 1.0}},
        {"after_n": -1, "probes": {"p": 1.1}},
    ]]


def test_tier_lists_resolve():
    # the tool's tier map must point at real bench lists
    assert hq.TIERS["heavy"][1]() == hq.bench.BENCH_HEAVY
    assert hq.TIERS["headline"][1]() == hq.bench.QUIET_FLOOR_QUERIES
