"""Audit: every partition-less Window (the `WindowExec: No Partition
Defined` sites) must have provably bounded input — i.e. every path from
the Window node down to a parquet Scan passes through an aggregate or a
limit. Used by tests/test_plans.py; runnable standalone over the whole
registry to keep the sweep-log warnings adjudicated."""

from __future__ import annotations

import contextlib
import io
import re

_BOUNDING = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"TakeOrderedAndProject|GlobalLimit|CollectLimit"
)
_SCAN = re.compile(r"Scan parquet|Scan csv|Scan json|Scan text|Scan orc")


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _top_level_groups(s: str) -> list[str]:
    """Split `[a], [b], [c]` into top-level bracket groups."""
    groups, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _partitionless_window_ids(plan: str) -> list[int]:
    """Window node ids whose spec carries no partition columns.

    ``windowspecdefinition(part..., order..., frame)`` lists partition
    columns first (bare refs), then sort orders (``col ASC/DESC ...``):
    a spec whose FIRST argument is already a sort order has no
    partition spec — the `WindowExec: No Partition Defined` site."""
    out = []
    # WindowGroupLimit is excluded: it is the rank-pushdown LIMIT
    # (bounded per-heap state, TakeOrdered-like), not a partition sort.
    for m in re.finditer(
        r"\((\d+)\) Window\s*\nInput[^\n]*\nArguments: ([^\n]*)",
        plan,
    ):
        for spec in re.finditer(
            r"windowspecdefinition\(([^,()]*(?:\([^)]*\))?[^,()]*),", m.group(2)
        ):
            first_arg = spec.group(1)
            if (
                " ASC" in first_arg
                or " DESC" in first_arg
                or first_arg.startswith("specifiedwindowframe")
            ):
                out.append(int(m.group(1)))
                break
    return out


def _parse_tree(plan: str):
    """-> {node_id: (depth, [child_ids], label)} from the tree section.

    Depth comes from the position of EITHER branch marker: ``+-``
    (right/only child) or ``:-`` (a join's left child) — the round-3
    advisor showed that reading only ``+-`` drops join probe-side
    subtrees, making the audit pass vacuously on windows fed by a
    join. The root line has no marker; its children sit at column 0,
    so it gets depth -3 (one indent step above)."""
    nodes = {}
    order = []
    for line in plan.splitlines():
        if not line.strip():
            break  # tree section ends at the first blank line
        m = re.search(r"([*+:]-\s*|^)(\S[^(]*)\((\d+)\)\s*$", line)
        if not m:
            continue
        nid = int(m.group(3))
        marker = max(line.find("+-"), line.find(":-"))
        depth = marker if marker >= 0 else -3
        nodes[nid] = (depth, [], m.group(2).strip())
        order.append(nid)
    # children: next nodes with depth == d+3 until depth <= d
    for i, nid in enumerate(order):
        d = nodes[nid][0]
        for j in range(i + 1, len(order)):
            dj = nodes[order[j]][0]
            if dj <= d:
                break
            if dj == d + 3:
                nodes[nid][1].append(order[j])
    return nodes


def _scan_reachable_unbounded(nodes, nid) -> bool:
    """True if some path from nid reaches a Scan with no aggregate or
    limit in between."""
    _, children, label = nodes[nid]
    if _SCAN.search(label):
        return True
    if _BOUNDING.search(label):
        return False
    return any(_scan_reachable_unbounded(nodes, c) for c in children)


def unbounded_partitionless_windows(df) -> list[str]:
    """Violations: partition-less Window nodes whose input can be
    corpus-sized (a Scan reachable without crossing an agg/limit)."""
    plan = _formatted(df)
    nodes = _parse_tree(plan)
    bad = []
    for wid in _partitionless_window_ids(plan):
        if wid not in nodes:
            continue
        _, children, label = nodes[wid]
        if any(_scan_reachable_unbounded(nodes, c) for c in children):
            bad.append(f"({wid}) {label}")
    return bad


def main() -> None:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from movievectorsearch_spark.plans import queries as Q
    from movievectorsearch_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="window-audit", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    n_bad = 0
    for name, spec in Q.QUERIES.items():
        try:
            df = spec["spark"](spark, sf_dir)
            bad = unbounded_partitionless_windows(df)
        except Exception as e:  # noqa: BLE001 — audit keeps going
            print(f"ERR  {name}: {e}")
            continue
        if bad:
            n_bad += 1
            print(f"BAD  {name}: {bad}")
    print(f"done: {n_bad} queries with unbounded partition-less windows")


if __name__ == "__main__":
    main()
