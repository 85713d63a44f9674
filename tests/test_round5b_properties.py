"""Property tests for the round-5 second-wave operators.

Strategy (mirrors test_properties.py): Spark-backed paths get their
coverage from parity + deterministic units; here hypothesis drives the
PURE pieces — the skyline per-partition kernel (pandas-only) and the
SQL oracle builders, which are executed in in-process DuckDB against
independent pure-Python references. Together with the driver parity
gate (Spark ≡ oracle) this closes the triangle: Spark ≡ oracle ≡
reference.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from det_module_spark.operators.graph import k_core_sql
from det_module_spark.operators.hierarchy import closure_sql
from det_module_spark.operators.skyline import _emit_groups

# ---------------------------------------------------------------------------
# skyline kernel: _emit_groups == brute-force dominance filter
# ---------------------------------------------------------------------------

points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),   # x (ties likely)
        st.integers(min_value=0, max_value=8),   # y (ties likely)
    ),
    min_size=1,
    max_size=30,
)


def _brute(rows, extra):
    """ids of rows not dominated, treating ``extra`` as the best y
    among strictly-cheaper points outside the frame (run_max)."""
    out = []
    for i, (x, y) in enumerate(rows):
        dominated = extra is not None and extra >= y
        for (qx, qy) in rows:
            if qx <= x and qy >= y and (qx < x or qy > y):
                dominated = True
        if not dominated:
            out.append(i)
    return sorted(out)


@given(points, st.one_of(st.none(), st.integers(min_value=0, max_value=10)))
@settings(max_examples=200, deadline=None)
def test_emit_groups_matches_bruteforce(pts, run_max):
    pdf = pd.DataFrame(pts, columns=["x", "y"])
    pdf["rid"] = range(len(pdf))
    pdf = pdf.sort_values(["x", "y"], ascending=[True, False]).reset_index(
        drop=True
    )
    got = sorted(_emit_groups(pdf, "x", "y", run_max)["rid"].tolist())
    assert got == _brute(pts, run_max)


# ---------------------------------------------------------------------------
# closure_sql (BOM explosion oracle) == python sum-over-paths reference
# ---------------------------------------------------------------------------

# random forest: node i>0 gets parent in [0, i) with probability;
# guaranteed acyclic (parent < child)
forests = st.lists(
    st.tuples(st.integers(0, 14), st.integers(1, 3)),  # (parent-seed, qty)
    min_size=1,
    max_size=15,
)


def _ref_closure(edges):
    """Exact sum-over-paths closure by DFS path enumeration."""
    from collections import defaultdict

    out_edges = defaultdict(list)
    for p, c, q in edges:
        out_edges[p].append((c, q))
    res: dict[tuple[int, int, int], int] = {}

    def walk(anc, node, depth, qty):
        for (c, q) in out_edges[node]:
            key = (anc, c, depth + 1)
            res[key] = res.get(key, 0) + qty * q
            walk(anc, c, depth + 1, qty * q)

    for start in set(p for p, _, _ in edges) | set(
        c for _, c, _ in edges
    ):
        walk(start, start, 0, 1)
    return res


@given(forests)
@settings(max_examples=60, deadline=None)
def test_closure_sql_matches_path_enumeration(raw):
    # DAG-ify: parent = seed % child (strictly smaller), child = i+1
    edges = []
    for i, (pseed, qty) in enumerate(raw):
        child = i + 1
        edges.append((pseed % child, child, qty))
    values = ", ".join(f"({p}, {c}, {q})" for p, c, q in edges)
    cte = f"SELECT * FROM (VALUES {values}) AS t(parent, child, qty)"
    got = {
        (r[0], r[1], r[2]): r[3]
        for r in duckdb.sql(closure_sql(cte, max_depth=20)).fetchall()
    }
    assert got == _ref_closure(edges)


# ---------------------------------------------------------------------------
# k_core_sql == python peeling reference
# ---------------------------------------------------------------------------

graphs = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=25,
)


def _ref_k_core(edges, k, rounds):
    adj = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    cur = {(a, b) for a, b in adj} | {(b, a) for a, b in adj}
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, _b in cur:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in cur if a in keep and b in keep}
        if nxt == cur:
            break
        cur = nxt
    deg = {}
    for a, _b in cur:
        deg[a] = deg.get(a, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


@given(graphs, st.integers(min_value=1, max_value=4))
@settings(max_examples=60, deadline=None)
def test_k_core_sql_matches_peeling(edges, k):
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    cte = f"SELECT * FROM (VALUES {values}) AS t(src, dst)"
    got = {
        r[0]: r[1]
        for r in duckdb.sql(k_core_sql(cte, k=k, rounds=12)).fetchall()
    }
    assert got == _ref_k_core(edges, k, rounds=12)


# ---------------------------------------------------------------------------
# MMR greedy kernel == reference implementation
# ---------------------------------------------------------------------------

mmr_cases = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=-5, max_value=5),
    ),
    min_size=1,
    max_size=10,
    unique=True,
)


def _ref_mmr(ids, rel, vecs, k):
    """Plain-python MMR: argmax of rel − max-sim-to-selected with
    (score desc, id asc) ordering; first pick is pure relevance."""
    remaining = list(range(len(ids)))
    selected: list[int] = []
    out = []

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    for rank in range(1, min(k, len(ids)) + 1):
        best = None
        for i in remaining:
            if selected:
                score = rel[i] - max(dot(vecs[i], vecs[s]) for s in selected)
            else:
                score = rel[i]
            cand = (-score, ids[i], i)
            if best is None or cand < best:
                best = cand
        out.append((rank, ids[best[2]], -best[0]))
        selected.append(best[2])
        remaining.remove(best[2])
    return out


@given(mmr_cases, st.integers(min_value=1, max_value=6))
@settings(max_examples=150, deadline=None)
def test_mmr_greedy_kernel_matches_reference(pts, k):
    from det_module_spark.operators.mmr import greedy_kernel

    # candidate ids 0..n-1 (sorted, the kernel's contract); vec = the
    # 3-tuple; relevance = dot with a fixed query direction
    ids = list(range(len(pts)))
    vecs = [list(p) for p in pts]
    rel = [3 * p[0] - 2 * p[1] + p[2] for p in pts]
    assert greedy_kernel(ids, rel, vecs, k) == _ref_mmr(ids, rel, vecs, k)
