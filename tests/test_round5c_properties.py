"""Property tests for the round-5 continuation-session graph oracles.

Same strategy as test_round5b_properties.py: hypothesis drives the
SQL oracle BUILDERS in in-process DuckDB against independent
pure-Python references. The driver parity gate separately proves
Spark ≡ oracle on the real tables, so green here closes
Spark ≡ oracle ≡ reference for the family.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from det_module_spark.operators.graph import (
    adamic_adar_sql,
    random_walks_sql,
    sssp_sql,
)

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


def _run(sql: str, frames: dict) -> pd.DataFrame:
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con.sql(sql).df()


# ---------------------------------------------------------------- sssp


def _bellman_ford(edges, sources, rounds):
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        new = dict(dist)
        for u, v, w in edges:
            if u in dist and dist[u] + w < new.get(v, math.inf):
                new[v] = dist[u] + w
        dist = new
    return dist


@settings(max_examples=40, deadline=None)
@given(edges_strategy, st.integers(min_value=1, max_value=4))
def test_sssp_sql_matches_bellman_ford(edges, rounds):
    e = pd.DataFrame(
        [(f"n{u}", f"n{v}", w) for u, v, w in edges],
        columns=["src", "dst", "w"],
    )
    sql = sssp_sql(
        "SELECT src, dst, w FROM edges_tbl",
        "SELECT 'n0' AS node",
        rounds=rounds,
    )
    got = {
        r["node"]: r["dist"]
        for _, r in _run(sql, {"edges_tbl": e}).iterrows()
    }
    # the SQL relaxes over the DISTINCT (src,dst,w) multiset = input
    want = _bellman_ford(
        [(f"n{u}", f"n{v}", w) for u, v, w in set(edges)],
        ["n0"],
        rounds,
    )
    assert got == want


# ---------------------------------------------------------- adamic-adar


@settings(max_examples=40, deadline=None)
@given(edges_strategy)
def test_adamic_adar_sql_matches_bruteforce(edges):
    pairs = {(f"c{u}", f"s{v}") for u, v, _ in edges}
    e = pd.DataFrame(sorted(pairs), columns=["src", "dst"])
    got = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["aa_q"])
        for _, r in _run(
            adamic_adar_sql("SELECT src, dst FROM edges_tbl"), {"edges_tbl": e}
        ).iterrows()
    }

    nbrs = {}
    for a, n in pairs:
        nbrs.setdefault(n, set()).add(a)
    want = {}
    for n, aset in nbrs.items():
        if len(aset) < 2:
            continue
        wq = math.floor(1e6 / math.log(len(aset)) + 0.5)
        alist = sorted(aset)
        for i, x in enumerate(alist):
            for y in alist[i + 1:]:
                c, q = want.get((x, y), (0, 0))
                want[(x, y)] = (c + 1, q + wq)
    assert got == want


# --------------------------------------------------------- random walks


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _walk_reference(pairs, seeds, steps):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
    adj = {u: sorted(vs) for u, vs in adj.items()}
    out = set()
    for s in sorted(set(seeds)):
        cur = s
        out.add((s, 0, s))
        for t in range(1, steps + 1):
            if cur not in adj:
                break
            nxt = adj[cur][
                _md5_60(f"{s}:{t - 1}:{cur}") % len(adj[cur])
            ]
            out.add((s, t, nxt))
            cur = nxt
    return out


@settings(max_examples=40, deadline=None)
@given(edges_strategy, st.integers(min_value=1, max_value=3))
def test_random_walks_sql_matches_reference(edges, steps):
    pairs = {(f"n{u}", f"n{v}") for u, v, _ in edges}
    e = pd.DataFrame(sorted(pairs), columns=["src", "dst"])
    seeds = sorted({u for u, _ in pairs})[:2]
    seeds_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS node" for s in seeds
    )
    got = {
        (r["walk_id"], r["step"], r["node"])
        for _, r in _run(
            random_walks_sql("SELECT src, dst FROM edges_tbl", seeds_sql, steps),
            {"edges_tbl": e},
        ).iterrows()
    }
    assert got == _walk_reference(pairs, seeds, steps)
