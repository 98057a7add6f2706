"""Connected components: fixpoint correctness vs union-find, chain
convergence, canonical attachment, end-to-end clusters query."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from frames_spark.dedup import cluster as cc
from frames_spark.dedup import minhash as mh
from frames_spark.sources.tables import load_table


def _union_find(n_nodes: set[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label within each set
    groups: dict[int, list[int]] = {}
    for v in n_nodes:
        groups.setdefault(find(v), []).append(v)
    return {v: min(members) for members in groups.values() for v in members}


def test_chain_converges_to_single_component(spark):
    # worst case for label propagation: one long path 0-1-2-...-9
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src: long, dst: long"
    )
    got = {
        (r.node, r.component)
        for r in cc.connected_components(edges).collect()
    }
    assert got == {(i, 0) for i in range(10)}


def test_two_components_and_self_loop(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5)], "src: long, dst: long"
    )
    rows = {r.node: r.component for r in cc.connected_components(edges).collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 5: 5}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_matches_union_find(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "src: long, dst: long")
    got = {r.node: r.component for r in cc.connected_components(edges).collect()}
    nodes = {v for e in edge_list for v in e}
    assert got == _union_find(nodes, edge_list)


def test_attach_components_marks_canonicals(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src: long, dst: long")
    comps = cc.connected_components(edges)
    out = cc.attach_components(docs, comps, "doc_id")
    rows = {r.doc_id: (r.component, r.is_canonical) for r in out.collect()}
    assert rows[0] == (0, True)
    assert rows[1] == (0, False) and rows[2] == (0, False)
    # untouched docs are their own singleton component
    others = [v for k, v in rows.items() if k > 2]
    assert others and all(comp == k for k, (comp, canon) in rows.items() if k > 2)
    # exactly one canonical per component
    per_comp = (
        out.groupBy("component")
        .agg(F.sum(F.col("is_canonical").cast("long")).alias("n_canon"))
        .collect()
    )
    assert all(r.n_canon == 1 for r in per_comp)


def test_minhash_clusters_group_near_copies(spark, sf_dir):
    # near-copy corpus: doc_id and doc_id+offset should co-cluster
    from frames_spark.queries import _DUP_OFFSET, _MH_BANDS, _MH_K, _MH_ROWS, _with_near_copies

    docs = load_table(spark, sf_dir, "documents")
    sigs = mh.minhash_signatures(
        _with_near_copies(docs), "doc_id", "text", n=3, num_hashes=_MH_K
    )
    pairs = mh.lsh_candidate_pairs(sigs, _MH_BANDS, _MH_ROWS)
    comps = {r.node: r.component for r in cc.connected_components(
        pairs, "doc_a", "doc_b").collect()}
    # every original doc that got any edge shares a component with its copy
    together = [
        comps[d] == comps[d + _DUP_OFFSET]
        for d in comps
        if d < _DUP_OFFSET and d + _DUP_OFFSET in comps
    ]
    assert together and all(together)
