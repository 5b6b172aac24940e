"""graph_pagerank: hand-checkable fixtures + a pure-Python power-iteration
reference (same formulation: out-normalized weights, uniform start,
dangling mass redistributed uniformly, fixed iterations, terminal 6dp)."""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.datapipe.graph import graph_pagerank


def _ref_pagerank(edges, damping=0.85, iters=5):
    """edges: list of (src, dst, w). Returns {node: round(rank, 6)}."""
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += r[s] * (w / outw[s])
        dang = sum(r[v] for v in nodes if v not in outw)
        r = {
            v: (1 - damping) / n + damping * (contrib[v] + dang / n)
            for v in nodes
        }
    return {v: round(x, 6) for v, x in r.items()}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["s", "d", "w"])
    out = graph_pagerank(df, "s", "d", weight_col="w", **kw)
    return {row["node"]: row["pagerank"] for row in out.collect()}


def test_two_node_cycle_is_uniform(spark):
    # symmetric cycle: stationary distribution is exactly 0.5/0.5 from
    # the uniform start at every iteration
    got = _run(spark, [("a", "b", 1.0), ("b", "a", 1.0)])
    assert got == {"a": 0.5, "b": 0.5}


def test_matches_python_reference_on_mixed_graph(spark):
    # hub, spokes, a dangling sink, and weighted multi-edges
    edges = [
        ("hub", "a", 2.0), ("hub", "b", 1.0), ("hub", "c", 1.0),
        ("a", "hub", 1.0), ("b", "hub", 3.0), ("c", "sink", 1.0),
        ("a", "b", 0.5),
    ]
    got = _run(spark, edges)
    want = _ref_pagerank(edges)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_unweighted_default_and_iter_knob(spark):
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 1.0)]
    df = spark.createDataFrame(edges, ["s", "d", "w"])
    got = {
        r["node"]: r["pagerank"]
        for r in graph_pagerank(df, "s", "d", iters=3).collect()
    }
    want = _ref_pagerank(edges, iters=3)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_total_rank_conserved(spark):
    edges = [("a", "b", 1.0), ("b", "sink", 2.0), ("c", "a", 1.0)]
    got = _run(spark, edges, iters=7)
    # dangling redistribution keeps the distribution normalized
    assert sum(got.values()) == pytest.approx(1.0, abs=5e-6)


def test_null_endpoints_dropped(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0), (None, "b", 1.0), ("b", None, 1.0)], ["s", "d", "w"]
    )
    got = {r["node"]: r["pagerank"] for r in graph_pagerank(df, "s", "d").collect()}
    assert set(got) == {"a", "b"}


def test_bad_weights_raise(spark):
    df = spark.createDataFrame([("a", "b", 0.0)], ["s", "d", "w"])
    with pytest.raises(ValueError, match="non-positive"):
        graph_pagerank(df, "s", "d", weight_col="w")
    with pytest.raises(ValueError, match="damping"):
        graph_pagerank(df, "s", "d", damping=1.0)
    with pytest.raises(ValueError, match="iters"):
        graph_pagerank(df, "s", "d", iters=0)


def test_no_cartesian_no_python_in_plan(spark):
    df = spark.createDataFrame([("a", "b", 1.0), ("b", "a", 1.0)], ["s", "d", "w"])
    plan = graph_pagerank(df, "s", "d", weight_col="w", iters=2)._jdf.queryExecution().executedPlan().toString()
    # the only nested-loop join is the sanctioned 1-row dangling-mass
    # broadcast; no Python evaluation anywhere
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_page_rank_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "a", 1.0), ("a", "c", 1.0)], ["s", "d", "w"]
    )
    out = Pipeline.compile("page-rank :s :d :w 0.85 4").apply(df)
    got = {r["node"]: r["pagerank"] for r in out.collect()}
    want = _ref_pagerank([("a", "b", 2.0), ("b", "a", 1.0), ("a", "c", 1.0)], iters=4)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def _ref_lpa(edges, iters=5, directed=False):
    """Pure-python synchronous LPA with (max weight, min label) votes."""
    if not directed:
        edges = edges + [(d, s, w) for s, d, w in edges]
    agg = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0.0) + w
    nodes = sorted({s for s, _ in agg} | {d for _, d in agg})
    lab = {v: v for v in nodes}
    for _ in range(iters):
        votes = {}
        for (s, d), w in agg.items():
            votes.setdefault(d, {})
            votes[d][lab[s]] = votes[d].get(lab[s], 0.0) + w
        lab = {
            v: (min((l for l, vw in votes[v].items()
                     if vw == max(votes[v].values())))
                if v in votes else lab[v])
            for v in nodes
        }
    return lab


def test_lpa_two_triangles(spark):
    edges = [
        ("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0),
        ("d", "e", 1.0), ("e", "f", 1.0), ("d", "f", 1.0),
        ("c", "d", 0.2),   # weak bridge
    ]
    from wrangler_spark.datapipe.graph import graph_label_propagation

    df = spark.createDataFrame(edges, ["s", "d", "w"])
    got = {r["node"]: r["community"] for r in
           graph_label_propagation(df, "s", "d", weight_col="w", iters=6).collect()}
    want = _ref_lpa(edges, iters=6)
    assert got == want
    # the two triangles really are distinct communities
    assert len({got["a"], got["b"], got["c"]}) == 1
    assert len({got["d"], got["e"], got["f"]}) == 1
    assert got["a"] != got["d"]


def test_lpa_matches_reference_directed_and_unweighted(spark):
    from wrangler_spark.datapipe.graph import graph_label_propagation

    edges = [
        ("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
        ("c", "d", 3.0), ("d", "b", 1.0), ("e", "d", 1.0),
    ]
    df = spark.createDataFrame(edges, ["s", "d", "w"])
    for directed in (False, True):
        got = {r["node"]: r["community"] for r in graph_label_propagation(
            df, "s", "d", weight_col="w", iters=4, directed=directed).collect()}
        assert got == _ref_lpa(edges, iters=4, directed=directed), directed
    # unweighted: every edge votes 1.0
    got = {r["node"]: r["community"] for r in
           graph_label_propagation(df, "s", "d", iters=3).collect()}
    assert got == _ref_lpa([(s, d, 1.0) for s, d, _ in edges], iters=3)


def test_label_propagation_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0), ("d", "c", 0.1)]
    df = spark.createDataFrame(edges, ["s", "d", "w"])
    out = Pipeline.compile("label-propagation :s :d :w 4").apply(df)
    got = {r["node"]: r["community"] for r in out.collect()}
    assert got == _ref_lpa(edges, iters=4)


def test_graph_components_front_door(spark):
    from wrangler_spark.datapipe.graph import graph_components

    df = spark.createDataFrame([("a", "b"), ("b", "c"), ("x", "y")], ["s", "d"])
    got = sorted(map(tuple, graph_components(df, "s", "d").collect()))
    assert got == [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")]


def _ref_ppr(edges, seeds, damping=0.85, iters=5):
    """Personalized PageRank reference: teleport vector on the seeds."""
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    present = [v for v in nodes if v in set(seeds)]
    t = {v: (1.0 / len(present) if v in present else 0.0) for v in nodes}
    r = dict(t)
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += r[s] * (w / outw[s])
        dang = sum(r[v] for v in nodes if v not in outw)
        r = {v: (1 - damping) * t[v] + damping * (contrib[v] + dang * t[v])
             for v in nodes}
    return {v: round(x, 6) for v, x in r.items()}


def test_personalized_pagerank_seeds(spark):
    edges = [
        ("seed", "a", 1.0), ("a", "b", 1.0), ("b", "seed", 1.0),
        ("farm1", "farm2", 5.0), ("farm2", "farm1", 5.0),  # no inbound path
        ("a", "sink", 1.0),
    ]
    df = spark.createDataFrame(edges, ["s", "d", "w"])
    got = _run(spark, edges, seeds=["seed"], iters=6)
    want = _ref_ppr(edges, ["seed"], iters=6)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v
    # the link farm has no inbound path from the seed: its rank decays
    # toward zero while the seed's neighborhood holds the mass
    assert got["farm1"] < 0.01 < got["seed"]
    # seeds absent from the graph refuse loudly
    with pytest.raises(ValueError, match="seeds appear"):
        _run(spark, edges, seeds=["nope"])


# ---------------------------------------------------------------- triangles


def _ref_triangles(edges):
    """edges: (s, d) pairs. Brute-force per-node triangle count +
    clustering over the undirected simple graph."""
    adj = {}
    for s, d in edges:
        if s == d or s is None or d is None:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for n, nbrs in adj.items():
        deg = len(nbrs)
        t = sum(
            1
            for i, a in enumerate(sorted(nbrs))
            for b in sorted(nbrs)[i + 1:]
            if b in adj.get(a, set())
        )
        clus = round(2.0 * t / (deg * (deg - 1.0)), 6) if deg >= 2 else None
        out[n] = (deg, t, clus)
    return out


def _run_tri(spark, edges):
    from wrangler_spark.datapipe.graph import graph_triangles

    df = spark.createDataFrame(edges, ["s", "d"])
    return {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in graph_triangles(df, "s", "d").collect()
    }


def test_triangles_clique_and_path(spark):
    # K4 (every node: deg 3, 3 triangles, clustering 1.0) plus a
    # 3-node path (middle deg 2, 0 triangles, clustering 0.0)
    k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
    path = [("x", "y"), ("y", "z")]
    got = _run_tri(spark, k4 + path)
    for n in "abcd":
        assert got[n] == (3, 3, 1.0)
    assert got["y"] == (2, 0, 0.0)
    assert got["x"] == (1, 0, None)


def test_triangles_direction_multiplicity_selfloops_collapse(spark):
    # duplicate edges, both directions, and self-loops must not change
    # the simple-graph answer
    base = [("a", "b"), ("b", "c"), ("a", "c")]
    noisy = base + [("b", "a"), ("a", "b"), ("c", "c")]
    assert _run_tri(spark, noisy) == _run_tri(spark, base)
    assert _run_tri(spark, base)["a"] == (2, 1, 1.0)


def test_triangles_matches_reference_on_mixed_graph(spark):
    edges = [
        ("hub", x) for x in "abcdef"
    ] + [("a", "b"), ("c", "d"), ("d", "e"), ("q", "r")]
    got = _run_tri(spark, edges)
    want = _ref_triangles(edges)
    assert got == want


def test_triangles_no_cartesian_no_python_in_plan(spark):
    from wrangler_spark.datapipe.graph import graph_triangles

    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["s", "d"])
    plan = graph_triangles(df, "s", "d")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ------------------------------------------------------------------- k-hop


def _run_khop(spark, edges, seeds, k, directed=False):
    from wrangler_spark.datapipe.graph import graph_khop

    df = spark.createDataFrame(edges, ["s", "d"])
    return {
        r["node"]: r["hop"]
        for r in graph_khop(df, "s", "d", seeds, k=k, directed=directed).collect()
    }


def test_khop_chain_min_hops(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _run_khop(spark, edges, ["a"], k=3, directed=True)
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # undirected from the middle: both directions, min hop wins
    got = _run_khop(spark, edges, ["c"], k=2)
    assert got == {"c": 0, "b": 1, "d": 1, "a": 2, "e": 2}


def test_khop_absent_seed_and_multi_seed_min(spark):
    edges = [("a", "b"), ("b", "c")]
    # an absent seed still appears at hop 0 (a node reaches itself);
    # with two seeds every node takes its MINIMUM distance
    got = _run_khop(spark, edges, ["ghost", "a", "c"], k=2)
    assert got == {"ghost": 0, "a": 0, "c": 0, "b": 1}


def test_khop_early_exit_and_k_zero(spark):
    edges = [("a", "b")]
    # frontier empties after round 1 — extra rounds are a no-op
    assert _run_khop(spark, edges, ["a"], k=10) == {"a": 0, "b": 1}
    from wrangler_spark.datapipe.graph import graph_khop

    df = spark.createDataFrame(edges, ["s", "d"])
    got = {
        r["node"]: r["hop"]
        for r in graph_khop(df, "s", "d", ["a"], k=0).collect()
    }
    assert got == {"a": 0}


def test_khop_validates_inputs(spark):
    from wrangler_spark.datapipe.graph import graph_khop

    df = spark.createDataFrame([("a", "b")], ["s", "d"])
    with pytest.raises(ValueError, match="non-empty seed"):
        graph_khop(df, "s", "d", [], k=2)
    with pytest.raises(ValueError, match="k must be"):
        graph_khop(df, "s", "d", ["a"], k=-1)


# -------------------------------------------------------------------- HITS


def _ref_hits(edges, iters=5):
    """edges: (s, d, w). L1-normalized HITS, hub0 = 1/N."""
    agg = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0.0) + w
    nodes = sorted({s for s, _ in agg} | {d for _, d in agg})
    h = {v: 1.0 / len(nodes) for v in nodes}
    a = {v: 0.0 for v in nodes}
    for _ in range(iters):
        ar = {v: 0.0 for v in nodes}
        for (s, d), w in agg.items():
            ar[d] += h[s] * w
        at = sum(ar.values())
        a = {v: ar[v] / at for v in nodes}
        hr = {v: 0.0 for v in nodes}
        for (s, d), w in agg.items():
            hr[s] += a[d] * w
        ht = sum(hr.values())
        h = {v: hr[v] / ht for v in nodes}
    return (
        {v: round(x, 6) for v, x in h.items()},
        {v: round(x, 6) for v, x in a.items()},
    )


def test_hits_hub_vs_authority_separation(spark):
    from wrangler_spark.datapipe.graph import graph_hits

    # "index" points at three "content" pages; content never links out:
    # index is the pure hub, contents the pure authorities
    edges = [("index", "c1", 1.0), ("index", "c2", 1.0), ("index", "c3", 1.0)]
    df = spark.createDataFrame(edges, ["s", "d", "w"])
    got = {r["node"]: r for r in graph_hits(df, "s", "d", weight_col="w").collect()}
    assert got["index"]["hub"] == 1.0 and got["index"]["authority"] == 0.0
    for c in ("c1", "c2", "c3"):
        assert got[c]["hub"] == 0.0
        assert got[c]["authority"] == pytest.approx(1 / 3, abs=2e-6)


def test_hits_matches_python_reference(spark):
    from wrangler_spark.datapipe.graph import graph_hits

    edges = [
        ("hub1", "auth1", 2.0), ("hub1", "auth2", 1.0),
        ("hub2", "auth1", 1.0), ("hub2", "auth3", 1.0),
        ("auth1", "auth3", 0.5), ("lone", "auth2", 3.0),
    ]
    df = spark.createDataFrame(edges, ["s", "d", "w"])
    got = {r["node"]: r for r in graph_hits(df, "s", "d", weight_col="w").collect()}
    want_h, want_a = _ref_hits(edges)
    assert set(got) == set(want_h)
    for v in want_h:
        assert got[v]["hub"] == pytest.approx(want_h[v], abs=2e-6), v
        assert got[v]["authority"] == pytest.approx(want_a[v], abs=2e-6), v


def test_hits_validates_and_plan(spark):
    from wrangler_spark.datapipe.graph import graph_hits

    df = spark.createDataFrame([("a", "b", -1.0)], ["s", "d", "w"])
    with pytest.raises(ValueError, match="non-positive"):
        graph_hits(df, "s", "d", weight_col="w")
    ok = spark.createDataFrame([("a", "b", 1.0)], ["s", "d", "w"])
    with pytest.raises(ValueError, match="iters"):
        graph_hits(ok, "s", "d", iters=0)
    plan = graph_hits(ok, "s", "d")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ------------------------------------------------------------ graph summary


def test_graph_summary_hand_computed(spark):
    from wrangler_spark.datapipe.graph import graph_summary

    # a<->b reciprocal, a->c, c->c self-loop, duplicate a->b collapses
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")]
    df = spark.createDataFrame(edges, ["s", "d"])
    row = graph_summary(df, "s", "d").collect()[0]
    assert row["n_nodes"] == 3 and row["n_edges"] == 3
    assert row["self_loops"] == 1
    assert row["avg_out_degree"] == 1.0           # 3 edges / 3 nodes
    assert row["max_out_degree"] == 2             # a -> b, a -> c
    assert row["density"] == 0.5                  # 3 / (3*2)
    assert row["reciprocity"] == pytest.approx(2 / 3, abs=2e-6)


def test_graph_summary_directive_and_empty(spark):
    from wrangler_spark import Pipeline
    from wrangler_spark.datapipe.graph import graph_summary

    df = spark.createDataFrame([("a", "b")], ["s", "d"])
    r = Pipeline.compile("graph-summary :s :d").transform(df)
    row = r.df.collect()[0]
    assert row["n_nodes"] == 2 and row["reciprocity"] == 0.0
    empty = spark.createDataFrame([], "s string, d string")
    row = graph_summary(empty, "s", "d").collect()[0]
    assert row["n_nodes"] == 0 and row["n_edges"] == 0
    assert row["avg_out_degree"] is None and row["density"] is None
    assert row["reciprocity"] is None


def test_sssp_weighted_diamond_and_relaxation(spark):
    from wrangler_spark.datapipe import graph

    # a->b->c beats the direct a->c; multi-seed; absent seed at 0
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 5.0), ("b", "c", 1.0),
         ("c", "d", 1.0), ("d", "a", 0.5), ("a", "b", 9.0)],
        "s string, d string, w double")
    got = {r["node"]: r["dist"] for r in graph.graph_sssp(
        edges, "s", "d", ["a", "zz"], weight_col="w").collect()}
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0, "zz": 0.0}
    # parallel edge a->b keeps the cheaper 1.0, not 9.0


def test_sssp_hop_default_undirected_and_rounds(spark):
    from wrangler_spark.datapipe import graph

    edges = spark.createDataFrame(
        [("a", "b", None), ("b", "c", None), ("c", "d", None)],
        "s string, d string, w string").drop("w")
    got = {r["node"]: r["dist"] for r in graph.graph_sssp(
        edges, "s", "d", ["d"], directed=False).collect()}
    assert got == {"d": 0.0, "c": 1.0, "b": 2.0, "a": 3.0}
    # bounded rounds truncate the frontier
    got = {r["node"]: r["dist"] for r in graph.graph_sssp(
        edges, "s", "d", ["a"], max_rounds=2).collect()}
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0}


def test_sssp_validation_and_negative_weight(spark):
    from wrangler_spark.datapipe import graph

    edges = spark.createDataFrame(
        [("a", "b", -1.0)], "s string, d string, w double")
    with pytest.raises(ValueError, match="negative edge weight"):
        graph.graph_sssp(edges, "s", "d", ["a"], weight_col="w")
    with pytest.raises(ValueError, match="non-empty seed"):
        graph.graph_sssp(edges, "s", "d", [])
    with pytest.raises(ValueError, match="max_rounds"):
        graph.graph_sssp(edges, "s", "d", ["a"], max_rounds=-1)


def test_sssp_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 2.0)], "s string, d string, w double")
    out = Pipeline.compile("graph-sssp :s :d 'a' :w 5").apply(edges)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 4.0}
