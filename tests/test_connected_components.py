"""connected_components (alternating large-star/small-star) vs a plain
union-find reference, plus the minhash_components cluster contract.

The reference semantics mirror the reference engine's dedup survivor
contract (keep the minimum id); the distributed algorithm is Kiveris et
al.'s MapReduce CC, validated here against exact union-find on graph
shapes chosen to stress it: long chains (diameter >> rounds of naive
min-propagation), cliques, duplicate/reversed/self edges, and seeded
random graphs."""

import random

import pytest
from pyspark.sql import functions as F

from wrangler_spark.datapipe.dedup import (
    connected_components,
    minhash_components,
    minhash_dedup,
    minhash_lsh_pairs,
)


def uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            find(a)
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def spark_components(spark, edges, schema="id_a long, id_b long"):
    df = spark.createDataFrame(list(edges), schema)
    return {r["id"]: r["component"] for r in connected_components(df).collect()}


@pytest.mark.parametrize(
    "name,edges",
    [
        ("pair", [(1, 2)]),
        ("chain60", [(i, i + 1) for i in range(60)]),
        ("reversed_chain", [(i + 1, i) for i in range(30)]),
        ("clique12", [(i, j) for i in range(12) for j in range(i + 1, 12)]),
        ("two_components", [(1, 2), (2, 3), (10, 11), (11, 12)]),
        ("dup_and_self", [(1, 2), (2, 1), (1, 2), (5, 5), (3, 3)]),
        ("star", [(100, i) for i in range(7)]),
    ],
)
def test_matches_union_find(spark, name, edges):
    want = uf_components(edges)
    # self-loop-only nodes still appear in output iff they appear in a
    # real pair; pure self-loops are filtered by the operator — mirror that
    real = {n for a, b in edges if a != b for n in (a, b)}
    want = {n: c for n, c in want.items() if n in real}
    assert spark_components(spark, edges) == want


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        edges = [(rng.randint(0, 200), rng.randint(0, 200)) for _ in range(250)]
        want = uf_components(edges)
        real = {n for a, b in edges if a != b for n in (a, b)}
        want = {n: c for n, c in want.items() if n in real}
        assert spark_components(spark, edges) == want, f"trial {trial}"


def test_string_ids(spark):
    got = spark_components(
        spark, [("b", "c"), ("c", "d"), ("x", "y")], "id_a string, id_b string"
    )
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_empty_and_null_edges(spark):
    df = spark.createDataFrame([(None, 2), (3, None)], "id_a long, id_b long")
    assert connected_components(df).count() == 0
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1)


def test_minhash_components_cluster_contract(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 6
    rows = [
        (1, base),
        (2, base + "tail one"),
        (3, base + "tail one two"),
        (10, "completely different text about spark shuffles and partitions " * 6),
        (11, "another unrelated document discussing parquet row groups " * 6),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["component"], r["is_dup"]) for r in
           minhash_components(df, "doc_id", "text", 0.5).collect()}
    assert len(out) == 5
    # docs 1-3 are one near-dup cluster: one survivor (min id), closed
    # transitively even if (1,3) alone were below threshold
    assert out[1] == (1, False)
    assert out[2] == (2, False) or out[2] == (1, True)
    assert out[2][1] == (out[2][0] != 2)
    assert out[10] == (10, False)
    assert out[11] == (11, False)
    # every verified pair's members share a component
    pairs = minhash_lsh_pairs(df, "doc_id", "text", 0.5).collect()
    for p in pairs:
        assert out[p["id_a"]][0] == out[p["id_b"]][0]


def test_minhash_components_consistent_with_pairwise_flags(spark):
    # on the shared fixture corpus the transitive closure must drop a
    # SUPERSET of the pairwise rule's drops (pairwise drops higher member
    # of each pair; closure drops every non-minimal cluster member)
    rows = [(i, f"shared prefix text that repeats enough to shingle properly {i % 3} " * 8)
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cc = {r["doc_id"]: r["is_dup"] for r in
          minhash_components(df, "doc_id", "text", 0.3).collect()}
    pw = {r["doc_id"]: r["is_dup"] for r in
          minhash_dedup(df, "doc_id", "text", 0.3).collect()}
    assert set(cc) == set(pw)
    for doc, flagged in pw.items():
        if flagged:
            assert cc[doc], f"pairwise dropped {doc} but closure kept it"


def test_component_column_survivor_counts(spark):
    # cluster sizes are auditable from the component column — the reason
    # this operator exists over bare flags
    edges = [(1, 2), (2, 3), (3, 4), (7, 8)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    sizes = {
        r["component"]: r["n"]
        for r in connected_components(df).groupBy("component").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {1: 4, 7: 2}


def test_embedding_components_chain(spark):
    from wrangler_spark.datapipe.dedup import embedding_components

    # a, b, c sit on a drift chain: cos(a,b) and cos(b,c) are high but
    # cos(a,c) is lower; with a permissive threshold all three must land
    # in one component via transitivity, with the min id surviving
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.4, 0.0, 0.0]),
        (3, [0.6, 0.8, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["component"], r["is_dup"]) for r in
           embedding_components(df, "vec_id", "embedding", 0.8).collect()}
    assert len(out) == 4
    assert out[1] == (1, False)
    assert out[10] == (10, False)
    # 2 links to 1; whether 3 joins depends on the LSH bucketing, but if
    # it pairs with anyone its component must be 1
    assert out[2][0] in (1, 2)
    if out[3][1]:
        assert out[3][0] == 1


def test_cluster_weights_soft_dedup(spark):
    from pyspark.sql import functions as F

    from wrangler_spark.datapipe import dedup

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)], ["id", "component"]
    )
    got = {r["id"]: r for r in dedup.cluster_weights(comp).collect()}
    assert got[1]["cluster_size"] == 3 and got[1]["weight"] == round(1 / 3, 6)
    assert got[4]["weight"] == 1.0 and got[5]["weight"] == 1.0
    # total training mass = number of distinct contents (one per cluster)
    total = dedup.cluster_weights(comp).agg(F.sum("weight")).collect()[0][0]
    assert abs(total - 3.0) < 1e-5
