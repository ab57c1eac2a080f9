"""Graph read-side operators over the triple table."""

from __future__ import annotations

from ontology_pipeline_spark.operators.graph import (
    degrees,
    ego_edges,
    filter_node_types,
    nodes,
)

TRIPLES = [
    # subj, subj_class, pred, obj, obj_class, url
    ("A", "assessment", "measures", "C1", "construct", "u1"),
    ("A", "assessment", "measures", "C2", "construct", "u1"),
    ("I", "intervention", "targets", "C1", "construct", "u2"),
    ("A", "assessment", "informs", "I", "intervention", "u3"),
    ("C1", "construct", "association", "C2", "construct", "u3"),
    ("X", "assessment", "measures", "Y", "construct", "u4"),
]


def _t(spark):
    return spark.createDataFrame(
        TRIPLES, ["subj", "subj_class", "pred", "obj", "obj_class", "url"]
    )


def test_nodes_typed(spark):
    got = {(r["name"], r["node_type"]) for r in nodes(_t(spark)).collect()}
    assert got == {
        ("A", "assessment"), ("C1", "construct"), ("C2", "construct"),
        ("I", "intervention"), ("X", "assessment"), ("Y", "construct"),
    }


def test_degrees(spark):
    d = {r["name"]: (r["out_degree"], r["in_degree"]) for r in degrees(_t(spark)).collect()}
    assert d["A"] == (3, 0)
    assert d["C1"] == (1, 2)
    assert d["Y"] == (0, 1)


def test_filter_node_types(spark):
    kept = filter_node_types(_t(spark), ["assessment", "construct"])
    assert kept.count() == 4  # drops the two intervention-touching edges


def test_ego_edges_excludes_far_component(spark):
    ego = ego_edges(_t(spark), "C1", hops=1)
    got = {(r["subj"], r["obj"]) for r in ego.collect()}
    # X->Y is a separate component; must not appear
    assert ("X", "Y") not in got
    assert ("A", "C1") in got and ("I", "C1") in got
    # edges among C1's neighbors are included (reference neighborhood
    # semantics: both endpoints in the neighborhood set)
    assert ("C1", "C2") in got


def test_ego_two_hops_reaches_more(spark):
    one = ego_edges(_t(spark), "Y", hops=1).count()
    # Y's only neighbor is X; 2 hops adds nothing new in this component
    assert one == ego_edges(_t(spark), "Y", hops=2).count() == 1


def test_pagerank_invariants(spark):
    """Power-iteration PageRank: mass conservation (undirected, no dangling
    nodes -> ranks sum to 1), hub dominance on a star, and partition-layout
    determinism within the rounding convention."""
    from pyspark.sql import functions as F

    from ontology_pipeline_spark.operators.graph import pagerank

    star = [("hub", f"leaf{i}") for i in range(8)] + [("leaf0", "leaf1")]
    edges = spark.createDataFrame(star, ["src", "dst"])
    pr = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-4
    assert pr["hub"] == max(pr.values())
    assert pr["leaf0"] > pr["leaf7"]  # extra edge -> extra rank

    pr2 = {
        r["node"]: r["rank"]
        for r in pagerank(spark.createDataFrame(star, ["src", "dst"]).repartition(5)).collect()
    }
    assert pr == pr2
