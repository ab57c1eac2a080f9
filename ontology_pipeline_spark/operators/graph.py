"""Graph read-side operators over the triple table.

The triple DataFrame IS the graph (SURVEY.md §2.9): nodes are the distinct
endpoint names, `pred` is the edge label.  These reproduce the reference's
analytics-layer graph features (reference streamlit_app.py:713-795) as
DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nodes(triples: DataFrame) -> DataFrame:
    """Distinct typed nodes (reference node_types dict, streamlit_app.py:732)."""
    return (
        triples.select(F.col("subj").alias("name"), F.col("subj_class").alias("node_type"))
        .unionByName(
            triples.select(F.col("obj").alias("name"), F.col("obj_class").alias("node_type"))
        )
        .distinct()
    )


def degrees(triples: DataFrame) -> DataFrame:
    """(name, out_degree, in_degree, degree) over distinct edges."""
    e = triples.select("subj", "obj").distinct()
    out_d = e.groupBy(F.col("subj").alias("name")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = e.groupBy(F.col("obj").alias("name")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "name", "full")
        .select(
            "name",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def filter_node_types(triples: DataFrame, keep: list[str]) -> DataFrame:
    """Edge filter on endpoint types (reference safe_add_edge guard,
    streamlit_app.py:735-742)."""
    return triples.filter(
        F.col("subj_class").isin(keep) & F.col("obj_class").isin(keep)
    )


def ego_edges(triples: DataFrame, node: str, hops: int = 1) -> DataFrame:
    """k-hop ego subgraph edges (reference 1-hop isolation,
    streamlit_app.py:771-777) via iterated self-joins."""
    frontier = triples.sparkSession.createDataFrame([(node,)], ["name"])
    seen = frontier
    for _ in range(hops):
        nbrs = (
            triples.join(F.broadcast(seen), triples["subj"] == seen["name"])
            .select(F.col("obj").alias("name"))
            .unionByName(
                triples.join(F.broadcast(seen), triples["obj"] == seen["name"]).select(
                    F.col("subj").alias("name")
                )
            )
            .distinct()
        )
        seen = seen.unionByName(nbrs).distinct()
    return triples.join(
        F.broadcast(seen.withColumnRenamed("name", "_s")), triples["subj"] == F.col("_s")
    ).drop("_s").join(
        F.broadcast(seen.withColumnRenamed("name", "_o")), triples["obj"] == F.col("_o")
    ).drop("_o")
