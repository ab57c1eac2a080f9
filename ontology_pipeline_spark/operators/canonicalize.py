"""Canonicalization stage (S5) — connected components over the mention
co-reference graph.

The reference canonicalizes by exact string match on the entity name
(reference streamlit_app.py:111, :128, :159, :171 — dict keying).  The
engine generalizes this: linking (S4) emits equivalence edges
(surface ~ canonical, alias ~ canonical), and this stage collapses each
connected component to a single canonical id, so transitive alias chains
(A~B from exact, B~C from LSH) resolve to one entity.

Algorithm: iterative minimum-label propagation over the undirected edge set
— each node adopts the smallest label in its neighborhood until fixpoint
(the classic "hash-to-min" DataFrame CC; converges in O(component diameter)
rounds, and co-reference components are shallow).  Scale notes:

* every round is one shuffle (groupBy node); AQE handles skew from
  high-degree head entities (`spark.sql.adaptive.skewJoin.enabled`), and a
  deterministic salt column spreads the reduce of super-nodes;
* `localCheckpoint` per round truncates the lineage so plans stay flat;
* iteration is bounded (`max_iter`) with an early-exit convergence check —
  the only driver-side values are the per-round change counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    salt_buckets: int = 8,
) -> DataFrame:
    """Edges (src, dst) -> (node, component) with component = min label.

    Labels are the node strings themselves; the representative of each
    component is its lexicographically smallest member (deterministic).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # self-edges keep isolated-after-filter nodes alive
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate label for each node = min(label of neighbors, own label).
        # Two-phase (salted partial min, then final min) so a super-node's
        # reduce is spread over `salt_buckets` tasks before the final combine.
        neigh = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "component")
            .withColumn("_salt", F.pmod(F.xxhash64("component"), F.lit(salt_buckets)))
        )
        partial = neigh.groupBy("node", "_salt").agg(F.min("component").alias("component"))
        cand = partial.groupBy("node").agg(F.min("component").alias("cand"))
        new_labels = (
            labels.join(cand, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("cand"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_mapping(
    link_pairs: DataFrame,
    surface_col: str = "surface",
    canonical_col: str = "linked_canonical",
) -> DataFrame:
    """(surface, linked_canonical) equivalences -> (name, canonical_id) where
    canonical_id is the component representative."""
    edges = link_pairs.select(
        F.col(surface_col).alias("src"), F.col(canonical_col).alias("dst")
    ).filter(F.col("dst").isNotNull())
    cc = connected_components(edges)
    return cc.select(F.col("node").alias("name"), F.col("component").alias("canonical_id"))
