"""Entity linking stage (S4) — generalizes the reference's exact-name dict
keying (reference streamlit_app.py:111, :128, :159, :171) into a two-tier
linker over the broadcast alias dictionary:

1. **Exact fast path** (primary): broadcast hash join on lower(surface) —
   reproduces the reference's exact-match canonicalization, zero shuffle on
   the big side.  This path alone must carry P/R (SURVEY.md §7 hard-part 2);
   the fuzzy tier may only add recall, never remove exact matches.
2. **MinHash-LSH fallback** (secondary): surfaces that miss the dictionary
   are blocked against canonical names with `pyspark.ml.feature.MinHashLSH`
   over character-3-gram count vectors (`approxSimilarityJoin`), keeping the
   candidate join sub-quadratic at web scale; the best (lowest-distance,
   tie-broken deterministically) candidate within the threshold wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _char_ngrams(col, n: int = 3):
    """Character n-gram array via built-ins (no Python UDF): slide over
    the lowercased, space-normalized string."""
    s = F.lower(F.regexp_replace(col, r"\s+", " "))
    # start offsets 1..len-n+1 -> substrings; all JVM-side, no Python UDF
    return F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
                lambda i: s.substr(i, F.lit(n)),
            ),
            lambda g: F.length(g) == n,
        )
    )


def link_exact(surfaces: DataFrame, lexicon: DataFrame, surface_col: str = "surface") -> DataFrame:
    """Broadcast equi-join surfaces -> (canonical, entity_class); unmatched rows
    keep null canonical (for the fuzzy tier)."""
    dict_df = (
        lexicon.select(
            F.lower(F.col("alias")).alias("_alias_lc"),
            F.col("canonical_name").alias("linked_canonical"),
            F.col("entity_class").alias("linked_class"),
        )
        # deterministic winner when a caller-supplied lexicon maps the same
        # (alias, class) to several canonicals: smallest canonical wins
        # (dropDuplicates alone keeps an arbitrary partition-order row)
        .groupBy("_alias_lc", "linked_class")
        .agg(F.min("linked_canonical").alias("linked_canonical"))
    )
    return surfaces.join(
        F.broadcast(dict_df),
        F.lower(F.col(surface_col)) == F.col("_alias_lc"),
        "left",
    ).drop("_alias_lc")


def link_fuzzy(
    unmatched: DataFrame,
    lexicon: DataFrame,
    surface_col: str = "surface",
    jaccard_max_distance: float = 0.5,
    num_hash_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH candidate blocking of unmatched surfaces vs canonical names.

    Returns (surface, linked_canonical, linked_class, jaccard_distance) for the
    best candidate per surface.  Deterministic: fixed seed, ties broken by
    (distance, canonical_name).
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    left = unmatched.select(F.col(surface_col).alias("surface")).distinct().withColumn(
        "grams", _char_ngrams(F.col("surface"))
    ).filter(F.size("grams") > 0)
    right = (
        lexicon.select(
            F.col("canonical_name").alias("cand_canonical"),
            F.col("entity_class").alias("cand_class"),
            F.col("alias"),
        )
        .withColumn("grams", _char_ngrams(F.col("alias")))
        .filter(F.size("grams") > 0)
    )
    if left.isEmpty():
        return left.select(
            F.col("surface"),
            F.lit(None).cast("string").alias("linked_canonical"),
            F.lit(None).cast("string").alias("linked_class"),
            F.lit(None).cast("double").alias("jaccard_distance"),
        )

    cv = CountVectorizer(inputCol="grams", outputCol="features", binary=True)
    model = cv.fit(right.select("grams").union(left.select("grams")))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    right_f = model.transform(right)
    left_f = model.transform(left)
    lsh_model = lsh.fit(right_f)
    joined = lsh_model.approxSimilarityJoin(
        left_f, right_f, jaccard_max_distance, distCol="jaccard_distance"
    )
    # linked_class in the tie-break: a canonical present in two entity
    # classes must resolve the class deterministically too
    w = Window.partitionBy("surface").orderBy(
        "jaccard_distance", "linked_canonical", "linked_class"
    )
    return (
        joined.select(
            F.col("datasetA.surface").alias("surface"),
            F.col("datasetB.cand_canonical").alias("linked_canonical"),
            F.col("datasetB.cand_class").alias("linked_class"),
            F.col("jaccard_distance"),
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def link_entities(
    surfaces: DataFrame,
    lexicon: DataFrame,
    surface_col: str = "surface",
    fuzzy: bool = True,
    jaccard_max_distance: float = 0.5,
) -> DataFrame:
    """Full two-tier linker.  Output adds (linked_canonical, linked_class,
    link_method) to the input rows; unlinkable rows keep nulls."""
    exact = link_exact(surfaces, lexicon, surface_col).withColumn(
        "link_method", F.when(F.col("linked_canonical").isNotNull(), F.lit("exact"))
    )
    if not fuzzy:
        return exact
    # the exact join feeds four consumers (miss check, fuzzy left side, the
    # repair join, and the final hit filter) — pin it so the surfaces scan
    # + broadcast join run once, not per consumer.  localCheckpoint, not
    # cache(): checkpoint blocks are GC-released with the DataFrame, while a
    # cache() would leak one copy per call for the session lifetime
    exact = exact.localCheckpoint(eager=False)
    misses = exact.filter(F.col("linked_canonical").isNull()).drop(
        "linked_canonical", "linked_class", "link_method"
    )
    if misses.isEmpty():
        return exact
    fz = link_fuzzy(misses, lexicon, surface_col, jaccard_max_distance)
    repaired = (
        misses.join(
            fz.withColumnRenamed("surface", "_fz_surface"),
            F.col(surface_col) == F.col("_fz_surface"),
            "left",
        )
        .drop("_fz_surface", "jaccard_distance")
        .withColumn(
            "link_method", F.when(F.col("linked_canonical").isNotNull(), F.lit("lsh"))
        )
    )
    return exact.filter(F.col("linked_canonical").isNotNull()).unionByName(repaired)
