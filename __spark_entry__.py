"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes the engine's operator inventory (SURVEY.md §2) over the
driver's parquet tables; `oracle_sql()` gives the DuckDB-equivalent ANSI SQL
for every SQL-expressible query (same column names/aliases both sides).

Cross-engine float determinism conventions used throughout:
* money/value sums go through DECIMAL(38,6) (exact) and are rounded to 2
  digits after a cast to double — identical in Spark and DuckDB;
* per-row double expressions (cosine, jaccard, quality) use the same
  operation order in both engines and are rounded to 6 digits;
* cross-row double SUM/AVG is avoided in oracle-checked queries (summation
  order differs between engines); min/max/count are order-insensitive.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ontology_pipeline_spark.lexicon import lexicon_rows, simple_lexicon
from ontology_pipeline_spark.operators.dedup import (
    embedding_cosine_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from ontology_pipeline_spark.operators.graph import ego_edges, pagerank
from ontology_pipeline_spark.operators.mentions import detect_mentions
from ontology_pipeline_spark.operators.relations import extract_triples_fused
from ontology_pipeline_spark.operators.similarity import (
    cosine_topk,
    hyperplanes,
    ivf_assign,
    ivf_probe_topk,
    lsh_probe_topk,
    sampled_centers,
    with_lsh_bucket,
)
from ontology_pipeline_spark.operators.text_analysis import (
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    tokens,
)

# ---------------------------------------------------------------------------
# demo lexicon over the `documents` table vocabulary (the health-ontology
# lexicon drives the KG pipeline on synthetic pages; this one parameterizes
# the same mention/relation operators over the driver's corpus)
# ---------------------------------------------------------------------------
DEMO_TERMS: dict[str, list[str]] = {
    "operator": ["join", "filter", "scan", "sort", "merge", "window", "agg", "hash", "group"],
    "noun": ["table", "row", "column", "stream", "batch", "query", "data", "spark", "vector", "key"],
}
DEMO_LEXICON = simple_lexicon(DEMO_TERMS)

# Coverage-report lexicon (M8): the demo vocabulary plus terms that never
# occur in the documents corpus, so the missed-entities path is exercised
# for real, not vacuously.
COVERAGE_TERMS: dict[str, list[str]] = {
    "operator": DEMO_TERMS["operator"] + ["cube", "rollup"],
    "noun": DEMO_TERMS["noun"] + ["tensor", "index"],
}
COVERAGE_LEXICON = simple_lexicon(COVERAGE_TERMS)

_QUERY_VEC_ID = 0  # embeddings row used as the similarity-search query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Decimal widths chosen so every product stays within DECIMAL(38,_) in BOTH
# engines (Spark and DuckDB apply different precision-overflow rules above 38,
# so staying under the cap keeps the arithmetic exact and identical):
# price(18,4) * rate(9,6) * rate(9,6) -> scale 16, width 38.
def _dec_price(col):
    return col.cast("decimal(18,4)")


def _dec_rate(col):
    return col.cast("decimal(8,6)")


def _one_rate():
    return F.lit(1).cast("decimal(8,6)")


def _money(col):
    """Exact decimal aggregate -> stable double with 2 digits."""
    return F.round(F.sum(_dec_price(col)).cast("double"), 2)


def _doc_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    return detect_mentions(docs, DEMO_LEXICON)


def _cooccurrence_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level co-occurrence edges over the demo lexicon, triple-shaped:
    (subj < obj alphabetically, pred='cooccurs')."""
    m = (
        _doc_mentions(spark, sf_dir)
        .select("url", "canonical", "entity_class")
        .distinct()
        # pin before the self-join: each side of a self-join re-executes the
        # mention-scan mapInPandas otherwise (measured 2 Python stages here
        # and 10 in the ego query's iterated joins)
        .localCheckpoint(eager=False)
    )
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            [F.col("a.url") == F.col("b.url"), F.col("a.canonical") < F.col("b.canonical")],
        )
        .select(
            F.col("a.canonical").alias("subj"),
            F.col("a.entity_class").alias("subj_class"),
            F.lit("cooccurs").alias("pred"),
            F.col("b.canonical").alias("obj"),
            F.col("b.entity_class").alias("obj_class"),
            F.col("a.url").alias("url"),
        )
    )


# ---------------------------------------------------------------------------
# driver entry points
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG construction over the sf0.001 corpus — mention detection
    (mapInPandas over broadcast lexicon) -> co-occurrence relation scoring ->
    distinct triple rollup with provenance counts."""
    sf_dir = "/root/testdata/sf0.001"
    tri = _cooccurrence_triples(spark, sf_dir)
    return tri.groupBy("subj", "subj_class", "pred", "obj", "obj_class").agg(
        F.countDistinct("url").alias("n_docs")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- relational core (reference ops F/A/J/O/U, SURVEY.md §2.2/2.5-2.8)

    def q1_pricing_summary(spark, sf):
        li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
        disc = _dec_price(F.col("l_extendedprice")) * (_one_rate() - _dec_rate(F.col("l_discount")))
        charge = disc * (_one_rate() + _dec_rate(F.col("l_tax")))
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum(_dec_price(F.col("l_quantity"))).cast("double"), 2).alias("sum_qty"),
                _money(F.col("l_extendedprice")).alias("sum_base_price"),
                F.round(F.sum(disc).cast("double"), 2).alias("sum_disc_price"),
                F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    q["q1_pricing_summary"] = q1_pricing_summary

    def top10_orders_by_revenue(spark, sf):
        li = _t(spark, sf, "lineitem")
        rev = _dec_price(F.col("l_extendedprice")) * (_one_rate() - _dec_rate(F.col("l_discount")))
        return (
            li.groupBy("l_orderkey")
            .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), F.col("l_orderkey"))
            .limit(10)
        )

    q["top10_orders_by_revenue"] = top10_orders_by_revenue

    def revenue_by_nation(spark, sf):
        li, o, c, n = (
            _t(spark, sf, "lineitem"),
            _t(spark, sf, "orders"),
            _t(spark, sf, "customer"),
            _t(spark, sf, "nation"),
        )
        rev = _dec_price(F.col("l_extendedprice")) * (_one_rate() - _dec_rate(F.col("l_discount")))
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(
                F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
                F.countDistinct("o_orderkey").alias("n_orders"),
            )
        )

    q["revenue_by_nation"] = revenue_by_nation

    def customers_without_orders(spark, sf):
        c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
        return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
            "c_custkey", "c_name", "c_mktsegment"
        )

    q["customers_without_orders"] = customers_without_orders

    def incremental_dedup_probe(spark, sf):
        """Incremental (daily-shard) dedup gated end-to-end (VERDICT r4 #1;
        replaced order_priority_semi — its semi-join shape is still covered
        by decontaminated_docs' gram semi-join and the J1 anti-join family).
        The documents table is split deterministically by xxhash64(doc_id)
        into history (~80%) and a "new shard" (~20%); the shard is
        exact-deduped against the history fingerprint table
        (exact_fingerprints -> exact_dedup_against) and probed for
        cross-shard near-dups against a MinHash index built on history
        (minhash_index -> minhash_probe_near_dups, shared
        dedup.minhash_coeffs schedule).  One row per exact-survivor
        ('survivor', new_id) plus one per cross pair ('cross_pair', new_id,
        indexed_id, est_jaccard).  Oracle: pure-Python golden replay of the
        split rule, the fingerprint normalization, and the full MinHash
        band/bucket/agreement computation (scripts/golden_replay.py)."""
        from ontology_pipeline_spark.operators.dedup import (
            exact_dedup_against,
            exact_fingerprints,
            minhash_index,
            minhash_probe_near_dups,
        )

        docs = _t(spark, sf, "documents")
        is_shard = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(5)) == 0
        shard = docs.filter(is_shard)
        history = docs.filter(~is_shard)
        survivors = exact_dedup_against(shard, exact_fingerprints(history))
        pairs = minhash_probe_near_dups(
            shard, minhash_index(history), threshold=0.8
        )
        return survivors.select(
            F.lit("survivor").alias("kind"),
            F.col("doc_id").alias("new_id"),
            F.lit(None).cast("long").alias("indexed_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
        ).unionByName(
            pairs.select(
                F.lit("cross_pair").alias("kind"),
                "new_id",
                "indexed_id",
                "est_jaccard",
            )
        )

    q["incremental_dedup_probe"] = incremental_dedup_probe

    # (user_sessions retired in round 5: the driver checks at most 50
    # queries, and its lag-window shape is covered by latest_event_per_user
    # (ranking window) + the temporal as-of/range joins; gap-sessionization
    # itself stays pytest-covered.  Freed the slot for ingest_shard_summary
    # — VERDICT r4's "no new operator without a driver row" policy applied
    # to plans/ingest.py.)

    def ingest_shard_summary(spark, sf):
        """The incremental ingest COMPOSITION (plans/ingest.py) gated
        end-to-end: split the documents table deterministically by
        xxhash64(doc_id) pmod 2 into two shards, ingest them in order
        against a fresh on-disk state store (gates -> exact vs persisted
        fingerprints -> intra-shard MinHash clusters -> cross-shard probe
        vs the persisted band index -> commit state + lineage), then read
        back the COMMITTED state: one row per surviving (shard_id, doc_id)
        plus one lineage row per shard with the stage counters.  Exercises
        the full commit protocol (dynamic partition overwrite + lineage
        gate) through the same store the crash/resume tests use.  Oracle:
        pure-Python sequential replay of both ingests
        (scripts/golden_replay.py:replay_ingest — shared minhash_coeffs
        schedule, Murmur3 band buckets, committed-state accumulation).
        Reference semantic anchor: resume/merge at
        /root/reference/src/extractor.py:46-104, here at shard granularity."""
        import tempfile

        from ontology_pipeline_spark.plans.ingest import ParquetStateStore, ingest_shard

        docs = _t(spark, sf, "documents")
        part = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(2))
        store = ParquetStateStore(tempfile.mkdtemp(prefix="ingest_state_"))
        for i in (0, 1):
            ingest_shard(
                spark,
                docs.filter(part == F.lit(i)),
                shard_id=f"shard_{i:03d}",
                store=store,
            )
        counters = ["total_docs", "exact_survivors", "intra_survivors", "new_docs"]
        surv = (
            spark.read.parquet(store.documents_path)
            .join(store.committed_shards(spark), "shard_id", "left_semi")
            .select(
                F.lit("survivor").alias("kind"),
                "shard_id",
                "doc_id",
                *[F.lit(None).cast("long").alias(c) for c in counters],
            )
        )
        lineage = store.read_lineage(spark).select(
            F.lit("lineage").alias("kind"),
            "shard_id",
            F.lit(None).cast("long").alias("doc_id"),
            *counters,
        )
        return surv.unionByName(lineage)

    q["ingest_shard_summary"] = ingest_shard_summary

    def revenue_rollup(spark, sf):
        """Grouping-sets breadth: ROLLUP (nation, order year) with exact
        decimal totals."""
        o, c, n = (
            _t(spark, sf, "orders"),
            _t(spark, sf, "customer"),
            _t(spark, sf, "nation"),
        )
        return (
            o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .withColumn("o_year", F.year("o_orderdate").cast("long"))
            .rollup("n_name", "o_year")
            .agg(
                _money(F.col("o_totalprice")).alias("total_revenue"),
                F.count(F.lit(1)).alias("n_orders"),
            )
        )

    q["revenue_rollup"] = revenue_rollup

    # (mktsegment_acctbal retired in round 3: the driver checks at most 50
    # queries, and its customer group-agg coverage is subsumed by
    # revenue_by_nation / customers_without_orders / q1_pricing_summary.
    # Freed the slot for decontaminated_docs.)

    def decontaminated_docs(spark, sf):
        """Benchmark decontamination gate: documents sharing any word 7-gram
        with a deterministic held-out slice (doc_id % 37 == 0 plays the eval
        set) are flagged with their hit-gram count.  Exercises the broadcast
        gram semi-join path of operators/decontaminate.py end to end."""
        from ontology_pipeline_spark.operators.decontaminate import (
            benchmark_ngrams,
            contamination_hits,
        )

        d = _t(spark, sf, "documents")
        bench = d.filter(F.col("doc_id") % 37 == 0).select("text")
        grams = benchmark_ngrams(bench, n=7)
        return contamination_hits(d, grams, n=7).select("doc_id", "n_hit_grams")

    q["decontaminated_docs"] = decontaminated_docs

    def latest_order_before_event(spark, sf):
        """As-of join (cogrouped merge_asof): each event gets its user's
        latest order at or before the event time; unmatched events dropped
        to mirror the oracle's inner formulation."""
        from ontology_pipeline_spark.operators.temporal import asof_join

        events = _t(spark, sf, "events").select("event_id", "user_id", "ts")
        orders = _t(spark, sf, "orders")
        return (
            asof_join(
                events,
                orders,
                key="user_id",
                right_key="o_custkey",
                left_ts="ts",
                right_ts="o_orderdate",
                right_cols=["o_orderkey", "o_totalprice"],
                tiebreak=["o_orderkey"],
            )
            .filter(F.col("o_orderkey").isNotNull())
            .select(
                "event_id",
                "user_id",
                "o_orderkey",
                F.round(F.col("o_totalprice"), 2).alias("total"),
            )
        )

    q["latest_order_before_event"] = latest_order_before_event

    def orders_in_month_windows(spark, sf):
        """Bucketized range join: orders falling in the first 10 days of
        each month window derived from the data itself."""
        from ontology_pipeline_spark.operators.temporal import bucketized_range_join

        orders = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
        windows = (
            orders.select(F.date_trunc("month", "o_orderdate").alias("win_start"))
            .distinct()
            .withColumn("win_end", F.col("win_start") + F.expr("INTERVAL 10 DAYS"))
        )
        hit = bucketized_range_join(
            orders, windows, "o_orderdate", "win_start", "win_end",
            bucket_seconds=10 * 24 * 3600,
        )
        return hit.groupBy("win_start").agg(F.count(F.lit(1)).alias("n_orders"))

    q["orders_in_month_windows"] = orders_in_month_windows

    def events_daily_rollup(spark, sf):
        """The hypertable continuous-aggregate kernel (plans/rollup.py) as a
        direct query: per (day chunk, event_type) counts + exact decimal sums."""
        from ontology_pipeline_spark.plans.rollup import rollup_events

        return rollup_events(_t(spark, sf, "events"), "ts", "day")

    q["events_daily_rollup"] = events_daily_rollup

    def distinct_users_kmv(spark, sf):
        """KMV distinct sketch per event_type.  k=256 exceeds the corpus's
        user cardinality at the checked scales, where the sketch is exact by
        construction (bottom-k holds every distinct hash) — so the estimate
        is oracle-comparable while the query drives the real sketch path."""
        from ontology_pipeline_spark.operators.sketch import estimate_distinct

        return estimate_distinct(
            _t(spark, sf, "events"), ["event_type"], "user_id", k=256
        )

    q["distinct_users_kmv"] = distinct_users_kmv

    def props_json_stats(spark, sf):
        """JSON-path extraction over the events props column (P1 lenient
        parse semantics: malformed/missing keys become NULL, not errors)."""
        e = _t(spark, sf, "events")
        # try_cast, not cast: under Spark 4's default ANSI mode a plain cast
        # THROWS on non-integral values, while the documented contract (and
        # the DuckDB try_cast oracle) is NULL
        k = F.get_json_object("props", "$.k").try_cast("long")
        return (
            e.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(
                F.count("k").alias("n_with_k"),
                F.min("k").alias("min_k"),
                F.max("k").alias("max_k"),
            )
        )

    q["props_json_stats"] = props_json_stats

    def parts_by_brand(spark, sf):
        p = _t(spark, sf, "part")
        return p.groupBy("p_brand").agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_type").alias("n_types"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
        )

    q["parts_by_brand"] = parts_by_brand

    def lang_id_confusion(spark, sf):
        """Language-ID confusion rollup: labeled lang vs the stopword-argmax
        prediction (deterministic tie-break: min code; 'und' = no evidence)."""
        d = _t(spark, sf, "documents")
        return (
            d.select("lang", lang_id(F.col("text")).alias("predicted"))
            .groupBy("lang", "predicted")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    q["lang_id_confusion"] = lang_id_confusion

    # (suppliers_per_region retired in round 4 — see the oracle_sql note;
    # its broadcast-dim group-agg shape lives on in parts_by_brand and
    # revenue_by_nation.)

    def latest_event_per_user(spark, sf):
        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            e.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("user_id", "event_id", "event_type", "value")
        )

    q["latest_event_per_user"] = latest_event_per_user

    # (events_hourly retired in round 4 — events_daily_rollup covers the
    # bucketed time-series count+sum shape; events_by_type went in round 3,
    # its JSON-prop sum covered by props_json_stats.)

    def point_lookup_order(spark, sf):
        return _t(spark, sf, "orders").filter(F.col("o_orderkey") == 100).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority"
        )

    q["point_lookup_order"] = point_lookup_order

    # ---- text / document operators (F6/F9/P4-P6, text_analysis, dedup)

    def doc_truncate_project(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select(
            "doc_id",
            F.substring(F.col("text"), 1, 100).alias("prefix_100"),
            F.length(F.col("text")).alias("text_len"),
            F.lower(F.substring(F.col("text"), 1, 10)).alias("head_lc"),
        )

    q["doc_truncate_project"] = doc_truncate_project

    def keyword_scan_docs(spark, sf):
        d = _t(spark, sf, "documents")
        hit = F.lower(F.col("text")).contains("spark") & F.lower(F.col("text")).contains("join")
        return d.filter(hit).groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))

    q["keyword_scan_docs"] = keyword_scan_docs

    def doc_mentions(spark, sf):
        m = _doc_mentions(spark, sf)
        return m.groupBy(
            F.col("canonical").alias("term"), F.col("entity_class")
        ).agg(
            F.countDistinct("url").alias("n_docs"),
            F.count(F.lit(1)).alias("n_mentions"),
        )

    q["doc_mentions"] = doc_mentions

    def ontology_coverage(spark, sf):
        """M8 missed-entity report (VERDICT r1 #5): per-class lexicon
        coverage over the documents corpus + the '|'-joined list of lexicon
        canonicals the corpus never mentions (reference validation_guided
        gap review, src/prompts.py:602-641)."""
        from ontology_pipeline_spark.operators.docs import coverage_report

        docs = _t(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("url"), "text"
        )
        return coverage_report(detect_mentions(docs, COVERAGE_LEXICON), COVERAGE_LEXICON)

    q["ontology_coverage"] = ontology_coverage

    def doc_cooccurrence_edges(spark, sf):
        tri = _cooccurrence_triples(spark, sf)
        return tri.groupBy("subj", "obj").agg(F.countDistinct("url").alias("n_docs"))

    q["doc_cooccurrence_edges"] = doc_cooccurrence_edges

    def ego_1hop_join(spark, sf):
        tri = _cooccurrence_triples(spark, sf).select(
            "subj", "subj_class", "pred", "obj", "obj_class", "url"
        )
        edges = (
            tri.groupBy("subj", "subj_class", "pred", "obj", "obj_class")
            .agg(F.countDistinct("url").alias("n_docs"))
            .withColumn("url", F.lit("corpus"))
            # ego_edges iterates joins over this frame — pin it so the whole
            # upstream (mention scan + aggregation) executes once
            .localCheckpoint(eager=False)
        )
        ego = ego_edges(edges, "join", hops=1)
        return ego.select("subj", "obj", "n_docs")

    q["ego_1hop_join"] = ego_1hop_join

    def entity_rollup_langs(spark, sf):
        docs = _t(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("url"), "text", "lang"
        )
        m = detect_mentions(docs, DEMO_LEXICON).select("url", "canonical").distinct()
        joined = m.join(docs.select("url", "lang"), "url")
        return joined.groupBy(F.col("canonical").alias("term")).agg(
            F.countDistinct("url").alias("n_docs"),
            F.array_join(F.sort_array(F.collect_set("lang")), "|").alias("langs"),
        )

    q["entity_rollup_langs"] = entity_rollup_langs

    def fingerprint_stats(spark, sf):
        d = _t(spark, sf, "documents")
        return d.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(fingerprint(F.col("text"))).alias("n_distinct_fp"),
        )

    q["fingerprint_stats"] = fingerprint_stats

    def near_dup_jaccard(spark, sf):
        # blocked-pairs path (prefix_filter=False): at testdata scale the
        # (lang, source) blocks hold ~100 docs, where exhaustive in-block
        # enumeration beats the PPJoin prefix path's extra df shuffles; the
        # prefix-filtered default is the web-scale choice and is asserted
        # pair-identical in tests/test_dedup.py.
        return ngram_jaccard_pairs(
            _t(spark, sf, "documents"),
            block_cols=["lang", "source"],
            n=1,
            threshold=0.8,
            salt=4,
            prefix_filter=False,
        )

    q["near_dup_jaccard"] = near_dup_jaccard

    def doc_quality_minmax(spark, sf):
        d = _t(spark, sf, "documents")
        qcol = quality_score(F.col("text"))
        return d.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(qcol).alias("min_quality"),
            F.max(qcol).alias("max_quality"),
        )

    q["doc_quality_minmax"] = doc_quality_minmax

    def top_tokens(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.col("token"))
            .limit(20)
        )

    q["top_tokens"] = top_tokens

    # ---- embeddings / similarity search

    def cosine_topk_q0(spark, sf):
        emb = _t(spark, sf, "embeddings")
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == _QUERY_VEC_ID).collect()[0]["embedding"]
        ]
        return cosine_topk(emb, qv, k=20)

    q["cosine_topk_q0"] = cosine_topk_q0

    def ivf_blocked_close_pairs(spark, sf):
        """Mid-threshold embedding pairs via data-adaptive IVF-cell blocking
        (round 4; replaced embedding_minmax_by_label — see oracle_sql note):
        sampled_centers -> ivf_assign_multi (4 nearest cells per vector) ->
        exact-cosine pairs within cells -> dedup, at t=0.35 where sign-LSH
        banding collapses.  n_assign=4 is the recommended (and here gated)
        configuration: recall vs unblocked brute force 0.93, vs 0.53 at
        n_assign=2 and 0.21 for banded sign-LSH (per-configuration table in
        BENCH/embedding_blocking.md).  Oracle: independent pure-Python
        replay of the seeded centroid draw, the multi-assignment top-4
        selection, and every pair cosine (golden VALUES)."""
        from ontology_pipeline_spark.operators.dedup import ivf_blocked_pairs

        return ivf_blocked_pairs(
            _t(spark, sf, "embeddings"),
            threshold=0.35, n_centroids=16, n_assign=4,
        )

    q["ivf_blocked_close_pairs"] = ivf_blocked_close_pairs

    # ---- non-SQL-expressible ops (rows-only driver check)

    def minhash_near_dups(spark, sf):
        # 8 rows per band: collision probability J^8, so the candidate set
        # stays sparse even on this small-vocabulary corpus
        return minhash_lsh_pairs(
            _t(spark, sf, "documents"), num_hashes=32, bands=4, shingle_n=2
        ).filter(F.col("est_jaccard") >= 0.8)

    q["minhash_near_dups"] = minhash_near_dups

    def simhash_bucket_groups(spark, sf):
        return simhash_buckets(_t(spark, sf, "documents"), prefix_bits=10).select(
            "bucket", "n_docs"
        )

    q["simhash_bucket_groups"] = simhash_bucket_groups

    def dedup_clusters(spark, sf):
        """Transitive near-dup clustering (VERDICT r1 #9): LSH pairs
        connected into components, min-doc_id representative.  Value-checked
        against an independent union-find replay (golden VALUES oracle)."""
        from ontology_pipeline_spark.operators.dedup import minhash_dedup_clusters

        return minhash_dedup_clusters(_t(spark, sf, "documents"))

    q["dedup_clusters"] = dedup_clusters

    def embedding_dedup_clusters(spark, sf):
        """Embedding near-dup CLUSTERS: cosine pairs within label blocks
        (same parameters as embedding_close_pairs) collapsed by connected
        components, min-vec_id representative.  Fully SQL-expressible: the
        oracle recomputes the pairs in DuckDB and propagates min labels with
        a recursive CTE (the standalone CC-oracle pattern)."""
        from ontology_pipeline_spark.operators.canonicalize import connected_components

        pairs = embedding_cosine_pairs(
            _t(spark, sf, "embeddings"), block_col="label", threshold=0.35
        )
        cc = connected_components(
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        )
        return cc.select(
            F.col("node").alias("vec_id"), F.col("component").alias("cluster_id")
        )

    q["embedding_dedup_clusters"] = embedding_dedup_clusters

    def doc_sample_methods(spark, sf):
        """Deterministic sampling, BOTH methods in one value check (round 4;
        was doc_hash_sample): `hash_sample` keeps keys below 10% of the hash
        space; `mixture_sample` applies per-source keep rates (1.0 / 0.5 /
        0.2, default 0.05) — the domain-mixture resampling step of a
        training-data pipeline, same hash-rank rule per group.  Both are
        narrow scan-fused filters; golden replay oracle recomputes each
        threshold decision from the XXH64 spec."""
        from ontology_pipeline_spark.operators.sampling import (
            hash_sample,
            mixture_sample,
        )

        d = _t(spark, sf, "documents")
        hs = hash_sample(d, "doc_id", 0.1).select(
            F.lit("hash").alias("method"), "doc_id", "source"
        )
        mx = mixture_sample(
            d, "source", {"src0": 1.0, "src1": 0.5, "src2": 0.2},
            "doc_id", default_rate=0.05,
        ).select(F.lit("mixture").alias("method"), "doc_id", "source")
        return hs.unionByName(mx)

    q["doc_sample_methods"] = doc_sample_methods

    def stratified_doc_sample(spark, sf):
        """Per-source stratified draw: the 3 docs with the smallest
        (hash rank, key) per stratum — exactly n per group, deterministic,
        WindowGroupLimit-pruned below the exchange.  Golden replay oracle."""
        from ontology_pipeline_spark.operators.sampling import stratified_hash_sample

        return stratified_hash_sample(
            _t(spark, sf, "documents"), ["source"], 3, "doc_id"
        ).select("source", "doc_id")

    q["stratified_doc_sample"] = stratified_doc_sample

    def curated_documents(spark, sf):
        """The full training-data curation chain (plans/curate.py):
        language gate -> quality floor -> exact dedup -> transitive
        near-dup drop -> duplicated-span REMOVAL (drop_spans=True, 4-token
        runs — the round-4 stage, so the COMPOSITION is value-checked, not
        just the standalone operator).  End-to-end check: survivors,
        quality scores, and per-doc dropped-token counts are all replayed
        independently in pure Python (golden VALUES oracle)."""
        from ontology_pipeline_spark.plans.curate import curate_documents as curate

        return curate(
            _t(spark, sf, "documents"), drop_spans=True, span_n=4
        ).select("doc_id", "source", "quality", "n_dropped_tokens")

    q["curated_documents"] = curated_documents

    def chunked_pack_stats(spark, sf):
        """Training-prep chunking + sequence packing (VERDICT r3 #1):
        context-window chunks (64 tokens, overlap 8) packed next-fit into
        256-token bins across 8 deterministic hash shards, summarized per
        shard (chunk/pack counts, token totals, fill), PLUS the materialized
        bins (`pack_texts`): bins_hash sums a bounded hash of each bin's
        joined text, so bin membership AND intra-bin order are
        value-checked (lengths alone are linear in the other columns).
        All three operators are deterministic pure functions of the token
        arrays, so the oracle is an independent pure-Python recomputation
        (golden VALUES)."""
        from ontology_pipeline_spark.operators.chunking import (
            chunk_documents,
            pack_chunks,
            pack_texts,
        )

        chunks = chunk_documents(
            _t(spark, sf, "documents"), chunk_tokens=64, overlap=8
        )
        # pin: `packed` (an applyInPandas stage) feeds both the per-chunk
        # aggregate and the bin materialization (multi-consumer rule)
        packed = pack_chunks(chunks, budget=256, n_groups=8).localCheckpoint(
            eager=False
        )
        per_group = packed.groupBy("pack_group").agg(
            F.count(F.lit(1)).alias("n_chunks"),
            (F.max("pack_id") + 1).alias("n_packs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.max("pack_fill").alias("max_fill"),
            F.sum(F.length("chunk_text")).alias("sum_chars"),
        )
        # pmod to 2^40 keeps the per-group sum far inside int64 (ANSI mode
        # would error loudly on a raw signed-hash sum)
        bins = pack_texts(packed, sep="\n").groupBy("pack_group").agg(
            F.sum(F.pmod(F.xxhash64("text"), F.lit(1 << 40))).alias("bins_hash"),
        )
        return per_group.join(bins, "pack_group")

    q["chunked_pack_stats"] = chunked_pack_stats

    def duplicated_span_stats(spark, sf):
        """Exact-substring span dedup, detection AND removal (VERDICT r3
        #1/#2): per affected document, the merged >=8-token cross-doc spans
        (count, covered tokens, flagged gram positions) joined with the
        tokens actually dropped by the canonical-owner removal
        (dedup.drop_duplicated_spans).  Canonical owners appear with
        n_dropped_tokens=0 — the keep-one-occurrence semantics made
        visible.  Oracle: independent pure-Python gram replay over the
        same XXH64 (golden VALUES).  pin=False: the input is a plain
        parquet scan, re-reading beats checkpointing."""
        from ontology_pipeline_spark.operators.dedup import (
            drop_duplicated_spans,
            duplicated_spans,
        )

        d = _t(spark, sf, "documents")
        per_doc = duplicated_spans(d, n=8, min_docs=2).groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
            F.sum("n_dup_grams").alias("n_dup_grams"),
        )
        removed = drop_duplicated_spans(d, n=8, min_docs=2, pin=False).select(
            "doc_id", "n_dropped_tokens"
        )
        return per_doc.join(removed, "doc_id")

    q["duplicated_span_stats"] = duplicated_span_stats

    def entity_pagerank(spark, sf):
        """Entity importance over the SYNTHETIC KG's triple graph: 10 rounds
        of damped power iteration (graph.pagerank).  The graph is
        NON-regular (head-entity skew), so the golden replay oracle — an
        independent pure-Python iteration over the corpus's by-construction
        golden edge set — has real power: a broken degree/damping/iteration
        would diverge from it (the demo-lexicon co-occurrence graph at
        sf0.01 is complete and therefore uniform == vacuous)."""
        from ontology_pipeline_spark.synth import generate_corpus, pages_df

        corpus = generate_corpus(n_pages=200, seed=13)
        tri = extract_triples_fused(pages_df(spark, corpus), lexicon_rows())
        edges = (
            tri.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .distinct()
        )
        return pagerank(edges)

    q["entity_pagerank"] = entity_pagerank

    def ann_topk_q0(spark, sf):
        """Sign-LSH ANN against a PREBUILT bucket index (VERDICT r2 #3, the
        mirror of the IVF build/probe split): `with_lsh_bucket` is the BUILD
        step — computed once per corpus and at scale written partitioned by
        bucket — and `lsh_probe_topk` probes only the multi-probe Hamming
        ball via a bucket `isin` that becomes partition pruning on a
        partitioned read (plan asserted in tests/test_similarity.py).  No
        per-query full-table bucket recompute."""
        emb = _t(spark, sf, "embeddings")
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == _QUERY_VEC_ID).collect()[0]["embedding"]
        ]
        planes = hyperplanes(len(qv), n_planes=8, seed=42)
        bucketed = with_lsh_bucket(emb, planes)  # BUILD (once per corpus)
        return lsh_probe_topk(bucketed, planes, qv, k=10, max_hamming=2)

    q["ann_topk_q0"] = ann_topk_q0

    def ivf_ann_q0(spark, sf):
        """IVF ANN against a PREBUILT index (VERDICT r1 #2: no per-query
        fit).  The index here is the sampled-centroid coarse quantizer
        (`sampled_centers` + `ivf_assign`) — deterministic and exactly
        replayable cross-engine, unlike a k-means fit whose distributed
        float reductions are not bit-reproducible; the k-means quantizer
        (`ivf_index`) remains the quality path and is recall-tested in
        tests/test_similarity.py.  At scale the `ivf_assign` output is
        written partitioned by ivf_cell and `ivf_probe_topk` reads it with
        partition pruning (tested)."""
        emb = _t(spark, sf, "embeddings")
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == _QUERY_VEC_ID).collect()[0]["embedding"]
        ]
        centers = sampled_centers(emb, n_centroids=16)
        assigned = ivf_assign(emb, centers)
        return ivf_probe_topk(assigned, centers, qv, k=10, n_probe=4)

    q["ivf_ann_q0"] = ivf_ann_q0

    def embedding_close_pairs(spark, sf):
        """Embedding near-dup pairs within label blocks.  The synthetic
        vectors are near-orthogonal (max in-block cosine ~0.47), so the 0.35
        threshold exercises the operator with a small non-empty result."""
        return embedding_cosine_pairs(
            _t(spark, sf, "embeddings"), block_col="label", threshold=0.35
        )

    q["embedding_close_pairs"] = embedding_close_pairs

    def node_degrees(spark, sf):
        """Degree per node over the corpus co-occurrence graph (undirected:
        union both endpoints, count distinct neighbors)."""
        edges = (
            _cooccurrence_triples(spark, sf)
            .select("subj", "obj")
            .distinct()
        )
        sym = edges.union(edges.select(F.col("obj"), F.col("subj")))
        return sym.groupBy(F.col("subj").alias("node")).agg(
            F.countDistinct("obj").alias("degree")
        )

    q["node_degrees"] = node_degrees

    def kg_triples_synthetic(spark, sf):
        from ontology_pipeline_spark.synth import generate_corpus, pages_df

        corpus = generate_corpus(n_pages=200, seed=13)
        tri = extract_triples_fused(pages_df(spark, corpus), lexicon_rows())
        return tri.groupBy("subj", "subj_class", "pred", "obj", "obj_class").agg(
            F.countDistinct("url").alias("n_pages")
        )

    q["kg_triples_synthetic"] = kg_triples_synthetic

    def kg_fuzzy_canonical_triples(spark, sf):
        """End-to-end fuzzy canonicalization (VERDICT r1 #3): seeded
        misspellings ("Sleep Quaity", "Functonal Mobility", ...) in page
        text are invisible to the lexicon regex; capitalized candidate
        spans are linked through the exact tier + the deterministic
        grams-MinHash fuzzy tier (`link_fuzzy_grams`), collapsed by
        connected components (`canonical_mapping`), and the recovered
        surfaces re-enter the fused extraction as lexicon aliases —
        reproducing the corpus's golden triples exactly as if nothing were
        misspelled.  The oracle is the by-construction golden triple set of
        the UNmisspelled corpus, so a green row proves the recovery loop,
        not just the scan."""
        from ontology_pipeline_spark.lexicon import lexicon_df
        from ontology_pipeline_spark.operators.canonicalize import canonical_mapping
        from ontology_pipeline_spark.operators.linking import (
            candidate_surfaces,
            link_entities,
        )
        from ontology_pipeline_spark.synth import generate_misspelled_corpus, pages_df

        corpus, _injected = generate_misspelled_corpus(n_pages=200, seed=17)
        pages = pages_df(spark, corpus)
        cands = candidate_surfaces(pages.select("text"))
        linked = link_entities(
            cands, lexicon_df(spark), fuzzy=True, fuzzy_method="grams"
        )
        pairs = linked.filter(F.col("linked_canonical").isNotNull())
        mapping = canonical_mapping(pairs)  # name -> component representative

        # Fold the recovered surfaces back into the lexicon: per component,
        # the canonical is the member that IS a lexicon canonical name; every
        # other member becomes an alias of it.  The collect is bounded by the
        # linked surface vocabulary (lexicon-sized, NOT corpus-sized).
        lex_rows = lexicon_rows()
        canon_info = {c: (cls, p, u) for cls, c, _a, p, u in lex_rows}
        by_comp: dict[str, list[str]] = {}
        for r in mapping.collect():
            by_comp.setdefault(r["canonical_id"], []).append(r["name"])
        aug = list(lex_rows)
        seen = {(c, a.lower()) for c, _x, a, _p, _u in lex_rows}
        for _comp, members in sorted(by_comp.items()):
            canons = sorted(m for m in members if m in canon_info)
            if not canons:
                continue
            canon = canons[0]
            cls, parent, unit = canon_info[canon]
            for m in sorted(members):
                key = (cls, m.lower())
                if key in seen:
                    continue
                seen.add(key)
                aug.append((cls, canon, m, parent, unit))

        tri = extract_triples_fused(pages, aug)
        return tri.groupBy("subj", "subj_class", "pred", "obj", "obj_class").agg(
            F.countDistinct("url").alias("n_pages")
        )

    q["kg_fuzzy_canonical_triples"] = kg_fuzzy_canonical_triples

    def extraction_docs_synthetic(spark, sf):
        """Reference-shaped per-page extraction documents (flattened scalar
        projection so the driver gets a stable schema)."""
        from ontology_pipeline_spark.operators.relations import score_relations
        from ontology_pipeline_spark.plans.documents import assemble_docs
        from ontology_pipeline_spark.synth import generate_corpus, pages_df

        corpus = generate_corpus(n_pages=200, seed=13)
        pages = pages_df(spark, corpus)
        lex = lexicon_rows()
        # one mention scan pinned and reused by both consumers; triples via
        # the join path (multiset-equal to the fused path, tested) instead
        # of a second full-page Python stage
        ments = detect_mentions(pages, lex).localCheckpoint(eager=False)
        docs = assemble_docs(ments, score_relations(ments), pages, pin_mentions=False)
        return docs.select(
            "url",
            "text_length",
            "constructs_identified",
            F.size("assessments").alias("n_assessments"),
            F.size("interventions").alias("n_interventions"),
            F.size("relationships.construct_relationships").alias("n_construct_rels"),
            F.size("relationships.assessment_construct_links").alias("n_ac_links"),
            # fidelity fields filled in round 2 (VERDICT r1 #2): per-page
            # totals of per-assessment constructs_measured, metrics with an
            # assessment_source, vendor-attributed technologies, and the
            # lexicographically first metric source (value-level probe)
            F.size(F.flatten("assessments.constructs_measured")).alias("n_measured_constructs"),
            F.size(
                F.filter("metrics", lambda m: m["assessment_source"].isNotNull())
            ).alias("n_sourced_metrics"),
            F.size(
                F.filter("technologies", lambda t: t["vendor_manufacturer"].isNotNull())
            ).alias("n_vendored_techs"),
            F.array_min(
                F.filter(
                    F.transform("metrics", lambda m: m["assessment_source"]),
                    lambda x: x.isNotNull(),
                )
            ).alias("first_metric_source"),
            F.size(F.flatten("technologies.used_for_assessments")).alias("n_tech_links"),
            # round-3 fidelity probes (VERDICT r2 #4): per-intervention
            # constructs_targeted totals, modality value, typed-intervention
            # count — all re-derived independently by the oracle
            F.size(F.flatten("interventions.constructs_targeted")).alias("n_targeted_constructs"),
            F.array_min(
                F.filter(
                    F.transform("assessments", lambda a: a["modality"]),
                    lambda x: x.isNotNull(),
                )
            ).alias("first_modality"),
            F.size(
                F.filter("interventions", lambda i: i["intervention_types"].isNotNull())
            ).alias("n_typed_interventions"),
        ).orderBy("url")

    q["extraction_docs_synthetic"] = extraction_docs_synthetic

    def goals_constraints_fixture(spark, sf):
        """M5 cue-scan pass on a deterministic consultation-style fixture;
        the oracle replays the same RE2-safe cue rules in DuckDB."""
        from ontology_pipeline_spark.operators.cues import cue_scan

        pages = spark.createDataFrame(
            [(u, "\n".join(s)) for u, s in _CUE_FIXTURE], ["url", "text"]
        )
        return cue_scan(pages).select(
            "url", F.col("sent_id").cast("long").alias("sent_id"), "kind", "sentence"
        )

    q["goals_constraints_fixture"] = goals_constraints_fixture

    def protocols_fixture(spark, sf):
        """M7 dosage-pattern pass on a deterministic fixture; the oracle
        replays the same RE2-safe patterns via regexp_extract_all."""
        from ontology_pipeline_spark.operators.protocols import (
            extract_protocol_details,
        )

        pages = spark.createDataFrame(
            [(u, "\n".join(s)) for u, s in _PROTOCOL_FIXTURE], ["url", "text"]
        )
        return extract_protocol_details(pages).select(
            "url",
            F.col("sent_id").cast("long").alias("sent_id"),
            "kind",
            "detail",
            "sentence",
        )

    q["protocols_fixture"] = protocols_fixture

    def multimodal_media_stats(spark, sf):
        """REAL multimodal decode across ALL THREE media kinds (VERDICT r2
        #1, extended in round 3): seeded synthetic PNGs (every filter type
        0-4, gray/gray-alpha/RGB/RGBA, uneven sizes) + PCM WAV audio + Y4M
        video -> pure-stdlib pixel/sample/plane decode -> one wide
        per-media stats row (NULL for the columns the kind doesn't have).
        The golden replay computes every expected row from the
        GENERATION-side arrays (pixels/waveforms/planes — never running the
        decoders), so a hash match proves each encode -> decode -> featurize
        path is lossless.  Negative rows (garbage bytes, truncated PNG, fake
        mp4/RIFF containers, NULL payload) flow through every stage and are
        dropped by the per-stage format-NULL filters — the never-raise
        contract runs in every check."""
        from ontology_pipeline_spark.operators.multimodal import (
            audio_stats,
            image_channel_stats,
            video_stats,
        )
        from ontology_pipeline_spark.synth import (
            bmff_encode_meta,
            generate_media_corpus,
            media_df,
        )

        corpus = generate_media_corpus(n_images=48, seed=11)
        media = media_df(spark, corpus)
        # round 4: ISO-BMFF metadata rows — video_stats must surface
        # moov/mvhd/trak metadata ("isobmff" format, mvhd duration, first
        # video track dims) for compressed containers whose PIXELS need a
        # codec.  By-construction golden: the replay derives the expected
        # rows from these same literal track layouts, never running the
        # box walker.
        bmff = spark.createDataFrame(
            [
                ("bmf000", "video",
                 bmff_encode_meta(duration_ms=3500, tracks=[("vide", "avc1", 640, 360), ("soun", "mp4a", 0, 0)]),
                 "video/mp4", 640, 360, 3500, "bmff"),
                ("bmf001", "video",
                 bmff_encode_meta(duration_ms=12000, timescale=90000, tracks=[("vide", "hvc1", 1920, 1080)]),
                 "video/mp4", 1920, 1080, 12000, "bmff"),
                ("bmf002", "video",
                 bmff_encode_meta(duration_ms=800, tracks=[("soun", "mp4a", 0, 0)]),
                 "video/mp4", None, None, 800, "bmff"),
            ],
            media.schema,
        )
        media = media.unionByName(bmff)
        null_l = F.lit(None).cast("long")
        null_d = F.lit(None).cast("double")
        img = (
            image_channel_stats(media, resize_to=(4, 4))
            .filter(F.col("format").isNotNull())
            .select(
                "media_id", "format", "width", "height", "channels",
                null_l.alias("sample_rate"), null_l.alias("n_frames"),
                null_l.alias("duration_ms"), "mean_all", "mean_c0",
                "resized_mean", null_l.alias("peak"), null_d.alias("rms"),
                null_d.alias("y_mean"),
            )
        )
        aud = (
            audio_stats(media)
            .filter(F.col("format").isNotNull())
            .select(
                "media_id", "format", null_l.alias("width"),
                null_l.alias("height"), "channels", "sample_rate",
                "n_frames", "duration_ms", null_d.alias("mean_all"),
                null_d.alias("mean_c0"), null_d.alias("resized_mean"),
                "peak", "rms", null_d.alias("y_mean"),
            )
        )
        vid = (
            video_stats(media)
            .filter(F.col("format").isNotNull())
            .select(
                "media_id", "format", "width", "height",
                null_l.alias("channels"), null_l.alias("sample_rate"),
                "n_frames", "duration_ms", null_d.alias("mean_all"),
                null_d.alias("mean_c0"), null_d.alias("resized_mean"),
                null_l.alias("peak"), null_d.alias("rms"), "y_mean",
            )
        )
        return (
            img.unionByName(aud)
            .unionByName(vid)
            .join(F.broadcast(media.select("media_id", "kind", "label")), "media_id")
            .select(
                "media_id", "kind", "label", "format", "width", "height",
                "channels", "sample_rate", "n_frames", "duration_ms",
                "mean_all", "mean_c0", "resized_mean", "peak", "rms", "y_mean",
            )
        )

    q["multimodal_media_stats"] = multimodal_media_stats

    # (canonical_components retired in round 3 — VERDICT r2 "missing" #1: the
    # driver checks at most 50 queries and this 51st entry was silently
    # unchecked.  G5 coverage remains end-to-end in kg_fuzzy_canonical_triples
    # (connected components over fuzzy-linked surfaces, hash-green), the
    # standalone recursive-CTE CC oracle pattern remains in
    # embedding_dedup_clusters, and canonical_mapping keeps its direct pytest
    # coverage in tests/test_linking.py.)

    return q


# ---------------------------------------------------------------------------
# DuckDB oracles (same aliases, same float conventions)
# ---------------------------------------------------------------------------

_LEX_VALUES = ", ".join(
    f"('{alias}', '{cls}')" for cls, _canon, alias, _p, _u in DEMO_LEXICON
)

# Mention counting over the documents corpus reduces to exact-token equality,
# which both engines express identically — RE2 in DuckDB lacks the lookaround
# word boundaries the Spark scanner uses, so the oracle counts tokens instead.
# Tokens split on NON-ALPHANUMERIC runs (not just whitespace): the Spark
# matcher anchors terms with (?<![A-Za-z0-9])...(?![A-Za-z0-9]), so a term
# adjacent to punctuation counts as mentioned — the tokenizers must agree.
_HITS_CTE = rf"""
lex(term, entity_class) AS (VALUES {_LEX_VALUES}),
tokall AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tok
    FROM documents
),
hits AS (
    SELECT t.doc_id, l.term, l.entity_class,
           len(list_filter(t.tok, x -> x = l.term)) AS n
    FROM tokall t CROSS JOIN lex l
)
"""

_TOKS_CTE = r"""
toks AS (
    SELECT doc_id, lang, source,
           list_distinct(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> len(x) > 0)) AS tok
    FROM documents
)
"""


# M5 cue-scan fixture: sentences shared verbatim by the Spark query (joined
# with '\n' and re-split by the engine) and the DuckDB oracle (pre-split
# VALUES, sidestepping RE2's lack of the lookbehind the splitter uses).
_CUE_FIXTURE: list[tuple[str, list[str]]] = [
    (
        "https://c1.test",
        [
            "The client's goal is to improve Sleep Quality and Aerobic Capacity.",
            "She prefers morning sessions and wants to avoid maximal testing.",
            "Adaptation depends on training history and recovery.",
        ],
    ),
    (
        "https://c2.test",
        [
            "We scheduled a VO2 Max Test to assess Aerobic Capacity.",
            "Response varies with genetics.",
            "No issues were reported.",
        ],
    ),
    (
        "https://c3.test",
        [
            "Client hopes to return to competition soon.",
            "He cannot train on weekends and has limited equipment.",
        ],
    ),
]


_PROTOCOL_FIXTURE: list[tuple[str, list[str]]] = [
    (
        "https://p1.test",
        [
            "The 12-week Progressive Resistance Training program uses 3 sets of 8 reps at 75% of 1rm.",
            "Clients complete 3 sessions per week for better Sleep Quality.",
        ],
    ),
    (
        "https://p2.test",
        [
            "A VO2 Max Test lasts 20 minutes.",
            "No dosage details here.",
        ],
    ),
]


def _protocol_fixture_oracle() -> str:
    from ontology_pipeline_spark.operators.protocols import PROTOCOL_PATTERNS

    esc = lambda s: s.replace("'", "''")
    sent_values = ", ".join(
        f"('{esc(u)}', {i}, '{esc(s)}')"
        for u, sents in _PROTOCOL_FIXTURE
        for i, s in enumerate(sents)
    )
    pat_values = ", ".join(f"('{k}', '{esc(p)}')" for k, p in PROTOCOL_PATTERNS)
    return f"""
        WITH sents(url, sent_id, sentence) AS (VALUES {sent_values}),
        pats(kind, pattern) AS (VALUES {pat_values})
        SELECT url, sent_id::BIGINT AS sent_id, kind,
               unnest(regexp_extract_all(lower(sentence), pattern)) AS detail,
               sentence
        FROM sents CROSS JOIN pats
    """


def _cue_fixture_oracle() -> str:
    from ontology_pipeline_spark.operators.cues import DEFAULT_CUES

    esc = lambda s: s.replace("'", "''")
    sent_values = ", ".join(
        f"('{esc(u)}', {i}, '{esc(s)}')"
        for u, sents in _CUE_FIXTURE
        for i, s in enumerate(sents)
    )
    cue_values = ", ".join(f"('{k}', '{esc(p)}')" for k, p in DEFAULT_CUES)
    return f"""
        WITH sents(url, sent_id, sentence) AS (VALUES {sent_values}),
        cues(kind, pattern) AS (VALUES {cue_values})
        SELECT url, sent_id::BIGINT AS sent_id, kind, sentence
        FROM sents JOIN cues ON regexp_matches(lower(sentence), pattern)
    """


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(cast(sum(cast(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
               round(cast(sum(cast(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
               round(cast(sum(cast(l_extendedprice AS DECIMAL(20,4)) * (cast(1 AS DECIMAL(8,6)) - cast(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 2) AS sum_disc_price,
               round(cast(sum(cast(l_extendedprice AS DECIMAL(20,4)) * ((cast(1 AS DECIMAL(8,6)) - cast(l_discount AS DECIMAL(8,6))) * (cast(1 AS DECIMAL(8,6)) + cast(l_tax AS DECIMAL(8,6))))) AS DOUBLE), 2) AS sum_charge,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """

    o["top10_orders_by_revenue"] = """
        SELECT l_orderkey,
               round(cast(sum(cast(l_extendedprice AS DECIMAL(18,4)) * (cast(1 AS DECIMAL(8,6)) - cast(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 2) AS revenue
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """

    o["revenue_by_nation"] = """
        SELECT n.n_name,
               round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,4)) * (cast(1 AS DECIMAL(8,6)) - cast(l.l_discount AS DECIMAL(8,6)))) AS DOUBLE), 2) AS revenue,
               count(DISTINCT o.o_orderkey) AS n_orders
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """

    o["customers_without_orders"] = """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """

    # (user_sessions oracle retired with the query in round 5 — slot freed
    # for ingest_shard_summary, whose golden VALUES oracle lives in
    # golden_approx.py like the other replayed queries.)

    o["revenue_rollup"] = """
        SELECT n_name, cast(year(o_orderdate) AS BIGINT) AS o_year,
               round(cast(sum(cast(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, cast(year(o_orderdate) AS BIGINT))
    """

    o["decontaminated_docs"] = r"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'),
                               t -> t <> '') AS toks
            FROM documents
        ),
        bgrams AS (
            SELECT DISTINCT array_to_string(toks[i : i + 6], ' ') AS gram
            FROM tok, UNNEST(range(1, len(toks) - 5)) AS u(i)
            WHERE doc_id % 37 = 0 AND len(toks) >= 7
        ),
        dgrams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i : i + 6], ' ') AS gram
            FROM tok, UNNEST(range(1, len(toks) - 5)) AS u(i)
            WHERE len(toks) >= 7
        )
        SELECT d.doc_id, count(*) AS n_hit_grams
        FROM dgrams d
        WHERE d.gram IN (SELECT gram FROM bgrams)
        GROUP BY d.doc_id
    """

    o["latest_order_before_event"] = """
        WITH ranked AS (
            SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            JOIN orders o
              ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id, o_orderkey,
               round(o_totalprice, 2) AS total
        FROM ranked WHERE rn = 1
    """

    o["orders_in_month_windows"] = """
        WITH windows AS (
            SELECT DISTINCT date_trunc('month', o_orderdate) AS win_start,
                   date_trunc('month', o_orderdate) + INTERVAL 10 DAY AS win_end
            FROM orders
        )
        SELECT w.win_start, count(*) AS n_orders
        FROM orders o JOIN windows w
          ON o.o_orderdate >= w.win_start AND o.o_orderdate < w.win_end
        GROUP BY w.win_start
    """

    o["events_daily_rollup"] = """
        SELECT date_trunc('day', ts) AS chunk, event_type,
               count(*) AS n_events,
               round(cast(sum(cast(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS value_sum
        FROM events
        GROUP BY 1, 2
    """

    o["distinct_users_kmv"] = """
        SELECT event_type, cast(count(DISTINCT user_id) AS DOUBLE) AS est_distinct
        FROM events GROUP BY event_type
    """

    o["props_json_stats"] = """
        WITH x AS (
            SELECT event_type,
                   try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT event_type, count(k) AS n_with_k, min(k) AS min_k, max(k) AS max_k
        FROM x GROUP BY event_type
    """

    o["parts_by_brand"] = """
        SELECT p_brand, count(*) AS n_parts,
               count(DISTINCT p_type) AS n_types,
               round(min(p_retailprice), 2) AS min_price,
               round(max(p_retailprice), 2) AS max_price
        FROM part GROUP BY p_brand
    """

    # lang_id oracle generated from the SAME stopword lists the Spark
    # expression uses; argmax with min-code tie-break replayed via
    # list_sort on (hits, code) structs
    codes = sorted(STOPWORDS)
    hits_cols = ", ".join(
        "len(list_intersect(tok, [{}])) AS h_{}".format(
            ", ".join(f"'{w}'" for w in STOPWORDS[c]), c
        )
        for c in codes
    )
    gmax = "greatest(" + ", ".join(f"h_{c}" for c in codes) + ")"
    structs = ", ".join("{'h': h_%s, 'code': '%s'}" % (c, c) for c in codes)
    o["lang_id_confusion"] = f"""
        WITH t AS (
            SELECT lang,
                   list_distinct(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> len(x) > 0)) AS tok
            FROM documents
        ),
        h AS (SELECT lang, {hits_cols} FROM t),
        p AS (
            -- coalesce: NULL text makes every hit count NULL, which must
            -- classify as 'und' exactly like the Spark expression's
            -- otherwise() branch
            SELECT lang,
                   coalesce(CASE WHEN {gmax} = 0 THEN 'und'
                        ELSE (list_sort(list_filter([{structs}], x -> x.h = {gmax})))[1].code
                   END, 'und') AS predicted
            FROM h
        )
        SELECT lang, predicted, count(*) AS n_docs FROM p GROUP BY lang, predicted
    """

    # (suppliers_per_region and events_hourly retired in round 4: the driver
    # checks at most 50 queries; their broadcast-dim rollup / bucketed-count
    # coverage is subsumed by parts_by_brand and events_daily_rollup.  Freed
    # slots went to chunked_pack_stats and duplicated_span_stats — the
    # round-3 training-prep operators the VERDICT asked to gate.)

    o["latest_event_per_user"] = """
        SELECT user_id, event_id, event_type, value
        FROM (
            SELECT user_id, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
            FROM events
        )
        WHERE rk = 1
    """

    o["point_lookup_order"] = """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey = 100
    """

    o["doc_truncate_project"] = """
        SELECT doc_id,
               substring(text, 1, 100) AS prefix_100,
               length(text) AS text_len,
               lower(substring(text, 1, 10)) AS head_lc
        FROM documents
    """

    o["keyword_scan_docs"] = """
        SELECT lang, count(*) AS n_docs
        FROM documents
        WHERE contains(lower(text), 'spark') AND contains(lower(text), 'join')
        GROUP BY lang
    """

    o["doc_mentions"] = f"""
        WITH {_HITS_CTE}
        SELECT term, entity_class,
               count(*) FILTER (WHERE n > 0) AS n_docs,
               cast(sum(n) FILTER (WHERE n > 0) AS BIGINT) AS n_mentions
        FROM hits
        GROUP BY term, entity_class
        HAVING count(*) FILTER (WHERE n > 0) > 0
    """

    _COV_VALUES = ", ".join(
        f"('{alias}', '{cls}')" for cls, _canon, alias, _p, _u in COVERAGE_LEXICON
    )
    o["ontology_coverage"] = f"""
        WITH lex(term, entity_class) AS (VALUES {_COV_VALUES}),
        tokall AS (
            -- non-alphanumeric split: shares mention semantics with the
            -- boundary-anchored Spark matcher (punctuation-adjacent terms count)
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tok
            FROM documents
        ),
        mentioned AS (
            SELECT DISTINCT l.term, l.entity_class
            FROM tokall t CROSS JOIN lex l
            WHERE len(list_filter(t.tok, x -> x = l.term)) > 0
        )
        SELECT l.entity_class,
               count(*) AS n_lexicon,
               count(m.term) AS n_mentioned,
               round(count(m.term) * 1.0 / count(*), 6) AS coverage_ratio,
               coalesce(
                   string_agg(CASE WHEN m.term IS NULL THEN l.term END, '|' ORDER BY l.term),
                   '') AS missed_entities
        FROM lex l
        LEFT JOIN mentioned m ON l.term = m.term AND l.entity_class = m.entity_class
        GROUP BY l.entity_class
    """

    o["doc_cooccurrence_edges"] = f"""
        WITH {_HITS_CTE}
        SELECT a.term AS subj, b.term AS obj, count(*) AS n_docs
        FROM hits a JOIN hits b
          ON a.doc_id = b.doc_id AND a.term < b.term
        WHERE a.n > 0 AND b.n > 0
        GROUP BY a.term, b.term
    """

    o["ego_1hop_join"] = f"""
        WITH {_HITS_CTE},
        edges AS (
            SELECT a.term AS subj, b.term AS obj, count(*) AS n_docs
            FROM hits a JOIN hits b
              ON a.doc_id = b.doc_id AND a.term < b.term
            WHERE a.n > 0 AND b.n > 0
            GROUP BY a.term, b.term
        ),
        nb AS (
            SELECT 'join' AS name
            UNION SELECT obj FROM edges WHERE subj = 'join'
            UNION SELECT subj FROM edges WHERE obj = 'join'
        )
        SELECT e.subj, e.obj, e.n_docs
        FROM edges e
        WHERE e.subj IN (SELECT name FROM nb) AND e.obj IN (SELECT name FROM nb)
    """

    o["entity_rollup_langs"] = f"""
        WITH {_HITS_CTE}
        SELECT h.term,
               count(DISTINCT h.doc_id) AS n_docs,
               string_agg(DISTINCT d.lang, '|' ORDER BY d.lang) AS langs
        FROM hits h JOIN documents d ON h.doc_id = d.doc_id
        WHERE h.n > 0
        GROUP BY h.term
    """

    o["fingerprint_stats"] = r"""
        SELECT lang, count(*) AS n_docs,
               count(DISTINCT md5(regexp_replace(trim(lower(text)), '[ \t\n\r\f\x0B]+', ' ', 'g'))) AS n_distinct_fp
        FROM documents
        GROUP BY lang
    """

    o["near_dup_jaccard"] = f"""
        WITH {_TOKS_CTE}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(cast(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                     / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))), 6) AS jaccard
        FROM toks a JOIN toks b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        WHERE round(cast(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                    / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))), 6) >= 0.8
    """

    o["doc_quality_minmax"] = r"""
        WITH scored AS (
            SELECT lang,
                   round(greatest(0.0, least(1.0,
                       0.4 * least(length(text) / 500.0, 1.0)
                       + 0.5 * (CASE WHEN len(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> len(x) > 0)) > 0
                                THEN cast(len(list_distinct(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> len(x) > 0))) AS DOUBLE)
                                     / len(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> len(x) > 0))
                                ELSE 0.0 END)
                       - 0.5 * (CASE WHEN length(text) > 0
                                THEN cast(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE) / length(text)
                                ELSE 0.0 END)
                       + 0.1)), 6) AS quality
            FROM documents
        )
        SELECT lang, count(*) AS n_docs,
               min(quality) AS min_quality, max(quality) AS max_quality
        FROM scored
        GROUP BY lang
    """

    o["top_tokens"] = r"""
        SELECT token, count(*) AS n
        FROM (
            SELECT unnest(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> len(x) > 0)) AS token
            FROM documents
        )
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20
    """

    o["cosine_topk_q0"] = f"""
        WITH q AS (
            SELECT cast(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
        )
        SELECT e.vec_id,
               round(list_dot_product(cast(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_dot_product(cast(e.embedding AS DOUBLE[]), cast(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
        FROM embeddings e CROSS JOIN q
        ORDER BY cosine DESC, e.vec_id
        LIMIT 20
    """

    # (embedding_minmax_by_label retired in round 4: its array-fold norm is
    # exercised by cosine_topk_q0/embedding_close_pairs and its min/max
    # group-agg by doc_quality_minmax/parts_by_brand — freed the slot for
    # ivf_blocked_close_pairs, the round-4 mid-threshold blocking operator.)

    o["goals_constraints_fixture"] = _cue_fixture_oracle()
    o["protocols_fixture"] = _protocol_fixture_oracle()

    o["embedding_close_pairs"] = """
        WITH e AS (
            SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS v FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35
    """

    o["embedding_dedup_clusters"] = """
        WITH RECURSIVE e AS (
            SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35
        ),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b AS a, id_a AS b FROM pairs
        ),
        reach(node, lbl) AS (
            SELECT a, a FROM edges
            UNION
            SELECT r.node, e2.b FROM reach r JOIN edges e2 ON r.lbl = e2.a
        )
        SELECT node AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    """

    o["node_degrees"] = f"""
        WITH {_HITS_CTE},
        edges AS (
            SELECT DISTINCT a.term AS subj, b.term AS obj
            FROM hits a JOIN hits b
              ON a.doc_id = b.doc_id AND a.term < b.term
            WHERE a.n > 0 AND b.n > 0
        ),
        sym AS (
            SELECT subj, obj FROM edges
            UNION ALL
            SELECT obj AS subj, subj AS obj FROM edges
        )
        SELECT subj AS node, count(DISTINCT obj) AS degree FROM sym GROUP BY subj
    """

    # Flagship KG query: the synthetic corpus's expected triples are known BY
    # CONSTRUCTION (generate_corpus derives them from the sentence templates,
    # independently of the extraction operators), so the oracle inlines that
    # golden set as VALUES and aggregates it with the same groupBy — a full
    # value-level check of the extraction pipeline, not a re-derivation.
    from ontology_pipeline_spark.lexicon import ONTOLOGY_VOCAB
    from ontology_pipeline_spark.synth import generate_corpus

    _cls_of = {
        name: cls for cls, entries in ONTOLOGY_VOCAB.items() for name, _p, _u in entries
    }
    _c13 = generate_corpus(n_pages=200, seed=13)
    _golden = sorted(set(_c13.expected_triples))
    _rows = ", ".join(
        "('{}', '{}', '{}', '{}', '{}', '{}')".format(
            s.replace("'", "''"), _cls_of[s], p, o.replace("'", "''"), _cls_of[o], u
        )
        for s, p, o, u in _golden
    )
    o["kg_triples_synthetic"] = f"""
        SELECT subj, subj_class, pred, obj, obj_class,
               count(DISTINCT url) AS n_pages
        FROM (VALUES {_rows}) AS g(subj, subj_class, pred, obj, obj_class, url)
        GROUP BY subj, subj_class, pred, obj, obj_class
    """

    # Fuzzy-canonicalization flagship: the oracle is the golden triple set
    # of the UNmisspelled seed-17 corpus (generate_misspelled_corpus keeps
    # goldens canonical by construction) — the Spark side must recover every
    # seeded misspelling through linking + CC to match it.
    _c17 = generate_corpus(n_pages=200, seed=17)
    _rows17 = ", ".join(
        "('{}', '{}', '{}', '{}', '{}', '{}')".format(
            s.replace("'", "''"), _cls_of[s], p, o_.replace("'", "''"), _cls_of[o_], u
        )
        for s, p, o_, u in sorted(set(_c17.expected_triples))
    )
    o["kg_fuzzy_canonical_triples"] = f"""
        SELECT subj, subj_class, pred, obj, obj_class,
               count(DISTINCT url) AS n_pages
        FROM (VALUES {_rows17}) AS g(subj, subj_class, pred, obj, obj_class, url)
        GROUP BY subj, subj_class, pred, obj, obj_class
    """

    # Same by-construction oracle for the reference-shaped document rollup:
    # golden mentions, golden triples, and the input text lengths are inlined
    # as VALUES; the SQL re-derives every count the Spark assembly reports.
    _q = lambda x: str(x).replace("'", "''")
    _m_rows = ", ".join(
        f"('{_q(u)}', '{_q(n)}', '{c}')" for u, n, c in sorted(set(_c13.expected_mentions))
    )
    _t_rows = ", ".join(
        f"('{_q(s)}', '{p}', '{_q(obj)}', '{_q(u)}')" for s, p, obj, u in _golden
    )
    _p_rows = ", ".join(f"('{_q(pg[0])}', {len(pg[3])})" for pg in _c13.pages)
    from ontology_pipeline_spark.lexicon import METRIC_SOURCE

    _ms_rows = ", ".join(
        f"('{_q(m)}', '{_q(a)}')" for m, a in sorted(METRIC_SOURCE.items())
    )
    from ontology_pipeline_spark.lexicon import TECH_INFO

    _ti_rows = ", ".join(f"('{_q(t)}')" for t in sorted(TECH_INFO))
    _tl_rows = ", ".join(
        f"('{_q(u)}', '{_q(t)}', '{_q(a)}')" for u, t, a in _c13.expected_tech_links
    )
    from ontology_pipeline_spark.lexicon import ASSESSMENT_MODALITY, INTERVENTION_TYPES

    _am_rows = ", ".join(
        f"('{_q(a)}', '{_q(mo)}')" for a, mo in sorted(ASSESSMENT_MODALITY.items())
    )
    _it_rows = ", ".join(f"('{_q(i)}')" for i in sorted(INTERVENTION_TYPES))
    o["extraction_docs_synthetic"] = f"""
        WITH m(url, name, cls) AS (VALUES {_m_rows}),
        t(subj, pred, obj, url) AS (VALUES {_t_rows}),
        p(url, text_length) AS (VALUES {_p_rows}),
        ms(metric, src) AS (VALUES {_ms_rows}),
        ti(tech) AS (VALUES {_ti_rows}),
        tl(url, tech, assessment) AS (VALUES {_tl_rows}),
        am(assessment, modality) AS (VALUES {_am_rows}),
        it(intervention) AS (VALUES {_it_rows})
        SELECT p.url,
               cast(p.text_length AS BIGINT) AS text_length,
               cast((SELECT count(DISTINCT name) FROM m WHERE m.url = p.url AND cls = 'construct') AS INT) AS constructs_identified,
               cast((SELECT count(DISTINCT name) FROM m WHERE m.url = p.url AND cls = 'assessment') AS INT) AS n_assessments,
               cast((SELECT count(DISTINCT name) FROM m WHERE m.url = p.url AND cls = 'intervention') AS INT) AS n_interventions,
               cast((SELECT count(DISTINCT (subj, pred, obj)) FROM t
                     WHERE t.url = p.url AND pred IN ('association', 'causal', 'dependency')) AS INT) AS n_construct_rels,
               cast((SELECT count(DISTINCT subj) FROM t
                     WHERE t.url = p.url AND pred = 'measures') AS INT) AS n_ac_links,
               cast((SELECT count(DISTINCT (subj, obj)) FROM t
                     WHERE t.url = p.url AND pred = 'measures') AS INT) AS n_measured_constructs,
               cast((SELECT count(DISTINCT m.name) FROM m JOIN ms ON m.name = ms.metric
                     WHERE m.url = p.url AND m.cls = 'metric') AS INT) AS n_sourced_metrics,
               cast((SELECT count(DISTINCT m.name) FROM m JOIN ti ON m.name = ti.tech
                     WHERE m.url = p.url AND m.cls = 'technology') AS INT) AS n_vendored_techs,
               (SELECT min(ms.src) FROM m JOIN ms ON m.name = ms.metric
                WHERE m.url = p.url AND m.cls = 'metric') AS first_metric_source,
               cast((SELECT count(DISTINCT (tl.tech, tl.assessment)) FROM tl
                     WHERE tl.url = p.url) AS INT) AS n_tech_links,
               cast((SELECT count(DISTINCT (subj, obj)) FROM t
                     WHERE t.url = p.url AND pred = 'targets') AS INT) AS n_targeted_constructs,
               (SELECT min(am.modality) FROM m JOIN am ON m.name = am.assessment
                WHERE m.url = p.url AND m.cls = 'assessment') AS first_modality,
               cast((SELECT count(DISTINCT m.name) FROM m JOIN it ON m.name = it.intervention
                     WHERE m.url = p.url AND m.cls = 'intervention') AS INT) AS n_typed_interventions
        FROM p
        ORDER BY p.url
    """

    # Golden VALUES oracles for the approximate queries (minhash / simhash /
    # sign-LSH ANN / IVF ANN): deterministic operators (fixed seeds, fixed
    # corpus) whose expected rows are replayed by INDEPENDENT pure Python in
    # scripts/golden_replay.py (XXH64/Murmur3 re-implemented from the public
    # specs) against the sf0.01 testdata — the
    # scale the driver's correctness gate runs at.  Regenerate with
    # `python scripts/golden_replay.py` if operators or testdata change.
    from ontology_pipeline_spark.golden_approx import GOLDEN_APPROX_SQL

    o.update(GOLDEN_APPROX_SQL)

    return o
