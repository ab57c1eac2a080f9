from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontology_pipeline_spark.operators.chunking import chunk_documents


def _doc(spark, n_tokens: int):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_chunk_windows_and_overlap(spark):
    out = sorted(
        (r["chunk_idx"], r["chunk_start"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(_doc(spark, 10), chunk_tokens=4, overlap=1).collect()
    )
    # stride 3: windows at 0,3,6,9; start 9 covers only t9, but window at 6
    # covers 6..9 already -> 9+overlap(1)=10 not < 10 -> dropped
    assert out == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_tail_partial_window_kept_when_it_adds_tokens(spark):
    out = sorted(
        (r["chunk_start"], r["n_tokens"]) for r in
        chunk_documents(_doc(spark, 9), chunk_tokens=4, overlap=1).collect()
    )
    # windows 0..3, 3..6, 6..8 (tail has 3 tokens, adds t7,t8 beyond window 1)
    assert out == [(0, 4), (3, 4), (6, 3)]


def test_chunk_every_token_covered_no_redundant_tail(spark):
    """Property over many lengths: the union of windows covers [0, n) exactly,
    consecutive windows overlap by `overlap`, and no window is a sub-span of
    its predecessor."""
    for n in (1, 2, 5, 12, 13, 25, 100):
        rows = sorted(
            (r["chunk_start"], r["n_tokens"])
            for r in chunk_documents(_doc(spark, n), chunk_tokens=5, overlap=2).collect()
        )
        covered = set()
        prev_end = None
        for start, k in rows:
            end = start + k
            covered.update(range(start, end))
            if prev_end is not None:
                assert start < prev_end  # overlap exists
                assert end > prev_end  # adds at least one new token
            prev_end = end
        assert covered == set(range(n)), n


def test_chunk_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=512, overlap=64).collect()
    assert [(r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in out] == [
        (1, 0, 3, "only three tokens")
    ]


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_doc(spark, 5), chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(_doc(spark, 5), chunk_tokens=4, overlap=-1)


def test_chunk_plan_is_narrow_and_python_free(spark):
    """One projection chain: no shuffle (Exchange) and no Python eval in the
    physical plan — the 100 TB contract for this operator."""
    plan = (
        chunk_documents(_doc(spark, 50), chunk_tokens=8, overlap=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_pack_chunks_budget_and_order(spark):
    from ontology_pipeline_spark.operators.chunking import pack_chunks

    rows = [(1, i, n) for i, n in enumerate([5, 3, 4, 2, 6, 1])]
    chunks = spark.createDataFrame(rows, "doc_id long, chunk_idx long, n_tokens long")
    out = sorted(
        (r["pack_id"], r["chunk_idx"], r["pack_fill"])
        for r in pack_chunks(
            chunks.withColumn("pack_group", F.lit(0)), budget=8
        ).collect()
    )
    # next-fit in chunk order: [5,3] fill 8 | [4,2] fill 6 | [6,1] fill 7
    assert out == [
        (0, 0, 5), (0, 1, 8),
        (1, 2, 4), (1, 3, 6),
        (2, 4, 6), (2, 5, 7),
    ]


def test_pack_chunks_oversize_and_determinism(spark):
    from ontology_pipeline_spark.operators.chunking import pack_chunks

    rows = [(d, 0, n) for d, n in [(1, 12), (2, 3), (3, 3), (4, 3)]]
    chunks = spark.createDataFrame(rows, "doc_id long, chunk_idx long, n_tokens long")
    out = pack_chunks(chunks, budget=8, n_groups=2).collect()
    # oversize chunk (12 > 8) gets its own bin, never dropped
    assert {r["doc_id"] for r in out} == {1, 2, 3, 4}
    for r in out:
        if r["doc_id"] == 1:
            assert r["pack_fill"] == 12
        else:
            assert r["pack_fill"] <= 8
    # partitioning-invariant: same bins regardless of input layout
    a = sorted(map(tuple, out))
    b = sorted(
        map(tuple, pack_chunks(chunks.repartition(7), budget=8, n_groups=2).collect())
    )
    assert a == b


def test_pack_chunks_requires_grouping(spark):
    from ontology_pipeline_spark.operators.chunking import pack_chunks

    chunks = spark.createDataFrame(
        [(1, 0, 3)], "doc_id long, chunk_idx long, n_tokens long"
    )
    with pytest.raises(ValueError):
        pack_chunks(chunks, budget=8)  # no pack_group, no n_groups
    with pytest.raises(ValueError):
        pack_chunks(chunks, budget=0, n_groups=2)
    # pre-assigned group_col + n_groups is ambiguous (ADVICE r3: used to
    # silently drop the requested sharding)
    pre = chunks.withColumn("pack_group", chunks["doc_id"] % 2)
    with pytest.raises(ValueError, match="ambiguous"):
        pack_chunks(pre, budget=8, n_groups=2)


def test_pack_chunks_fails_fast_on_null_or_negative_tokens(spark):
    from ontology_pipeline_spark.operators.chunking import pack_chunks

    bad_null = spark.createDataFrame(
        [(1, 0, 3), (2, 0, None)], "doc_id long, chunk_idx long, n_tokens long"
    )
    with pytest.raises(Exception) as ei:
        pack_chunks(bad_null, budget=8, n_groups=1).collect()
    assert "non-null" in str(ei.value)
    bad_neg = spark.createDataFrame(
        [(1, 0, 3), (2, 0, -2)], "doc_id long, chunk_idx long, n_tokens long"
    )
    with pytest.raises(Exception) as ei:
        pack_chunks(bad_neg, budget=8, n_groups=1).collect()
    assert ">= 0" in str(ei.value)


def test_pack_texts_materializes_bins_in_pack_order(spark):
    """pack_texts rebuilds one training example per bin: member texts joined
    in (doc_id, chunk_idx) order, token total == bin fill, deterministic
    under any input partitioning."""
    from ontology_pipeline_spark.operators.chunking import pack_chunks, pack_texts

    rows = [
        (1, 0, 3, "a b c"),
        (1, 1, 3, "d e f"),
        (2, 0, 4, "g h i j"),
        (3, 0, 5, "k l m n o"),
    ]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, n_tokens long, chunk_text string"
    ).withColumn("pack_group", F.lit(0))
    packed = pack_chunks(chunks, budget=7)
    out = {
        (r["pack_group"], r["pack_id"]): (r["n_chunks"], r["n_tokens"], r["text"])
        for r in pack_texts(packed, sep=" | ").collect()
    }
    # next-fit in (doc_id, chunk_idx) order with budget 7:
    # bin0 = (1,0)+(1,1) fill 6; bin1 = (2,0) fill 4 (5 would overflow); bin2 = (3,0)
    assert out[(0, 0)] == (2, 6, "a b c | d e f")
    assert out[(0, 1)] == (1, 4, "g h i j")
    assert out[(0, 2)] == (1, 5, "k l m n o")
    repart = pack_texts(pack_chunks(chunks.repartition(7), budget=7), sep=" | ")
    assert {
        (r["pack_group"], r["pack_id"]): (r["n_chunks"], r["n_tokens"], r["text"])
        for r in repart.collect()
    } == out


def test_ivf_assign_multi_plan_is_narrow(spark):
    """Multi-assignment is a constant-fan-out explode against literal
    centers: no Exchange, no Python stage."""
    from ontology_pipeline_spark.operators.similarity import ivf_assign_multi

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    centers = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    plan = (
        ivf_assign_multi(emb, centers, n_assign=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
