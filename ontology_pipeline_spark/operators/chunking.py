"""Context-window chunking — fixed-size overlapping token windows.

Engine extension for training-data preparation (no analog in the reference,
which feeds whole transcripts to each pass and only truncates:
src/extractor.py:448, src/prompts.py:230 — the `substring` semantics live in
F9/doc_truncate_project).  This is the standard LLM pretraining prep: split
each document into windows of `chunk_tokens` tokens advancing by
`chunk_tokens - overlap`, so consecutive chunks share `overlap` tokens and
no token is lost at a boundary.

Scale design (100 TB corpus):

* the whole operator is ONE narrow projection chain — tokenize -> window
  starts (`sequence`) -> `explode` -> positional `slice` + `array_join` —
  pure JVM expressions, zero shuffles, zero Python;
* the token array is staged through its own projection before the explode
  (lambda/slice re-evaluation pitfall — see dedup._shingles_of_tokens);
* row fan-out is bounded by ceil(n_tokens / stride) per document, and each
  output row carries only its own window's text, so executor memory per
  task stays proportional to the input split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id_col, chunk_idx, chunk_start, n_tokens, chunk_text) — one row per
    context window.

    Window i covers token positions [i*stride, i*stride + chunk_tokens)
    with stride = chunk_tokens - overlap.  The tail window is emitted only
    if it contains at least one token the previous window does not
    (otherwise it would be a strict sub-span of its predecessor).  Documents
    with zero tokens produce no rows.  Deterministic: windows are a pure
    function of the token array."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got overlap={overlap} "
            f"chunk_tokens={chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    staged = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).select(
        id_col,
        "_t",
        F.size("_t").alias("_n"),
    )
    starts = staged.filter(F.col("_n") > 0).select(
        id_col,
        "_t",
        "_n",
        # posexplode: pos IS chunk_idx (no division round-trip needed);
        # _n - 1 >= 0 is guaranteed by the filter above
        F.posexplode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).alias("chunk_idx", "chunk_start"),
    )
    # drop a tail window that is a strict sub-span of its predecessor: the
    # previous window already covers up to chunk_start + overlap
    kept = starts.filter(
        (F.col("chunk_start") == 0)
        | (F.col("chunk_start") + F.lit(overlap) < F.col("_n"))
    )
    chunk = F.slice(F.col("_t"), F.col("chunk_start") + 1, chunk_tokens)
    return kept.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_start",
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int,
    group_col: str = "pack_group",
    id_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
    tokens_col: str = "n_tokens",
    n_groups: int | None = None,
) -> DataFrame:
    """Greedy next-fit packing of chunks into token-budget bins — the
    "sequence packing" step that turns variable-length chunks into
    fixed-budget training examples with minimal padding waste.

    Rows are packed per group in deterministic (id_cols) order: a chunk goes
    into the current bin unless it would overflow `budget`, which opens the
    next bin.  Output adds (group_col, pack_id, pack_fill) to the input
    columns, where pack_id numbers bins within the group and pack_fill is
    the bin's running token total after the row.  Chunks larger than
    `budget` get a bin of their own (never dropped — the caller chose
    chunk_tokens <= budget if that matters).

    Scale design: packing is inherently sequential, so the parallel unit is
    the GROUP — pass `n_groups` to derive a deterministic hash shard from
    the first id column (or pre-assign `group_col` yourself, e.g. by
    curriculum bucket).  Each group is one `applyInPandas` task: one
    shuffle on the group key, linear scan inside, per-task memory bounded
    by the group's rows.  Bins never span groups, so results are
    partitioning-invariant and reproducible run-to-run.

    Sizing n_groups: ~16x the total core count (measured 2.4-2.6x faster
    than 1x cores at 2M chunks — one task per group means the largest
    hash shard gates the stage; many small groups let the scheduler smooth
    the imbalance; BENCH/training_prep.md round-4 sweep), while keeping
    each group's token mass >> `budget` so bins stay full."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    df = chunks
    if group_col in df.columns:
        if n_groups is not None:
            raise ValueError(
                f"chunks already carries {group_col!r}; passing n_groups too "
                "is ambiguous — drop the column to hash-shard, or drop "
                "n_groups to keep the pre-assigned grouping"
            )
    else:
        if n_groups is None:
            raise ValueError(
                f"either pre-assign {group_col!r} or pass n_groups for the "
                "deterministic hash sharding"
            )
        df = df.withColumn(
            group_col,
            F.pmod(F.xxhash64(F.col(id_cols[0]).cast("string")), F.lit(n_groups)),
        )
    from pyspark.sql.types import LongType, StructField, StructType

    # StructType.add MUTATES in place — never call it on df.schema (that
    # corrupts the DataFrame's cached schema object); build a fresh one
    schema = StructType(
        list(df.schema.fields)
        + [StructField("pack_id", LongType()), StructField("pack_fill", LongType())]
    )
    # total-order sort key (CLAUDE.md determinism convention): id_cols first,
    # then ONE long tiebreak — an xxhash64 over every remaining column,
    # computed JVM-side before the shuffle.  pandas lexsorts every listed
    # key column regardless of whether earlier keys already decide the
    # order, so listing chunk_text itself would materialize and sort
    # multi-hundred-token strings per row for zero discriminating power
    # when id_cols are unique.  If id_cols are NOT unique, ties still pack
    # identically run-to-run: differing rows differ in the hash (collision
    # odds 2^-64), and fully-identical rows are interchangeable.
    rest = [c for c in df.columns if c not in id_cols and c != group_col]
    df = df.withColumn(
        "_tiebreak", F.xxhash64(*[F.col(c) for c in rest]) if rest else F.lit(0)
    )
    order = list(id_cols) + ["_tiebreak"]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf[tokens_col].isna().any():
            raise ValueError(
                f"pack_chunks: NULL {tokens_col!r} in group "
                f"{pdf[group_col].iloc[0]!r} — token counts must be non-null"
            )
        if (pdf[tokens_col] < 0).any():
            raise ValueError(
                f"pack_chunks: negative {tokens_col!r} in group "
                f"{pdf[group_col].iloc[0]!r} — token counts must be >= 0"
            )
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        pack_ids, fills = [], []
        cur_id, cur_fill = 0, 0
        for n in pdf[tokens_col]:
            n = int(n)
            if cur_fill and cur_fill + n > budget:
                cur_id += 1
                cur_fill = 0
            cur_fill += n
            pack_ids.append(cur_id)
            fills.append(cur_fill)
        pdf["pack_id"] = pack_ids
        pdf["pack_fill"] = fills
        return pdf.drop(columns=["_tiebreak"])

    return df.groupBy(group_col).applyInPandas(pack, schema=schema)


def pack_texts(
    packed: DataFrame,
    sep: str = "\n\n",
    group_col: str = "pack_group",
    id_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
    text_col: str = "chunk_text",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Materialize the training examples `pack_chunks` laid out: one row per
    (group_col, pack_id) — (n_chunks, n_tokens, text) with the member
    chunks' texts joined by `sep` in the same deterministic (id_cols) order
    the packer filled the bin.

    One shuffle on (group, pack_id); per-bin state is bounded by `budget`
    tokens BY CONSTRUCTION (the packer never overfills a bin except for a
    single oversize chunk), so the collect_list that a whole-document
    grouping could never afford is safe here — this is the step that turns
    the pack layout into actual model inputs.  Order inside the bin uses
    sort_array over (id_cols..., text) structs: a total order, no reliance
    on collect order (CLAUDE.md determinism rule)."""
    member = F.struct(
        *[F.col(c) for c in id_cols], F.col(tokens_col).alias("_nt"), F.col(text_col).alias("_tx")
    )
    return (
        packed.groupBy(group_col, "pack_id")
        .agg(F.sort_array(F.collect_list(member)).alias("_m"))
        .select(
            group_col,
            "pack_id",
            F.size("_m").alias("n_chunks"),
            F.aggregate(
                "_m", F.lit(0).cast("long"), lambda acc, m: acc + m["_nt"]
            ).alias("n_tokens"),
            F.array_join(F.transform("_m", lambda m: m["_tx"]), sep).alias("text"),
        )
    )
