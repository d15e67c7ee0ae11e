"""Token-budget sequence packing for training-data pipelines.

Engine-added operator (no reference analogue): the standard
concatenate-and-cut packing used to build fixed-length training
sequences — all documents of a shard are laid end-to-end in a
DETERMINISTIC order (md5 hex-prefix of the key, ties by key — the same
content-hash law as :mod:`sampling`), and the token stream is cut every
``budget`` tokens. Documents MAY span a cut; the output has one row per
(document, bin it overlaps) with the token count that lands in that
bin, so downstream writers can materialize each bin's byte ranges.

Why this formulation scales: greedy no-split bin packing is a
sequential recurrence (where a bin closes depends on everything before
it), but concatenate-and-cut is a closed-form function of the running
token total — one window cumsum per shard + an explode over the spanned
bin range. One shuffle, no Python, no iteration, and the per-shard
sequentiality is bounded by shard size, which the caller controls
(shard by hash of the key for uniform ~executor-sized shards).

Shard guidance (measured, BENCH.md §sampling+packing linearity): keep
shard COUNT proportional to corpus size with a bounded per-shard row
target (tens of thousands of rows) — a fixed shard count pays the
window sort's O(n log n) factor as data grows, and sharding by a
skewed group key (one hot conversation) serializes that shard. With
row-proportional sharding the measured per-row cost IMPROVES at 10×
rows (0.73 → 0.42 µs/row at 20M, local[32]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _bucket_hex


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    shard_cols: list[str] | None = None,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign each document to the ``budget``-token bin(s) it occupies.

    Output columns: the shard columns, ``key_col``, ``bin_id`` (0-based
    within the shard), ``tokens_in_bin``, ``n_bins_spanned`` (how many
    bins this document touches), plus ``start_offset`` (the document's start
    position in the shard's concatenated token stream — the writer-side
    seek position). Zero-token documents are dropped (they occupy no
    stream position). Deterministic: same corpus → same packing, on any
    cluster size or partitioning.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    shard_cols = list(shard_cols or [])
    if not shard_cols:
        import warnings

        warnings.warn(
            "pack_sequences without shard_cols serializes the ENTIRE "
            "input through one window task (Window.partitionBy(lit(1))) "
            "— fine for tests, a scalability cliff at corpus scale. "
            "Shard by a hash of the key (shards ∝ rows, tens of "
            "thousands of rows per shard; see BENCH.md §packing).",
            stacklevel=2,
        )
    tok = F.col(token_col).cast("long")
    w = (
        (
            Window.partitionBy(*shard_cols)
            if shard_cols
            else Window.partitionBy(F.lit(1))
        )
        .orderBy(_bucket_hex(F.col(key_col), salt), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tok).over(w)
    b = F.col("bin_id")
    # window columns first, THEN the generator: a generator cannot share
    # a projection with window expressions
    positioned = df.where(tok > 0).select(
        *shard_cols,
        key_col,
        tok.alias("__tok__"),
        (cum - tok).alias("start_offset"),
        cum.alias("__cum__"),
    )
    placed = positioned.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("start_offset") / budget),
                F.floor((F.col("__cum__") - 1) / budget),
            )
        ).alias("bin_id"),
    )
    in_bin = F.least(F.col("__cum__"), (b + 1) * budget) - F.greatest(
        F.col("start_offset"), b * budget
    )
    return placed.select(
        *shard_cols,
        key_col,
        "bin_id",
        in_bin.alias("tokens_in_bin"),
        (F.floor((F.col("__cum__") - 1) / budget) - F.floor(F.col("start_offset") / budget) + 1)
        .alias("n_bins_spanned"),
        "start_offset",
    )


def context_window_stats(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    turn_overhead: int = 1,
) -> DataFrame:
    """Context-assembly stats: the maximal turn suffix that fits a budget.

    Training-example construction law for multi-turn transcripts: a
    target turn's context window is the LONGEST contiguous run of turns
    ending at (and including) that turn whose total cost fits
    ``budget``, where a turn's cost is ``token_col + turn_overhead``
    (the overhead models the per-turn separator/role tokens and, being
    >= 1, keeps the running total strictly increasing so the window
    frame below is exact).

    Closed form, no iteration: with ``cum`` the per-conversation running
    cost (one window cumsum), the turns that fit ending at row *i* are
    exactly the rows *k <= i* with ``cum[k] >= cum[i] - budget`` —
    countable with a single RANGE frame over ``cum`` — plus the whole
    prefix when ``cum[i] <= budget`` (the virtual ``cum = 0``
    predecessor). Two sorts inside ONE conversation-keyed shuffle; scale
    is bounded by conversation length, never corpus size.

    Output per input row: ``ctx_turns`` (turns in the window, target
    included; 0 means the target alone overflows), ``ctx_cost`` (their
    total cost), ``ctx_start_turn`` (first included ordinal — assumes
    ``order_col`` is dense per conversation, as transcripts' turn_idx
    is), ``truncated`` (target alone overflows the budget).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if turn_overhead < 1:
        raise ValueError(
            "turn_overhead must be >= 1 (keeps the running cost strictly "
            "increasing; model it as the per-turn separator tokens)"
        )
    cost = F.col(token_col).cast("long") + F.lit(int(turn_overhead))
    w_cum = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.withColumn("__cost__", cost).withColumn(
        "__cum__", F.sum("__cost__").over(w_cum)
    )
    w_rng = (
        Window.partitionBy(conv_col)
        .orderBy("__cum__")
        .rangeBetween(-int(budget), Window.currentRow)
    )
    whole = F.col("__cum__") <= budget
    m = F.count(F.lit(1)).over(w_rng)
    mincum = F.min("__cum__").over(w_rng)
    out = staged.withColumn(
        "ctx_turns",
        (m - 1 + F.when(whole, F.lit(1)).otherwise(F.lit(0))).cast("int"),
    ).withColumn(
        "ctx_cost", F.col("__cum__") - F.when(whole, F.lit(0)).otherwise(mincum)
    )
    return (
        out.withColumn(
            "ctx_start_turn",
            (F.col(order_col) - F.col("ctx_turns") + 1).cast("int"),
        )
        .withColumn("truncated", F.col("__cost__") > budget)
        .drop("__cost__", "__cum__")
    )


def token_window_chunks(
    df: DataFrame,
    chunk_size: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token windows — the RAG /
    embedding-ingest chunker: chunk ``i`` covers tokens
    ``[i·stride, i·stride + chunk_size)`` with ``stride =
    chunk_size - overlap``, starts at every stride multiple below the
    token count (trailing chunks may be short), and documents with zero
    tokens produce no chunks.

    One narrow projection + one explode — no shuffle at all: chunking
    is embarrassingly parallel, so at 100 TB this runs at scan speed
    and the output partitioning inherits the input's. Tokens are
    lowercased alphanumeric word pieces; ``chunk_text`` re-joins them
    with single spaces (a normalized view, deliberately — chunkers
    that slice raw character offsets can't be token-budget-exact).

    Output: ``(id, chunk_idx, start_tok, n_tokens, chunk_text)``.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit(r"[a-z0-9]+"),
        F.lit(0),
    )
    base = df.select(F.col(id_col), toks.alias("__t__"))
    n = F.size("__t__")
    # chunk starts: 0, stride, 2*stride, ... < n
    idx = F.when(
        n > 0, F.sequence(F.lit(0), F.ceil(n / F.lit(stride)).cast("int") - 1)
    ).otherwise(F.array().cast("array<int>"))
    piece = F.slice(
        F.col("__t__"), F.col("chunk_idx") * stride + 1, chunk_size
    )
    return (
        base.select(id_col, "__t__", F.explode(idx).alias("chunk_idx"))
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * stride).cast("int").alias("start_tok"),
            F.size(piece).cast("int").alias("n_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )
