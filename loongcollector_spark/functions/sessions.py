"""Conversation sessionization + degenerate-loop detection.

Engine-added transcript operators (no direct reference analogue — the
reference's closest surface is the log-split/merge family, which
segments a *text stream*; these segment a *turn stream*):

- :func:`sessionize` — split each conversation into sessions wherever
  the inter-turn time gap exceeds a threshold. The classic telemetry
  sessionization law, expressed as the closed-form prefix sum of a
  gap indicator: one ``lag`` + one cumulative ``sum`` inside a single
  conversation-keyed window — one Exchange, no iteration, no Python.
- :func:`consecutive_runs` — run-length-encode consecutive turns that
  share a key (e.g. ``role, tool``): the standard "gaps and islands"
  identity ``run = cumsum(key != lag(key))``. Long runs of the same
  (role, tool) are the cheap, deterministic signal for a degenerate
  agent loop (a tool being retried forever) — the transcript-native
  cousin of the repetition-removal filters in
  :mod:`loongcollector_spark.functions.textclean`.

Both are bounded by conversation length, never corpus size, so they
hold at 10^12 turns exactly like the flagship pipeline's windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign ``session_idx`` / ``session_turn_idx`` per conversation.

    A new session starts at the first turn and at every turn whose gap
    from the previous turn (in ``order_col`` order) strictly exceeds
    ``gap_seconds``. Output adds ``session_idx`` (0-based per
    conversation) and ``session_turn_idx`` (0-based within session).
    Deterministic for any partitioning; negative gaps (out-of-order
    timestamps within a conversation) never open a session.
    """
    if gap_seconds < 0:
        raise ValueError("gap_seconds must be >= 0")
    w = Window.partitionBy(conv_col).orderBy(order_col)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(gap > gap_seconds, F.lit(1)).otherwise(F.lit(0))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn("__new__", is_new).withColumn(
        "session_idx", F.sum("__new__").over(wc).cast("int")
    )
    ws = Window.partitionBy(conv_col, "session_idx").orderBy(order_col)
    return (
        out.withColumn(
            "session_turn_idx", (F.row_number().over(ws) - 1).cast("int")
        ).drop("__new__")
    )


def consecutive_runs(
    df: DataFrame,
    key_cols: list[str],
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    min_len: int = 1,
) -> DataFrame:
    """Run-length-encode consecutive turns sharing ``key_cols``.

    Returns one row per run: the conversation, the key columns,
    ``run_start_turn``, ``run_end_turn`` and ``run_len``, keeping runs
    with ``run_len >= min_len``. NULL key values compare equal to NULL
    (null-safe), matching SQL ``IS NOT DISTINCT FROM``.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    w = Window.partitionBy(conv_col).orderBy(order_col)
    changed: Column | None = None
    for k in key_cols:
        neq = ~F.col(k).eqNullSafe(F.lag(k).over(w))
        changed = neq if changed is None else (changed | neq)
    is_new = F.when(F.lag(order_col).over(w).isNull(), F.lit(1)).otherwise(
        F.when(changed, F.lit(1)).otherwise(F.lit(0))
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = df.withColumn("__new__", is_new).withColumn(
        "run_id", F.sum("__new__").over(wc)
    )
    agg = runs.groupBy(conv_col, "run_id", *key_cols).agg(
        F.min(order_col).alias("run_start_turn"),
        F.max(order_col).alias("run_end_turn"),
        F.count(F.lit(1)).cast("int").alias("run_len"),
    )
    return agg.where(F.col("run_len") >= min_len).drop("run_id")
