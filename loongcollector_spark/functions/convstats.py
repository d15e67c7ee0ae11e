"""Conversation-level statistics, integrity audit, and dedup.

Engine-added transcript operators for the training-data pipeline (no
direct reference analogue — the reference audits *log streams* via its
self-monitor counters, e.g. ``core/monitor/Monitor.cpp``; these audit a
*turn stream* with the same spirit: cheap, bounded-cardinality,
always-on data-quality signals):

- :func:`turn_order_audit` — per-conversation integrity: duplicate
  ``turn_idx``, gaps in the turn numbering, timestamp inversions, and
  a non-zero base index. The first gate in any transcript ingestion
  job: all four signals come from one conversation-keyed window plus
  one aggregation that reuses the same Exchange.
- :func:`role_transition_matrix` — corpus-level Markov transition
  counts ``role → next role`` (bounded #roles² + terminal rows). The
  canonical structure fingerprint of an agent corpus: a schema drift
  (tool turns suddenly following system turns) shows up here first.
- :func:`conversation_fingerprint` — conversation-level exact dedup:
  an order-preserving digest of every turn's ``(role, text)``, then
  copy-count + keep-first marking per digest group. The conversation
  cousin of :func:`loongcollector_spark.functions.dedup.exact_dedup`
  (document-level).
- :func:`conversation_quality_signals` — per-conversation training
  filter: turn count, assistant fraction, mean assistant turn length,
  duplicated-turn-text fraction, and the composite ``keep`` flag —
  the conversation-level cousin of the Gopher/C4 document filters in
  :mod:`loongcollector_spark.functions.textstats`.
- :func:`tool_usage_stats` — per-tool call counts, conversation
  reach, and mean relative position inside the conversation (early
  vs late tool use).

Scale notes (10^12 turns): every operator here is one
conversation-keyed Exchange (window + partial-aggregated groupBy on
the same key) optionally followed by a second shuffle whose key space
is bounded (digest groups, #roles², #tools) — per-reducer work is
bounded by conversation length or vanishes into map-side partial
aggregation; no operator is bounded by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Unit/record separator control characters used to build an unambiguous
# order-preserving conversation serialization (fields can never contain
# them in well-formed text; they survive both engines' concat verbatim).
_FIELD_SEP = "\x1f"
_TURN_SEP = "\x1e"


def turn_order_audit(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation turn-ordering integrity report.

    Returns one row per conversation:

    - ``n_turns`` — total turns
    - ``n_dup_turns`` — turns beyond the first carrying an already-seen
      ``order_col`` value (``n_turns - count(distinct order)``)
    - ``n_gaps`` — missing values inside ``[min, max]`` of the
      distinct ``order_col`` range
    - ``n_ts_inversions`` — turns whose timestamp is strictly earlier
      than the previous turn's (ordering by ``(order_col, ts_col)``,
      which is deterministic even under duplicate ``order_col``)
    - ``base_ok`` — whether numbering starts at 0
    - ``is_clean`` — all of the above pass

    One conversation-keyed window (lag on the same sort) + one groupBy
    on the same key: a single Exchange end to end.
    """
    w = Window.partitionBy(conv_col).orderBy(order_col, ts_col)
    prev_ts = F.lag(ts_col).over(w)
    inv = F.when(F.col(ts_col) < prev_ts, F.lit(1)).otherwise(F.lit(0))
    stats = (
        df.withColumn("__inv__", inv)
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            (
                F.count(F.lit(1)) - F.count_distinct(F.col(order_col))
            ).cast("int").alias("n_dup_turns"),
            (
                F.max(order_col) - F.min(order_col) + 1
                - F.count_distinct(F.col(order_col))
            ).cast("int").alias("n_gaps"),
            F.sum("__inv__").cast("int").alias("n_ts_inversions"),
            (F.min(order_col) == F.lit(0)).alias("base_ok"),
        )
    )
    return stats.withColumn(
        "is_clean",
        (F.col("n_dup_turns") == 0)
        & (F.col("n_gaps") == 0)
        & (F.col("n_ts_inversions") == 0)
        & F.col("base_ok"),
    )


def role_transition_matrix(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    end_token: str = "<end>",
) -> DataFrame:
    """Corpus-level ``role → next_role`` transition counts.

    Each turn contributes one transition to the role of the next turn
    in its conversation (by ``order_col``); the last turn transitions
    to ``end_token``, so row sums over ``role`` equal turn counts.
    Output cardinality is bounded by ``(#roles + 1)²`` — the second
    shuffle is all map-side partial aggregation. ``order_col`` must be
    unique per conversation for a deterministic matrix (run
    :func:`turn_order_audit` first).
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    nxt = F.coalesce(F.lead(role_col).over(w), F.lit(end_token))
    return (
        df.withColumn("next_role", nxt)
        .groupBy(F.col(role_col).alias("role"), "next_role")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


def conversation_fingerprint(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Conversation-level exact-dedup marking via an ordered digest.

    Serializes each conversation as ``role\\x1ftext`` joined by
    ``\\x1e`` in ``order_col`` order (control-character separators make
    the serialization unambiguous), digests it with md5, and marks
    each conversation with the copy count of its digest group and
    ``keep`` = "is the minimum ``conv_col`` of the group" (keep-first
    semantics, like ``dedup.exact_dedup``'s ``keep_id``).

    Two shuffles: the conversation groupBy (reduces to one row per
    conversation *before* anything moves again) and a digest-keyed
    window over that already-collapsed frame — the second shuffle
    carries one short row per conversation, never turns.
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(order_col), F.col(role_col), F.col(text_col)))
    )
    serialized = F.concat_ws(
        _TURN_SEP,
        F.transform(
            ordered,
            lambda t: F.concat_ws(_FIELD_SEP, t[role_col], t[text_col]),
        ),
    )
    per_conv = df.groupBy(conv_col).agg(
        F.md5(serialized.cast("binary")).alias("conv_digest"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    )
    wd = Window.partitionBy("conv_digest")
    return per_conv.select(
        conv_col,
        "conv_digest",
        "n_turns",
        F.count(F.lit(1)).over(wd).cast("int").alias("n_copies"),
        (F.col(conv_col) == F.min(conv_col).over(wd)).alias("keep"),
    )


def conversation_quality_signals(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    min_turns: int = 2,
    max_turns: int = 64,
    min_assistant_frac: float = 0.1,
    max_assistant_frac: float = 0.9,
    max_dup_text_frac: float = 0.5,
) -> DataFrame:
    """Per-conversation training-quality signals + composite keep flag.

    Signals (one partial-aggregated groupBy, no window):

    - ``n_turns``
    - ``assistant_frac`` — fraction of turns with role ``assistant``
    - ``mean_assistant_chars`` — mean text length of assistant turns
      (NULL when the conversation has none)
    - ``dup_text_frac`` — ``1 - distinct(text)/n_turns``: the
      conversation-internal repetition signal (a looping agent repeats
      itself verbatim)
    - ``keep`` — turn count within ``[min_turns, max_turns]``,
      assistant fraction within its band, and repetition below
      ``max_dup_text_frac``

    Fractions are rounded to 6 decimals so downstream equality checks
    are engine-stable (double-precision division both sides).
    """
    is_a = (F.col(role_col) == "assistant").cast("int")
    agg = df.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.round(F.avg(is_a), 6).alias("assistant_frac"),
        F.round(
            F.avg(F.when(is_a == 1, F.length(F.col(text_col)))), 6
        ).alias("mean_assistant_chars"),
        F.round(
            1 - F.count_distinct(F.col(text_col)) / F.count(F.lit(1)), 6
        ).alias("dup_text_frac"),
    )
    return agg.withColumn(
        "keep",
        F.col("n_turns").between(min_turns, max_turns)
        & F.col("assistant_frac").between(min_assistant_frac, max_assistant_frac)
        & (F.col("dup_text_frac") <= max_dup_text_frac),
    )


def tool_usage_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    none_value: str = "none",
) -> DataFrame:
    """Per-tool usage profile over the corpus.

    For every tool (excluding ``none_value``): call count, distinct
    conversations reached, and the mean *relative position* of the
    call inside its conversation (``order_col / (conv max order)``,
    0 = opening turn, 1 = closing turn; single-turn conversations
    count as position 0). Early-vs-late tool use is the cheap
    behavioral fingerprint of an agent harness.

    One conversation-keyed window (max order) + one bounded-key
    groupBy (#tools rows) — the second shuffle is pure map-side
    partial aggregation.
    """
    w = Window.partitionBy(conv_col)
    rel = F.when(
        F.max(order_col).over(w) > F.min(order_col).over(w),
        (F.col(order_col) - F.min(order_col).over(w))
        / (F.max(order_col).over(w) - F.min(order_col).over(w)),
    ).otherwise(F.lit(0.0))
    calls = df.withColumn("__rel__", rel).where(
        F.col(tool_col) != F.lit(none_value)
    )
    return calls.groupBy(F.col(tool_col).alias("tool")).agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        F.count_distinct(F.col(conv_col)).cast("long").alias("n_convs"),
        F.round(F.avg("__rel__"), 6).alias("mean_rel_position"),
    )
