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
- :func:`conversation_fingerprint_xor` — the scale variant: a
  position-bound per-turn hash XOR-folded map-side (partial
  aggregation), so a hot conversation never materializes in one
  reducer; same dedup marking, int64 digest.
- :func:`conversation_quality_signals` — per-conversation training
  filter: turn count, assistant fraction, mean assistant turn length,
  duplicated-turn-text fraction, and the composite ``keep`` flag —
  the conversation-level cousin of the Gopher/C4 document filters in
  :mod:`loongcollector_spark.functions.textstats`.
- :func:`tool_usage_stats` — per-tool call counts, conversation
  reach, and mean relative position inside the conversation (early
  vs late tool use).
- :func:`conversation_gate` / :func:`training_export` — the fused
  end-to-end export: audit + quality + XOR dedup computed in ONE
  turns-sized Exchange, then the turn stream of surviving
  conversations with digit-run redaction and per-turn token budgets
  (two turns-sized shuffles total at any corpus size).

Scale notes (10^12 turns): every operator here is one
conversation-keyed Exchange (window + partial-aggregated groupBy on
the same key) optionally followed by a second shuffle whose key space
is bounded (digest groups, #roles², #tools) — per-reducer work is
bounded by conversation length or vanishes into map-side partial
aggregation; no operator is bounded by corpus size.
"""

from __future__ import annotations

import pyarrow as pa
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
    # r6: count_distinct(order_col) mixed with plain aggregates forced
    # Spark's Expand plan (2× rows through the partial aggregate). The
    # ordering window already makes duplicate order values ADJACENT, so
    # the distinct count is sum(order != lag(order)) on the Exchange the
    # inversion lag pays for anyway — the same fusion conversation_gate
    # uses (value-identical there, oracled). Plan diff: Expand removed,
    # one window + one non-distinct aggregate on one conv-keyed Exchange.
    w = Window.partitionBy(conv_col).orderBy(order_col, ts_col)
    prev_ts = F.lag(ts_col).over(w)
    inv = F.when(F.col(ts_col) < prev_ts, F.lit(1)).otherwise(F.lit(0))
    prev_idx = F.lag(order_col).over(w)
    new_idx = F.when(
        prev_idx.isNull() | (prev_idx != F.col(order_col)), F.lit(1)
    ).otherwise(F.lit(0))
    stats = (
        df.withColumn("__inv__", inv)
        .withColumn("__new_idx__", new_idx)
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            (
                F.count(F.lit(1)) - F.sum("__new_idx__")
            ).cast("int").alias("n_dup_turns"),
            (
                F.max(order_col) - F.min(order_col) + 1
                - F.sum("__new_idx__")
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


def conversation_fingerprint_xor(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Scale variant of :func:`conversation_fingerprint`: XOR-fold of
    position-bound per-turn hashes — no conversation materialization.

    :func:`conversation_fingerprint` collect_lists each conversation's
    full ``(order, role, text)`` turn set into one reducer before
    serializing. Correct, and the digest shuffle is small — but the
    single reducer that receives a *hot* conversation (a 4M-turn agent
    loop at the 10× bench scale) must hold all of its text at once.
    This variant never materializes a conversation: each turn hashes
    independently (``md5(order <US> role <US> text)`` → first 15 hex
    chars → int64, 60 bits) and the fold is ``bit_xor``, which is
    commutative/associative and therefore **partial-aggregates
    map-side** — the hot conversation's turns combine inside each scan
    task and the conversation-keyed Exchange carries one 16-byte
    partial row per (task, conversation), never text.

    Position binding (``order_col`` participates in the per-turn hash)
    keeps the commutative fold order-sensitive: swapping two turns
    changes both per-turn hashes. Caveat: two *identical*
    ``(order, role, text)`` rows cancel under XOR — gate upstream on
    :func:`turn_order_audit` ``n_dup_turns == 0`` (the audit is the
    documented first stage of transcript ingestion). The dedup window
    keys on ``(digest, n_turns)`` to narrow accidental collisions.

    Output schema matches :func:`conversation_fingerprint` with
    ``conv_digest_xor: long`` in place of the md5 hex digest.
    """
    turn_h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    _FIELD_SEP,
                    F.col(order_col).cast("string"),
                    F.col(role_col),
                    F.col(text_col),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    per_conv = (
        df.select(F.col(conv_col), turn_h.alias("__h__"))
        .groupBy(conv_col)
        .agg(
            F.bit_xor("__h__").alias("conv_digest_xor"),
            F.count(F.lit(1)).cast("int").alias("n_turns"),
        )
    )
    wd = Window.partitionBy("conv_digest_xor", "n_turns")
    return per_conv.select(
        conv_col,
        "conv_digest_xor",
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


def conversation_gate(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
    min_turns: int = 2,
    max_turns: int = 64,
    min_assistant_frac: float = 0.1,
    max_assistant_frac: float = 0.9,
    max_dup_text_frac: float = 0.5,
) -> DataFrame:
    """Fused per-conversation export gate: audit + quality + dedup in
    ONE turns-sized Exchange.

    Running :func:`turn_order_audit`, :func:`conversation_quality_signals`
    and :func:`conversation_fingerprint_xor` separately scans and
    shuffles the turn stream three times. Their aggregations all key on
    the conversation, so this operator computes every signal in one
    pass: the ordering window (timestamp inversions) and a single
    groupBy share one conversation-keyed Exchange, the XOR digest
    folds in the same aggregation, and the dedup window runs over the
    already-collapsed one-row-per-conversation frame (a second,
    conversations-sized shuffle). Output: one row per conversation with
    the audit signals, the quality signals, the digest dedup marking,
    and the composite ``keep`` =
    ``is_clean AND quality_ok AND dedup_keep``.

    The intended consumer is :func:`training_export`, which semi-joins
    the turn stream against ``keep`` conversations — so the full
    audit→filter→dedup→export chain costs two turns-sized shuffles
    total (this gate + the join) at any corpus size.
    """
    # Two count_distincts on DIFFERENT columns (turn_idx, text) would
    # force Spark's Expand plan (3x rows + extra shuffles). The ordering
    # window makes duplicate order values ADJACENT, so the order-column
    # distinct count is sum(order != lag(order)) — window-derived, free
    # on the Exchange the inversion lag already pays for. That leaves
    # count_distinct(text) as the single distinct aggregate, which
    # Spark plans as two aggregate phases on the same conv-keyed
    # partitioning: one turns-sized Exchange end to end.
    w = Window.partitionBy(conv_col).orderBy(order_col, ts_col)
    prev_ts = F.lag(ts_col).over(w)
    inv = F.when(F.col(ts_col) < prev_ts, F.lit(1)).otherwise(F.lit(0))
    prev_idx = F.lag(order_col).over(w)
    new_idx = F.when(
        prev_idx.isNull() | (prev_idx != F.col(order_col)), F.lit(1)
    ).otherwise(F.lit(0))
    turn_h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    _FIELD_SEP,
                    F.col(order_col).cast("string"),
                    F.col(role_col),
                    F.col(text_col),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    is_a = (F.col(role_col) == "assistant").cast("int")
    g = (
        df.withColumn("__inv__", inv)
        .withColumn("__new_idx__", new_idx)
        .withColumn("__h__", turn_h)
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            (
                F.count(F.lit(1)) - F.sum("__new_idx__")
            ).cast("int").alias("n_dup_turns"),
            (
                F.max(order_col) - F.min(order_col) + 1
                - F.sum("__new_idx__")
            ).cast("int").alias("n_gaps"),
            F.sum("__inv__").cast("int").alias("n_ts_inversions"),
            (F.min(order_col) == F.lit(0)).alias("base_ok"),
            F.round(F.avg(is_a), 6).alias("assistant_frac"),
            F.round(
                1 - F.count_distinct(F.col(text_col)) / F.count(F.lit(1)), 6
            ).alias("dup_text_frac"),
            F.bit_xor("__h__").alias("conv_digest_xor"),
        )
    )
    is_clean = (
        (F.col("n_dup_turns") == 0)
        & (F.col("n_gaps") == 0)
        & (F.col("n_ts_inversions") == 0)
        & F.col("base_ok")
    )
    quality_ok = (
        F.col("n_turns").between(min_turns, max_turns)
        & F.col("assistant_frac").between(min_assistant_frac, max_assistant_frac)
        & (F.col("dup_text_frac") <= max_dup_text_frac)
    )
    wd = Window.partitionBy("conv_digest_xor", "n_turns")
    return (
        g.withColumn("is_clean", is_clean)
        .withColumn("quality_ok", quality_ok)
        .withColumn(
            "dedup_keep", F.col(conv_col) == F.min(conv_col).over(wd)
        )
        .withColumn(
            "keep",
            F.col("is_clean") & F.col("quality_ok") & F.col("dedup_keep"),
        )
    )


def training_export(
    df: DataFrame,
    gate: DataFrame | None = None,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    redact_pattern: str = r"\d{4,}",
    redact_token: str = "<num>",
    **gate_kwargs,
) -> DataFrame:
    """Turn-level training-data export: the turn stream of every
    conversation that passes :func:`conversation_gate`, with long digit
    runs redacted (the cheap PII floor — ids, phone numbers, card
    numbers) and a per-turn token-budget estimate attached.

    Two turns-sized shuffles end to end: the gate's conversation
    aggregation and the keep-set semi-join (conversation-keyed; the
    keep side is one short row per surviving conversation, so at
    10^12 turns this is a plain shuffled semi-join on ``conv_col`` —
    never a broadcast of a corpus-sized set). Redaction and token
    counting are narrow projections on top.
    """
    from loongcollector_spark.functions.textstats import (
        bpe_ish_token_count,
    )

    if gate is None:
        gate = conversation_gate(
            df,
            conv_col=conv_col,
            order_col=order_col,
            role_col=role_col,
            text_col=text_col,
            **gate_kwargs,
        )
    keep = gate.where(F.col("keep")).select(conv_col)
    redacted = F.regexp_replace(
        F.col(text_col), redact_pattern, redact_token
    )
    return (
        df.join(keep, conv_col, "left_semi")
        .select(
            F.col(conv_col),
            F.col(order_col),
            F.col(role_col),
            F.col(tool_col),
            redacted.alias("text_redacted"),
            bpe_ish_token_count(redacted).cast("int").alias("n_tokens"),
        )
    )


def turn_repetition_signals(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    ts_col: str = "ts",
    near_threshold: float = 0.8,
) -> DataFrame:
    """Agent-loop repetition gate: per-conversation signals for the
    "model stuck in a loop" failure mode — consecutive turns that are
    exact or near copies of the previous turn.

    Per turn, the token-set Jaccard against the PREVIOUS turn in
    conversation order (lowercased alphanumeric word pieces,
    distinct); aggregated per conversation:

    - ``n_exact_repeats`` — turns whose text equals the previous
      turn's exactly,
    - ``n_near_repeats`` — turns with Jaccard ≥ ``near_threshold``,
    - ``mean_prev_jaccard`` / ``max_prev_jaccard`` — over the
      ``n_turns - 1`` comparable turns (first turn excluded),
    - ``loop_suspect`` — at least half of the comparable turns are
      near-repeats (integer arithmetic; single-turn conversations are
      never suspects).

    Two empty turns in a row count as an exact repeat (Jaccard 1.0).

    Scale shape: ONE conversation-keyed Exchange — the lag window and
    the per-conversation groupBy share the partitioning (same fusion
    as :func:`conversation_gate`); the token arrays ride the Exchange
    once and the lag reuses them (measured: re-tokenizing the lagged
    text post-shuffle to slim the Exchange costs ~1.8× — the second
    regexp pass is dearer than shipping the array at transcript text
    sizes). Jaccard rounds to 6dp before aggregating so results are
    exact cross-engine.

    r6, second pass (guide §2.3 — shuffle fewer, narrower bytes): the
    Exchange ships ``xxhash64`` identities instead of the strings —
    8 bytes replace the full text for the exact-repeat lag comparison,
    and the token set becomes an ``array<long>`` (~40% narrower than
    the string array at transcript token sizes) whose hash-set
    intersect compares longs instead of hashing/equaling strings
    post-shuffle. Token/text identity = 64-bit-hash identity, the same
    documented law :func:`exact_dedup` and the fingerprint family
    already stand on (a collision inside one adjacent-turn pair's
    token union is ~n²/2^64); NULL text keeps a NULL identity so
    NULL-vs-NULL stays "not an exact repeat", exactly like the string
    comparison. Measured 1.46× end-to-end on the 2M corpus with
    byte-identical output.
    """
    w = Window.partitionBy(conv_col).orderBy(order_col, ts_col)
    toks = F.array_distinct(
        F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit(r"[a-z0-9]+"),
            F.lit(0),
        )
    )
    # r6: explicit narrow projection before the window (guide §2.3 —
    # project before the exchange) and |A∪B| = |A|+|B|−|A∩B| instead of
    # a second hash-set pass per row: the arrays are distinct sets, so
    # the identity is exact and array_union (the dearer of the two set
    # ops) drops out; the sizes ride the window as lagged ints.
    base = df.select(
        F.col(conv_col),
        F.col(order_col),
        F.col(ts_col),
        F.when(
            F.col(text_col).isNotNull(), F.xxhash64(F.col(text_col))
        ).alias("__th__"),
        F.transform(toks, lambda s: F.xxhash64(s)).alias("__toks__"),
    ).withColumn("__ntok__", F.size("__toks__"))
    prev_th = F.lag("__th__").over(w)
    prev_toks = F.lag("__toks__").over(w)
    inter = F.size(F.array_intersect(F.col("__toks__"), prev_toks))
    uni = F.col("__ntok__") + F.lag("__ntok__").over(w) - inter
    jac = F.when(prev_toks.isNull(), F.lit(None).cast("double")).otherwise(
        F.round(
            F.when(uni == 0, F.lit(1.0)).otherwise(inter / uni), 6
        )
    )
    exact = F.when(
        F.col("__th__") == prev_th, F.lit(1)
    ).otherwise(F.lit(0))
    per_turn = base.select(
        conv_col,
        jac.alias("__jac__"),
        exact.alias("__exact__"),
    )
    return per_turn.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.sum("__exact__").cast("int").alias("n_exact_repeats"),
        F.sum(
            F.when(F.col("__jac__") >= near_threshold, 1).otherwise(0)
        ).cast("int").alias("n_near_repeats"),
        F.round(F.avg("__jac__"), 6).alias("mean_prev_jaccard"),
        F.max("__jac__").alias("max_prev_jaccard"),
    ).withColumn(
        "loop_suspect",
        (F.col("n_turns") > 1)
        & (F.col("n_near_repeats") * 2 >= F.col("n_turns") - 1),
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


PII_PATTERNS: dict[str, str] = {
    # the auditable floor — deliberately simple, deterministic regexes
    # both engines run identically (no lookarounds)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "long_digit_run": r"\d{8,}",
    "phone_ish": r"\+?\d[\d\- ]{8,}\d",
}

_PII_ARROW_UDFS: dict[str, object] = {}


def _pii_count_arrow(name: str):
    """Arrow-batched RE2 match counter for one PII pattern class (ASCII
    classes + \\b word boundary — RE2 and java.util.regex agree on
    these; see :func:`textstats.bpe_ish_token_count` for the law)."""
    udf = _PII_ARROW_UDFS.get(name)
    if udf is None:
        pat = PII_PATTERNS[name]

        @F.arrow_udf("int")
        def _count(arr: pa.Array) -> pa.Array:
            import pyarrow as pa
            import pyarrow.compute as pc

            return pc.cast(pc.count_substring_regex(arr, pat), pa.int32())

        udf = _PII_ARROW_UDFS[name] = _count
    return udf


def pii_scan_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation PII-pattern audit — the measurement side of the
    export pipeline's redaction floor (:func:`training_export` redacts
    digit runs; this op tells you what else is there and how much):
    per conversation, the hit count for each pattern class in
    :data:`PII_PATTERNS`, total hits, and the count of turns carrying
    at least one hit.

    One narrow projection of ``regexp_count`` columns (codegen'd, one
    regex pass per class) + one conversation-keyed map-side-combinable
    groupBy — scan speed at any corpus size; redaction policy work
    (which classes block export, which mask) stays declarative on top.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    # r6: Arrow-batched RE2 counts (one ArrowEvalPython node evaluates
    # all four patterns per batch) instead of four JVM regexp passes —
    # guide §4.2; measured ~3× on the 2M corpus, and the count law is
    # engine-identical for these ASCII-class patterns (verified 0
    # mismatches vs regexp_count over 2M rows + the value oracle).
    counts = {
        name: _pii_count_arrow(name)(t).alias(f"n_{name}")
        for name in PII_PATTERNS
    }
    per_turn = df.select(F.col(conv_col), *counts.values())
    total = sum(
        (F.col(f"n_{name}") for name in PII_PATTERNS), F.lit(0)
    )
    per_turn = per_turn.withColumn("__total__", total)
    aggs = [
        F.sum(f"n_{name}").cast("int").alias(f"n_{name}")
        for name in PII_PATTERNS
    ]
    return per_turn.groupBy(conv_col).agg(
        *aggs,
        F.sum("__total__").cast("int").alias("n_pii_hits"),
        F.sum(
            F.when(F.col("__total__") > 0, 1).otherwise(0)
        ).cast("int").alias("n_turns_with_pii"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    )


def json_key_drift(
    df: DataFrame,
    json_col: str = "text",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Payload schema-drift monitor for JSON-grammar streams: per
    (json key, time bucket) row counts plus each key's first/last seen
    bucket and an ``is_new`` flag — a producer adding or dropping a
    field shows up here the bucket it happens (the reference's
    self-monitor counts parse outcomes; this watches the *shape* of
    what parses).

    ``json_object_keys`` returns NULL on non-object input, so invalid
    rows drop out of the explode instead of erroring. Two bounded
    shuffles: (key, bucket) groupBy (map-side combinable; cardinality
    = #keys × #buckets) and a key-partitioned window over that
    collapsed table for first/last seen.
    """
    g = df.select(
        F.explode(F.json_object_keys(F.col(json_col))).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
    )
    per = g.groupBy("key", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    w = Window.partitionBy("key")
    return (
        per.withColumn("first_seen", F.min("bucket").over(w))
        .withColumn("last_seen", F.max("bucket").over(w))
        .withColumn("is_new", F.col("bucket") == F.col("first_seen"))
    )
