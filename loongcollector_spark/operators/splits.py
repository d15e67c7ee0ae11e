"""Split / explode / multiline-merge processors (SURVEY.md §2.1).

* field splits (``processor_split_char`` / ``processor_split_string``) —
  ``F.split`` + ``try_element_at``
* event splits (``processor_split_log_string`` / ``_regex``) — ``explode``:
  one event becomes many rows
* multiline merge (``processor_merge_multiline_log_native``) — the inverse:
  sessionize continuation lines into one event. Expressed with a window
  over (source, offset): a running count of start-markers assigns each
  line to its logical event, then ``collect_list`` within the group —
  no per-row Python, two narrow shuffles on the source key.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loongcollector_spark.operators.base import Processor, register


@register("processor_split_char")
class SplitChar(Processor):
    """Single-char split into SplitKeys
    (plugins/processor/split/char/split_char.go:35-46). ``PreserveOthers``
    keeps the unsplit remainder under ``_split_preserve_``."""

    def __init__(
        self,
        SourceKey: str,
        SplitSep: str,
        SplitKeys: list[str],
        PreserveOthers: bool = False,
    ) -> None:
        if len(SplitSep) != 1:
            raise ValueError("SplitSep must be a single char")
        self.source_key = SourceKey
        self.sep = SplitSep
        self.keys = SplitKeys
        self.preserve_others = PreserveOthers

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        arr = F.split(src, re.escape(self.sep), -1)
        for i, k in enumerate(self.keys):
            df = df.withColumn(k, F.try_element_at(arr, F.lit(i + 1)))
        if self.preserve_others:
            nk = len(self.keys)
            df = df.withColumn(
                "_split_preserve_",
                F.when(
                    F.size(arr) > nk,
                    F.array_join(F.slice(arr, nk + 1, 1_000_000), self.sep),
                ),
            )
        return df


@register("processor_split_string")
class SplitString(SplitChar):
    """Multi-char delimiter variant
    (plugins/processor/split/string/split_string.go:34-46)."""

    def __init__(
        self,
        SourceKey: str,
        SplitSep: str,
        SplitKeys: list[str],
        PreserveOthers: bool = False,
    ) -> None:
        self.source_key = SourceKey
        self.sep = SplitSep
        self.keys = SplitKeys
        self.preserve_others = PreserveOthers


@register("processor_split_log_string")
class SplitLogString(Processor):
    """Split ONE event into MANY by separator — ``explode``
    (plugins/processor/split/logstring/split_log_string.go; native twin
    core/plugin/processor/inner/ProcessorSplitLogStringNative.h:33-34).
    Preserves intra-event order via a ``part_idx`` column."""

    def __init__(
        self, SourceKey: str, SplitSep: str = "\n", PartIdxKey: str | None = "part_idx"
    ) -> None:
        self.source_key = SourceKey
        self.sep = SplitSep
        self.part_idx_key = PartIdxKey

    def __call__(self, df: DataFrame) -> DataFrame:
        arr = F.split(F.col(self.source_key), re.escape(self.sep), -1)
        if self.part_idx_key:
            return (
                df.select(
                    "*",
                    F.posexplode(arr).alias(self.part_idx_key, "__lc_part_val__"),
                )
                .withColumn(self.source_key, F.col("__lc_part_val__"))
                .drop("__lc_part_val__")
            )
        return df.withColumn(self.source_key, F.explode(arr))


@register("processor_split_log_regex")
class SplitLogRegex(Processor):
    """Split one event into many at line-start-regex boundaries (multiline
    split — plugins/processor/split/logregex/split_log_regex.go).

    Lines are grouped so each output part begins with a line matching
    ``SplitRegex``; leading non-matching lines form part 0 (the
    reference's NoMatchError/keep behavior). Pure array ops: split,
    running-flag via ``aggregate``, no UDF.
    """

    def __init__(self, SourceKey: str, SplitRegex: str, PartIdxKey: str = "part_idx"):
        self.source_key = SourceKey
        self.split_regex = SplitRegex
        self.part_idx_key = PartIdxKey

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        lines = F.split(src, r"\n", -1)
        rx = self.split_regex
        # per-line group id = running count of start-marker lines
        gid = F.transform(
            lines,
            lambda line, i: F.size(
                F.filter(
                    F.slice(lines, 1, i + 1),
                    lambda l: l.rlike(f"^(?:{rx})"),
                )
            ),
        )
        # zip lines with group ids, then collect per distinct gid
        zipped = F.zip_with(
            lines, gid, lambda line, g: F.struct(g.alias("g"), line.alias("line"))
        )
        groups = F.transform(
            F.array_distinct(F.transform(zipped, lambda s: s["g"])),
            lambda g: F.array_join(
                F.transform(
                    F.filter(zipped, lambda s: s["g"] == g),
                    lambda s: s["line"],
                ),
                "\n",
            ),
        )
        out = df.select(
            "*", F.posexplode(groups).alias(self.part_idx_key, "__lc_part_val__")
        )
        return out.withColumn(self.source_key, F.col("__lc_part_val__")).drop(
            "__lc_part_val__"
        )


@register("processor_merge_multiline_log_native")
class MergeMultilineLog(Processor):
    """Merge continuation rows into one logical event
    (core/plugin/processor/inner/ProcessorMergeMultilineLogNative.cpp:161-345,
    ProcessorSplitMultilineLogStringNative.h:68-79).

    Rows ordered by (GroupKey, OrderKey). Supported pattern combinations
    mirror MergeLogsByRegex (.cpp:162-169): Start, Start+Continue,
    Start+End, Continue+End, End — Continue alone is invalid, exactly as
    in the reference. ``UnmatchedContentTreatment``: 'single_line' emits
    unmatched rows as their own events; 'discard' drops them.

    Physical plans:
    * Start-only fast path — a window over (GroupKey → OrderKey) computing
      a running sum of start flags (one shuffle on GroupKey), then groupBy
      the assigned event id with ``array_join(collect_list(...))``; no
      Python at all.
    * Continue/End combinations — the reference's two-state FSM is
      inherently sequential per group, so it runs in ``applyInPandas``
      per GroupKey. The expensive part (regex matching) is still
      JVM-vectorized: Start/Continue/End flags are computed with
      ``rlike`` *before* the shuffle, and the pandas FSM consumes only
      booleans + strings — O(lines) branch logic per group, one shuffle
      on GroupKey. Groups are conversations/files: bounded, skew-safe.
    """

    def __init__(
        self,
        SourceKey: str,
        GroupKey: str,
        OrderKey: str,
        StartPattern: str | None = None,
        ContinuePattern: str | None = None,
        EndPattern: str | None = None,
        UnmatchedContentTreatment: str = "single_line",
    ) -> None:
        if not (StartPattern or ContinuePattern or EndPattern):
            raise ValueError("at least one of Start/Continue/EndPattern required")
        if ContinuePattern and not (StartPattern or EndPattern):
            raise ValueError(
                "ContinuePattern alone is unsupported (reference "
                "MergeLogsByRegex supports start, start+continue, "
                "start+end, continue+end, end)"
            )
        for p in (StartPattern, ContinuePattern, EndPattern):
            if p:
                re.compile(p)  # fail fast at config time, like Init()
        self.source_key = SourceKey
        self.start_pattern = StartPattern
        self.continue_pattern = ContinuePattern
        self.end_pattern = EndPattern
        self.group_key = GroupKey
        self.order_key = OrderKey
        self.unmatched = UnmatchedContentTreatment

    def __call__(self, df: DataFrame) -> DataFrame:
        if df.isStreaming:
            # The batch merge needs a total per-group order; a streaming
            # source's _offset_ is only ordered within a micro-batch, so
            # the window/FSM here would interleave one file's lines
            # across triggers (VERDICT r2 #4). Fail loud with the right
            # tool instead of Spark's generic unsupported-window error.
            raise ValueError(
                "MergeMultilineLog is a batch operator; for streams use "
                "loongcollector_spark.streaming.pipeline."
                "stateful_multiline_merge (stateful, trigger-safe), or run "
                "this operator inside foreachBatch after "
                "sources.files.per_file_line_offsets"
            )
        if self.continue_pattern or self.end_pattern:
            return self._call_fsm(df)
        return self._call_start_only(df)

    def _call_fsm(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        src = F.col(self.source_key)
        has_s = self.start_pattern is not None
        has_c = self.continue_pattern is not None
        has_e = self.end_pattern is not None
        single_line = self.unmatched != "discard"
        group_key, order_key, source_key = (
            self.group_key,
            self.order_key,
            self.source_key,
        )

        def flag(pattern):
            # BoostRegexSearch is a *search*, not a full match
            return F.coalesce(src.rlike(pattern), F.lit(False)) if pattern else F.lit(False)

        flagged = df.select(
            group_key,
            order_key,
            src.alias("__v__"),
            flag(self.start_pattern).alias("__s__"),
            flag(self.continue_pattern).alias("__c__"),
            flag(self.end_pattern).alias("__e__"),
        )
        in_schema = dict(zip(df.schema.names, df.schema.fields))
        out_schema = T.StructType(
            [
                in_schema[group_key],
                T.StructField(source_key, T.StringType()),
                in_schema[order_key],
                T.StructField("n_merged", T.LongType()),
            ]
        )

        def fsm(pdf):
            import pandas as pd

            pdf = pdf.sort_values(order_key)
            gval = pdf[group_key].iloc[0]
            rows = list(
                zip(pdf[order_key], pdf["__v__"], pdf["__s__"], pdf["__c__"], pdf["__e__"])
            )
            out: list[tuple] = []
            events: list[tuple] = []  # (order, text)

            def emit_merge():
                if events:
                    out.append(
                        (
                            gval,
                            "\n".join("" if t is None else t for _, t in events),
                            events[0][0],
                            len(events),
                        )
                    )
                    events.clear()

            def unmatch(batch):
                if single_line:
                    for o, t in batch:
                        out.append((gval, t, o, 1))

            # only-End sticks to the partial state (.cpp:176-180)
            partial = not has_s and not has_c and has_e
            for o, t, s, c, e in rows:
                if not partial:
                    primary = s if has_s else c
                    if primary:
                        events.append((o, t))
                        partial = True
                    elif has_e and not has_s and has_c and e:
                        # continue+end: an end line outside a partial is a
                        # complete single event (.cpp:230-238)
                        out.append((gval, t, o, 1))
                    else:
                        unmatch([(o, t)])
                else:
                    if has_c and c:
                        events.append((o, t))
                        continue
                    if has_e:
                        events.append((o, t))
                        if has_c:
                            # end pattern decides (.cpp:253-264)
                            if e:
                                emit_merge()
                            else:
                                unmatch(events)
                                events.clear()
                            partial = False
                        else:
                            if e:
                                emit_merge()
                                if has_s:
                                    partial = False
                                # only-end: stay partial, next log starts
                            # not end → wait for the next line
                    else:
                        if not has_c:
                            # start only (fast path handles this normally)
                            if not s:
                                events.append((o, t))
                            else:
                                emit_merge()
                                events.append((o, t))
                        else:
                            # start+continue: current line broke the run
                            emit_merge()
                            if not s:
                                unmatch([(o, t)])
                                partial = False
                            else:
                                events.append((o, t))
            if partial and events:
                if not has_e:
                    emit_merge()
                else:
                    unmatch(events)  # dangling partial with End → unmatched
            return pd.DataFrame(
                out, columns=[group_key, source_key, order_key, "n_merged"]
            )

        return flagged.groupBy(group_key).applyInPandas(fsm, schema=out_schema)

    def _call_start_only(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        is_start = src.rlike(f"^(?:{self.start_pattern})")
        w = (
            Window.partitionBy(self.group_key)
            .orderBy(self.order_key)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        df = df.withColumn("__lc_evt__", F.sum(is_start.cast("int")).over(w))
        if self.unmatched == "discard":
            df = df.filter(F.col("__lc_evt__") > 0)
        elif self.unmatched == "merge":
            # engine extension: leading unmatched rows merge into one
            # event (used e.g. to collapse a whole group when no start
            # marker exists) — not a reference treatment
            pass
        else:
            # 'single_line': leading unmatched rows (before any start
            # marker, __lc_evt__ == 0) are emitted as their OWN events —
            # give each a distinct negative event id keyed by order
            # (ProcessorMergeMultilineLogNative unmatched handling).
            df = df.withColumn(
                "__lc_evt__",
                F.when(
                    F.col("__lc_evt__") == 0,
                    -(F.col(self.order_key).cast("long") + F.lit(1)),
                ).otherwise(F.col("__lc_evt__")),
            )
        merged = (
            df.groupBy(self.group_key, "__lc_evt__")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col(self.order_key).alias("o"), src.alias("v"))
                            )
                        ),
                        lambda s: s["v"],
                    ),
                    "\n",
                ).alias(self.source_key),
                F.min(self.order_key).alias(self.order_key),
                F.count(F.lit(1)).alias("n_merged"),
            )
            .drop("__lc_evt__")
        )
        return merged


@register("processor_merge_partial_logs")
class MergePartialLogs(Processor):
    """Flag-based partial-log merge — the MergeType='flags' branch of
    ProcessorMergeMultilineLogNative (.cpp:106-159): runs of rows carrying
    the partial flag (containerd ``P`` tag) merge with the first
    following unflagged row; pieces concatenate with NO separator
    (MergeEvents insertLineBreak=false). A trailing flagged run with no
    final piece still merges (.cpp:154-157).

    Pure window SQL, no FSM needed: a run [P,P,...,final] shares the
    exclusive running count of unflagged rows, so one shuffle on GroupKey
    + one groupBy — the same segment trick as the Continue+End oracle.
    """

    def __init__(
        self,
        SourceKey: str,
        GroupKey: str,
        OrderKey: str,
        PartFlagKey: str = "_part_",
    ) -> None:
        self.source_key = SourceKey
        self.group_key = GroupKey
        self.order_key = OrderKey
        self.part_key = PartFlagKey

    def __call__(self, df: DataFrame) -> DataFrame:
        part = F.coalesce(F.col(self.part_key), F.lit(False))
        w = (
            Window.partitionBy(self.group_key)
            .orderBy(self.order_key)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        seg = F.coalesce(
            F.sum(F.when(~part, 1).otherwise(0)).over(w), F.lit(0)
        )
        df = df.withColumn("__lc_seg__", seg)
        merged = (
            df.groupBy(self.group_key, "__lc_seg__")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col(self.order_key).alias("o"),
                                    F.col(self.source_key).alias("v"),
                                )
                            )
                        ),
                        lambda s: s["v"],
                    ),
                    "",
                ).alias(self.source_key),
                F.min(self.order_key).alias(self.order_key),
                F.count(F.lit(1)).alias("n_merged"),
            )
            .drop("__lc_seg__")
        )
        return merged
