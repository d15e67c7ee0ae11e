"""Structured Streaming: the same parse → enrich → route → aggregate over
an unbounded transcript stream.

The reference's streaming semantics are arrival-time + timeout-flush with
NO watermark/late-data handling (Batcher FlushStrategy.h:54-58; SURVEY.md
§2.9). The Spark-native upgrade is event-time windows + watermark — we
provide both: ``metrics_stream`` uses a watermark (late rows dropped after
``late_threshold``); sinks are plain append streams (arrival order, like
the reference's flushers).

The batch ``TranscriptPipeline.parse/enrich`` transforms are reused
verbatim — they're pure column expressions, legal on streaming frames;
the broadcast dict join is stream-static (no state). Custom stateful
operator example: per-key token-bucket rate limiting via
``applyInPandasWithState`` (the true streaming analogue of
processor_rate_limit — plugins/processor/ratelimit/processor_rate_limit.go).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from loongcollector_spark.plans.transcript_pipeline import TranscriptPipeline


class StreamingTranscriptPipeline:
    """Streaming wrapper around the batch pipeline's transforms."""

    def __init__(self, late_threshold: str = "10 minutes",
                 window: str = "1 hour"):
        self.batch = TranscriptPipeline()
        self.late_threshold = late_threshold
        self.window = window

    # -- source ---------------------------------------------------------
    def read_stream(self, spark, path: str, schema=None,
                    max_files: int = 4) -> DataFrame:
        """File-source stream over a transcripts parquet directory —
        the batch-test-friendly source; swap for kafka/iceberg streaming
        reads in production."""
        reader = spark.readStream.format("parquet").option(
            "maxFilesPerTrigger", max_files
        )
        if schema is not None:
            reader = reader.schema(schema)
        else:
            static = spark.read.parquet(path)
            reader = reader.schema(static.schema)
        return reader.load(path)

    # -- transforms (shared with batch) ----------------------------------
    def parse_enrich(self, stream: DataFrame) -> DataFrame:
        return self.batch.enrich(self.batch.parse(stream))

    def route(self, enriched: DataFrame) -> dict[str, DataFrame]:
        """Multicast on a stream: each sink is an independent filtered
        view; each started query re-reads from the source (per-query
        checkpoints) — the streaming twin of the cached-parent fan-out."""
        return self.batch.route(enriched) if not enriched.isStreaming else {
            name: (enriched if r.condition is None
                   else enriched.filter(r.condition.predicate()))
            for name, r in ((r.name, r) for r in self.batch.router.routes)
        }

    def metrics_stream(self, enriched: DataFrame) -> DataFrame:
        """Watermarked per-sink-ready aggregates: (conv_prefix, window) →
        counts/bytes. Late rows beyond the watermark are dropped —
        the semantics the reference lacks (SURVEY.md §2.9)."""
        # watermarks require TIMESTAMP (with zone); transcripts carry NTZ
        enriched = enriched.withColumn("__evt_ts__", F.col("ts").cast("timestamp"))
        return (
            enriched.withWatermark("__evt_ts__", self.late_threshold)
            .groupBy(
                F.window("__evt_ts__", self.window).alias("ts_window"),
                F.substring(F.col("conv_id"), 1, 6).alias("conv_prefix"),
                F.coalesce(F.col("error_class"), F.lit("")).alias("error_class"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.octet_length(F.col("text"))).alias("n_bytes"),
            )
        )

    def session_rollup_stream(
        self, stream: DataFrame, gap: str = "24 hours"
    ) -> DataFrame:
        """Streaming twin of :func:`functions.sessions.sessionize`'s
        rollup, via Spark's NATIVE ``session_window``: turns whose
        time gaps stay under ``gap`` merge into one session; output is
        (conv_id, session_start, session_end, n_turns).

        Equivalence law vs the batch operator (tested, incl. the exact
        boundary): on turn streams whose ``ts`` is non-decreasing in
        turn order, AND whose watermark delay (``late_threshold``)
        covers the maximum cross-batch event-time disorder, the session
        sets match batch ``sessionize`` exactly — session_window merges
        touching windows, so a gap EXACTLY equal to the threshold stays
        one session, the same as the batch rule's strict ``>``.

        The second condition is load-bearing across micro-batches: the
        watermark is GLOBAL, so with a short delay a conversation's
        open session can be evicted from state because *other*
        conversations carried later timestamps in an earlier batch —
        its next turn then opens a fresh session (a split batch would
        never produce) or is dropped as late. For an availableNow
        replay of a static directory, ``late_threshold`` ≥ the corpus
        time-span guarantees exact equality; in continuous production
        the delay is the operator's late-data tolerance and sessions
        older than it are finalized best-effort (streaming-only
        semantics)."""
        evt = stream.withColumn("__evt_ts__", F.col("ts").cast("timestamp"))
        return (
            evt.withWatermark("__evt_ts__", self.late_threshold)
            .groupBy(
                F.col("conv_id"),
                F.session_window(F.col("__evt_ts__"), gap).alias("sw"),
            )
            .agg(F.count(F.lit(1)).alias("n_turns"))
            .select(
                "conv_id",
                F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"),
                "n_turns",
            )
        )

    def dedup_stream(self, stream: DataFrame, text_col: str = "text",
                     ts_col: str = "ts") -> DataFrame:
        """Streaming twin of :func:`functions.dedup.exact_dedup`:
        at-source exact dedup on the normalized-text digest via
        ``dropDuplicatesWithinWatermark`` — state holds one digest per
        distinct text and the watermark bounds it (digests older than
        ``late_threshold`` age out, so state is O(distinct texts per
        watermark window), not O(corpus)).

        Equivalence law vs batch (tested): the kept rows' DIGEST SET
        equals the batch distinct-digest set and every digest survives
        exactly once, provided duplicates arrive within the watermark.
        WHICH copy survives is arrival order (streaming) vs
        ``min(doc_id)`` (batch) — at-source dedup keeps the first copy
        it sees, the same semantics as the reference's collector-side
        event dedup."""
        from loongcollector_spark.functions.dedup import normalize_text

        evt = (
            stream.withColumn("__evt_ts__", F.col(ts_col).cast("timestamp"))
            .withColumn(
                "__digest__", F.xxhash64(normalize_text(F.col(text_col)))
            )
        )
        return evt.withWatermark(
            "__evt_ts__", self.late_threshold
        ).dropDuplicatesWithinWatermark(["__digest__"])

    def start_to_memory(self, spark, path: str, name: str = "lc_stream",
                        mode: str = "append") -> "StreamingQuery":  # noqa: F821
        """Test harness: run the parse+enrich stream into a memory sink."""
        stream = self.read_stream(spark, path)
        out = self.parse_enrich(stream)
        return (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )


_RL_STATE = T.StructType([T.StructField("seen", T.LongType())])


def stateful_rate_limit(
    df: DataFrame,
    key_cols: list[str],
    limit: int,
    output_schema: str | T.StructType | None = None,
):
    """Streaming token-bucket: at most ``limit`` rows pass per key over
    the stream lifetime (reset via state timeout in production configs).
    applyInPandasWithState — the engine's custom-stateful-operator
    extension point (the reference's Go-plugin ABI analogue).
    """
    out_schema = output_schema or df.schema

    def fn(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:
        seen = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if seen >= limit:
                break
            take = pdf.iloc[: max(0, limit - seen)]
            seen += len(take)
            if len(take):
                yield take
        state.update((seen,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_RL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_ML_STATE = T.StructType(
    [
        T.StructField("pending_order", T.LongType()),
        T.StructField("pending_text", T.StringType()),
        T.StructField("n_pending", T.LongType()),
    ]
)


def stateful_multiline_merge(
    df: DataFrame,
    group_col: str,
    order_col: str,
    source_col: str,
    start_pattern: str,
    timeout_ms: int = 0,
):
    """Streaming start-pattern multiline merge — the true streaming
    analogue of MergeMultilineLog's fast path (the reference merges
    multiline *as the file tails*, not per batch).

    State per group = the currently-open logical event (first order,
    accumulated text, line count). Each micro-batch continues the merge:
    a line matching ``start_pattern`` closes the open event (emitting it)
    and opens a new one; other lines append. Leading lines with no open
    event emit as singles (single_line treatment). With ``timeout_ms`` >
    0 the open event flushes after that much processing-time idleness —
    the streaming replacement for end-of-input flush.

    Output: (group, source, order, n_merged) — identical shape to the
    batch operator, so batch == streaming equivalence is testable
    row-for-row (modulo the still-open tail event).
    """
    import re as _re

    out_schema = T.StructType(
        [
            df.schema[group_col],
            T.StructField(source_col, T.StringType()),
            T.StructField(order_col, T.LongType()),
            T.StructField("n_merged", T.LongType()),
        ]
    )
    rx = _re.compile(start_pattern)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        gval = key[0]
        cols = [group_col, source_col, order_col, "n_merged"]
        if state.hasTimedOut:
            po, pt, n = state.get
            state.remove()
            yield pd.DataFrame([[gval, pt, po, n]], columns=cols)
            return
        # pending = (first_order, [pieces], n_lines) — list-accumulate +
        # join so a long open event costs O(total bytes), not quadratic
        pending = None
        if state.exists:
            po, pt, n = state.get
            pending = (po, [pt], n)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            for o, t in zip(pdf[order_col], pdf[source_col]):
                text = "" if t is None else t
                if rx.search(text):
                    if pending is not None:
                        out.append(
                            [gval, "\n".join(pending[1]), pending[0], pending[2]]
                        )
                    pending = (int(o), [text], 1)
                elif pending is not None:
                    pending[1].append(text)
                    pending = (pending[0], pending[1], pending[2] + 1)
                else:
                    out.append([gval, text, int(o), 1])
        if pending is not None:
            state.update((pending[0], "\n".join(pending[1]), pending[2]))
            if timeout_ms > 0:
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(out, columns=cols)

    return df.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_ML_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )


class ForeachBatchMultilineMerge:
    """Cross-trigger multiline merge with FULL batch-operator semantics
    (all six Start/Continue/End pattern modes + unmatched treatment) —
    the ``foreachBatch`` completion of the streaming story (VERDICT r3
    #4; reference: ProcessorMergeMultilineLogNative.cpp:161-345 merges
    as the file tails).

    Key fact making this exact: the merge FSM is *prefix-determined* —
    only the EOF-*open* region (the event/run still open after the last
    line) can change when more lines arrive; everything before its head
    is final. Per micro-batch we (1) prepend each group's carried
    trailing lines, (2) shift the batch's dense per-group ordinals by
    the carried high-water mark, (3) run the UNMODIFIED batch
    ``MergeMultilineLog`` plus its ``open_region_heads`` (same flag
    vectors), (4) emit every merged row before the group's open head,
    and (5) carry the raw lines from the head onward. ``flush()``
    merges the final carry — end-of-stream == end-of-input, applying
    the operator's unmatched treatment to the tail exactly once. The
    emitted union + flush is row-for-row equal to the batch operator
    over the concatenated input (differential-tested across modes,
    treatments, and chunkings).

    State lives in epoch-versioned parquet (``carry/epoch=N``,
    ``out/epoch=N``) written with overwrite, so a retried micro-batch
    re-reads its predecessor's carry and rewrites the same epoch —
    idempotent under foreachBatch's at-least-once replays (the same
    lineage discipline as checkpoint.py).

    Feed it batches whose ``OrderKey`` is the DENSE 0-based per-group
    line ordinal within the batch (``sources.files.per_file_line_offsets``
    with ``file_col=GroupKey``); arrange one file chunk per trigger
    (``maxFilesPerTrigger=1``) when one logical stream spans several
    physical files.
    """

    def __init__(self, merger, carry_dir: str, out_dir: str) -> None:
        self.merger = merger
        self.carry_dir = carry_dir.rstrip("/")
        self.out_dir = out_dir.rstrip("/")

    # -- epoch bookkeeping ------------------------------------------------
    def _prev_epoch(self, before: int) -> int | None:
        import os

        if not os.path.isdir(self.carry_dir):
            return None
        epochs = [
            int(d.split("=", 1)[1])
            for d in os.listdir(self.carry_dir)
            if d.startswith("epoch=")
        ]
        prior = [e for e in epochs if e < before]
        return max(prior) if prior else None

    def _read_carry(self, spark, schema, before: int):
        """(pending-lines DF, high-water-mark DF) from the newest epoch
        before ``before`` — empties on the first trigger."""
        hwm_schema = T.StructType(
            [schema[0], T.StructField("__next__", T.LongType())]
        )
        prev = self._prev_epoch(before)
        if prev is None:
            return (
                spark.createDataFrame([], schema),
                spark.createDataFrame([], hwm_schema),
            )
        base = f"{self.carry_dir}/epoch={prev}"
        return (
            spark.read.schema(schema).parquet(f"{base}/lines"),
            spark.read.schema(hwm_schema).parquet(f"{base}/hwm"),
        )

    # -- per-trigger work -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        m = self.merger
        g, o, s = m.group_key, m.order_key, m.source_key
        spark = batch_df.sparkSession
        lines = batch_df.select(g, o, s)
        carry, hwm = self._read_carry(spark, lines.schema, int(batch_id))

        # stream-cumulative per-group ordinals: shift this batch's dense
        # ordinals by the group's high-water mark (kept even for groups
        # whose tail closed cleanly and carried no lines)
        shifted = (
            lines.join(hwm, g, "left")
            .withColumn(o, F.col(o) + F.coalesce(F.col("__next__"), F.lit(0)))
            .drop("__next__")
        )
        all_lines = carry.unionByName(shifted)
        merged = m(all_lines)
        # the EOF-open region head per group: rows before it are final
        heads = m.open_region_heads(all_lines)
        closed = (
            merged.join(heads, g, "left")
            .filter(
                F.col("__open_head__").isNull()
                | (F.col(o) < F.col("__open_head__"))
            )
            .drop("__open_head__")
        )
        closed.write.mode("overwrite").parquet(
            f"{self.out_dir}/epoch={batch_id}"
        )
        pending = (
            all_lines.join(heads, g)
            .filter(F.col(o) >= F.col("__open_head__"))
            .drop("__open_head__")
        )
        new_hwm = (
            all_lines.groupBy(g).agg((F.max(o) + 1).alias("__b__"))
            .join(hwm, g, "full")
            .select(
                g,
                F.greatest(
                    F.coalesce(F.col("__b__"), F.lit(0)),
                    F.coalesce(F.col("__next__"), F.lit(0)),
                ).alias("__next__"),
            )
        )
        base = f"{self.carry_dir}/epoch={batch_id}"
        pending.write.mode("overwrite").parquet(f"{base}/lines")
        new_hwm.write.mode("overwrite").parquet(f"{base}/hwm")

    def flush(self, spark) -> None:
        """End-of-stream: merge the final carry (applying the operator's
        end-of-input unmatched treatment) and emit it."""
        m = self.merger
        final = self._prev_epoch(before=1 << 62)
        if final is None:
            return
        carry = spark.read.parquet(f"{self.carry_dir}/epoch={final}/lines")
        m(carry).write.mode("overwrite").parquet(
            f"{self.out_dir}/epoch=flush"
        )

    def results(self, spark) -> DataFrame:
        """All emitted merged events so far (epochs + flush)."""
        return spark.read.option("basePath", self.out_dir).parquet(
            f"{self.out_dir}/epoch=*"
        ).drop("epoch")
