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
