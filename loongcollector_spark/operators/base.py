"""Processor framework: config-driven DataFrame → DataFrame transforms.

The reference executes declarative YAML pipelines of plugins (inputs →
processors → aggregators → flushers); each processor mutates a batch of
string-keyed events in place. Here a processor is a pure function
``DataFrame → DataFrame`` built from the *same config shape* the reference
uses (``SourceKey``, ``Regex``, ``Keys`` ...), so reference pipeline configs
translate 1:1. Spark/Catalyst then fuses the whole processor chain into
narrow codegen'd stages — there is no per-event interpreter loop.

Parse-failure semantics follow the reference's CommonParserOptions matrix
(core/plugin/processor/CommonParserOptions.cpp:91-117):

* success + ``KeepingSourceWhenParseSucceed``  → source kept under
  ``RenamedSourceKey`` (default: the source key itself)
* failure + ``KeepingSourceWhenParseFail``     → source kept under
  ``RenamedSourceKey``; with legacy ``CopingRawLog`` also copied to
  ``__raw_log__``
* failure + not keeping                        → the event is dropped
  (ShouldEraseEvent: nothing else remains in the event's contents)

Engine extension: ``ErrorClassKey`` — when set, failed rows are *kept* and
tagged with an error-class column (e.g. ``regex_parse_fail``) instead of
dropped; this powers the per-sink error-class histograms that mirror the
reference's self-monitor counters (mDiscardedEventsTotal etc.,
core/plugin/processor/ProcessorParseRegexNative.h:64-67).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEGACY_RAW_LOG_KEY = "__raw_log__"


def last_win_entries(entries: Column) -> Column:
    """Drop all but the LAST occurrence of each ``key`` in an array of
    (key, value) structs, so a following ``map_from_entries`` is safe
    under ANY ``spark.sql.mapKeyDedupPolicy`` (the default EXCEPTION
    policy throws on duplicates at runtime — ADVICE r2). O(n²) per row
    via nested higher-order functions, fine for the small intra-row
    maps (labels, kv pairs) this guards."""
    return F.filter(
        entries,
        lambda e, i: F.size(
            F.filter(
                entries, lambda e2, j: (j > i) & (e2["key"] == e["key"])
            )
        )
        == 0,
    )

PROCESSOR_REGISTRY: dict[str, type] = {}


def register(name: str) -> Callable[[type], type]:
    """Register a processor class under its reference plugin name."""

    def deco(cls: type) -> type:
        PROCESSOR_REGISTRY[name] = cls
        cls.plugin_name = name
        return cls

    return deco


def build_processor(name: str, **config) -> "Processor":
    try:
        cls = PROCESSOR_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown processor {name!r}; known: {sorted(PROCESSOR_REGISTRY)}"
        ) from None
    return cls(**config)


class Processor:
    """Base: a configured, reusable DataFrame transform."""

    plugin_name = "processor_base"

    def __call__(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    # Convenience so processors chain with DataFrame.transform
    def transform(self, df: DataFrame) -> DataFrame:
        return self(df)


class ParserOptions:
    """CommonParserOptions equivalent, shared by all parsers."""

    def __init__(
        self,
        SourceKey: str,
        KeepingSourceWhenParseFail: bool = False,
        KeepingSourceWhenParseSucceed: bool = False,
        RenamedSourceKey: str | None = None,
        CopingRawLog: bool = False,
        ErrorClassKey: str | None = None,
        ErrorClass: str = "parse_fail",
    ) -> None:
        self.source_key = SourceKey
        self.keep_fail = KeepingSourceWhenParseFail
        self.keep_succeed = KeepingSourceWhenParseSucceed
        self.renamed_source_key = RenamedSourceKey or SourceKey
        self.coping_raw_log = CopingRawLog
        self.error_class_key = ErrorClassKey
        self.error_class = ErrorClass

    def finalize(self, df: DataFrame, ok: Column, new_keys: list[str]) -> DataFrame:
        """Apply the keep/drop/rename matrix given a parse-success column.

        ``df`` must still contain the source column; ``new_keys`` are the
        columns the parser just added (nulled on failed rows here).
        """
        src = F.col(self.source_key)

        # Materialize the success predicate FIRST: `ok` is a lazy column
        # expression over the source column, which this method may later
        # overwrite (keep-source rules) — evaluating it afterwards would
        # read the mutated column.
        df = df.withColumn("__lc_ok__", ok)
        ok = F.col("__lc_ok__")

        # Null out parsed fields on failed rows (parser may have emitted
        # partial garbage); cheap — stays in codegen.
        for k in new_keys:
            if k != self.source_key:
                df = df.withColumn(k, F.when(ok, F.col(k)))

        if self.error_class_key is not None:
            # Engine extension: tag instead of drop.
            df = df.withColumn(
                self.error_class_key,
                F.when(ok, F.lit("")).otherwise(F.lit(self.error_class)),
            )

        keep_source = (ok & F.lit(self.keep_succeed)) | (~ok & F.lit(self.keep_fail))
        if self.coping_raw_log and self.keep_fail:
            df = df.withColumn(
                LEGACY_RAW_LOG_KEY, F.when(~ok, src)
            )

        renamed = self.renamed_source_key
        if renamed != self.source_key:
            df = df.withColumn(renamed, F.when(keep_source, src)).drop(self.source_key)
        else:
            df = df.withColumn(renamed, F.when(keep_source, src))

        if not self.keep_fail and self.error_class_key is None:
            # ShouldEraseEvent: failed rows with discarded source vanish.
            df = df.filter(ok)
        return df.drop("__lc_ok__")


class Pipeline(Processor):
    """A chain of processors applied in order (the reference's processor
    line — CollectionPipeline::Process runs plugins sequentially,
    core/collection_pipeline/CollectionPipeline.cpp:419-451). Catalyst
    fuses the chain; this class is just composition."""

    def __init__(self, processors: list[Processor]):
        self.processors = list(processors)

    def __call__(self, df: DataFrame) -> DataFrame:
        for p in self.processors:
            df = p(df)
        return df


def compile_pipeline(config: list[dict]) -> Pipeline:
    """Compile a reference-shaped processor config list.

    Each element: ``{"Type": "processor_parse_regex_native", ...params}`` —
    the exact shape of the reference's YAML ``processors:`` section.
    """
    procs = []
    for entry in config:
        entry = dict(entry)
        name = entry.pop("Type")
        procs.append(build_processor(name, **entry))
    return Pipeline(procs)
