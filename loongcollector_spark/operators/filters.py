"""Filter / predicate processors (SURVEY.md §2.2).

All compile to a single Catalyst ``Filter`` node — predicate pushdown and
partition pruning come for free (the reference has no optimizer; its
filters run row-at-a-time — core/plugin/processor/ProcessorFilterNative.cpp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from loongcollector_spark.operators.base import Processor, register


def _full_match(key: str, regex: str) -> Column:
    """The reference filter uses full-match regex semantics
    (BoostRegexMatch in ProcessorFilterNative.cpp) → anchor."""
    return F.col(key).rlike(f"^(?:{regex})$")


def compile_condition_exp(node: dict) -> Column:
    """Compile the reference's ConditionExp boolean expression tree
    (core/plugin/processor/ProcessorFilterNative.h:28-103, .cpp:33-126).

    Shape::

        {"operator": "and"|"or"|"not", "operands": [...]}        # branch
        {"key": "<field>", "exp": "<regex>"}                      # leaf

    Leaves are full-match regexes on a field value.
    """
    if "operator" in node:
        op = node["operator"].lower()
        operands = [compile_condition_exp(c) for c in node["operands"]]
        if op == "and":
            out = operands[0]
            for c in operands[1:]:
                out = out & c
            return out
        if op == "or":
            out = operands[0]
            for c in operands[1:]:
                out = out | c
            return out
        if op == "not":
            return ~operands[0]
        raise ValueError(f"unknown operator {op!r}")
    return _full_match(node["key"], node["exp"])


@register("processor_filter_native")
class FilterNative(Processor):
    """Keep an event iff the expression matches. Two modes (reference
    ProcessorFilterNative.h:111-113): ``Include`` = AND of per-key
    full-match regexes; ``ConditionExp`` = boolean tree of regex leaves."""

    def __init__(
        self,
        Include: dict[str, str] | None = None,
        ConditionExp: dict | None = None,
        DiscardingNonUTF8: bool = False,
    ) -> None:
        if (Include is None) == (ConditionExp is None):
            raise ValueError("exactly one of Include / ConditionExp required")
        self.include = Include
        self.condition = ConditionExp
        self.discard_non_utf8 = DiscardingNonUTF8

    def predicate(self) -> Column:
        if self.include is not None:
            cond = F.lit(True)
            for k, rx in self.include.items():
                cond = cond & _full_match(k, rx)
            return cond
        return compile_condition_exp(self.condition)

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df.filter(self.predicate())
        if self.discard_non_utf8:
            # Spark strings are decoded; undecodable input bytes surface
            # as U+FFFD replacement chars — the practical invalid-UTF8 tell
            # (reference: mDiscardingNonUTF8, ProcessorFilterNative.h:111).
            for node in self._condition_keys():
                out = out.filter(~F.col(node).contains("�"))
        return out

    def _condition_keys(self) -> list[str]:
        if self.include is not None:
            return list(self.include)

        def walk(n):
            if "operator" in n:
                return [k for c in n["operands"] for k in walk(c)]
            return [n["key"]]

        return sorted(set(walk(self.condition)))


@register("processor_filter_regex")
class FilterRegex(Processor):
    """Go variant: ``Include`` all-must-match AND NOT ``Exclude`` any-match
    (plugins/processor/filter/regex/processor_filter_regex.go:77-110).
    Go ``reg.MatchString`` is an UNANCHORED search (unlike the native
    filter's BoostRegexMatch full match); a missing/NULL Include key
    fails the include count, a missing Exclude key excludes nothing."""

    def __init__(
        self,
        Include: dict[str, str] | None = None,
        Exclude: dict[str, str] | None = None,
    ) -> None:
        self.include = Include or {}
        self.exclude = Exclude or {}

    def __call__(self, df: DataFrame) -> DataFrame:
        cond = F.lit(True)
        for k, rx in self.include.items():
            cond = cond & F.coalesce(F.col(k).rlike(rx), F.lit(False))
        for k, rx in self.exclude.items():
            cond = cond & ~F.coalesce(F.col(k).rlike(rx), F.lit(False))
        return df.filter(cond)


@register("processor_timestamp_filter_native")
class TimestampFilterNative(Processor):
    """Drop events outside a time range
    (core/plugin/processor/ProcessorTimestampFilterNative.cpp). Expressed
    as a plain range filter so Iceberg/parquet partition pruning applies."""

    def __init__(
        self,
        TimeKey: str = "ts",
        Start: str | None = None,
        End: str | None = None,
    ) -> None:
        self.time_key = TimeKey
        self.start = Start
        self.end = End

    def __call__(self, df: DataFrame) -> DataFrame:
        c = F.col(self.time_key)
        if self.start is not None:
            df = df.filter(c >= F.lit(self.start).cast("timestamp"))
        if self.end is not None:
            df = df.filter(c < F.lit(self.end).cast("timestamp"))
        return df


@register("processor_drop")
class Drop(Processor):
    """Drop fields by exact key (plugins/processor/drop/processor_drop.go:24-29)."""

    def __init__(self, DropKeys: list[str]):
        self.drop_keys = DropKeys

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.drop_keys)


@register("processor_pick_key")
class PickKey(Processor):
    """Project: Include whitelist / Exclude blacklist of columns
    (plugins/processor/pickkey/processor_pick_key.go:26-37). Column
    pruning then reaches the scan for free."""

    def __init__(
        self, Include: list[str] | None = None, Exclude: list[str] | None = None
    ) -> None:
        self.include = Include
        self.exclude = Exclude

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.include:
            keep = [c for c in df.columns if c in set(self.include)]
            return df.select(*keep)
        if self.exclude:
            return df.drop(*self.exclude)
        return df


@register("processor_filter_key_regex")
class FilterKeyRegex(Processor):
    """Drop whole EVENTS by key-name regexes — "if key is unmatched,
    drop this log" (plugins/processor/filter/keyregex/
    processor_filter_key_regex.go:69-97): a row survives iff every
    ``Include`` regex matches the NAME of at least one present field,
    and no present field's name matches any ``Exclude`` regex. In the
    wide-column model "present" = non-NULL; name matching is plan-time
    (Go ``MatchString`` = unanchored search), presence is a runtime null
    check. Column PROJECTION by key name is ``processor_pick_key``, not
    this plugin."""

    def __init__(
        self,
        Include: list[str] | None = None,
        Exclude: list[str] | None = None,
    ) -> None:
        import re as _re

        self.include = [_re.compile(p) for p in (Include or [])]
        self.exclude = [_re.compile(p) for p in (Exclude or [])]

    def __call__(self, df: DataFrame) -> DataFrame:
        cond = F.lit(True)
        for rx in self.include:
            cols = [c for c in df.columns if rx.search(c)]
            if not cols:
                return df.filter(F.lit(False))  # include key never present
            present = F.lit(False)
            for c in cols:
                present = present | F.col(c).isNotNull()
            cond = cond & present
        for rx in self.exclude:
            for c in df.columns:
                if rx.search(c):
                    cond = cond & F.col(c).isNull()
        return df.filter(cond)


@register("processor_rate_limit")
class RateLimit(Processor):
    """Token-bucket rate limit per distinct ``Fields`` combination
    (plugins/processor/ratelimit/processor_rate_limit.go:26-33).

    Batch analogue: at most ``Limit`` rows per (fields, time-bucket),
    deterministic by ``OrderBy`` — a windowed ``row_number() <= limit``.
    At scale the window shuffles once on (fields, bucket); hot keys are
    bounded because output per key is capped at Limit.
    """

    def __init__(
        self,
        Fields: list[str],
        Limit: int,
        BucketSeconds: int = 60,
        TimeKey: str = "ts",
        OrderBy: list[str] | None = None,
    ) -> None:
        self.fields = Fields
        self.limit = Limit
        self.bucket_seconds = BucketSeconds
        self.time_key = TimeKey
        self.order_by = OrderBy or [TimeKey]

    def __call__(self, df: DataFrame) -> DataFrame:
        # date_trunc for whole-minute/hour buckets: timezone-safe on NTZ
        # timestamps (unix_timestamp would shift buckets under a non-UTC
        # session timezone).
        if self.bucket_seconds == 3600:
            bucket = F.date_trunc("hour", F.col(self.time_key)).alias("__bucket__")
        elif self.bucket_seconds == 60:
            bucket = F.date_trunc("minute", F.col(self.time_key)).alias("__bucket__")
        else:
            bucket = (
                F.floor(F.unix_timestamp(F.col(self.time_key)) / self.bucket_seconds)
            ).alias("__bucket__")
        w = Window.partitionBy(*self.fields, bucket).orderBy(
            *[F.col(c) for c in self.order_by]
        )
        return (
            df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= self.limit)
            .drop("__rn__")
        )
