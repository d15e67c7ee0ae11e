"""Conversion / reshaping processors (SURVEY.md §2.1/§2.3 remainder).

* processor_json        — depth-limited JSON expansion with key prefixing
                          (plugins/processor/json/processor_json.go:30-43)
* processor_csv         — CSV decode with ExpandOthers/PreserveOthers
                          (plugins/processor/csv/processor_csv.go:31-44)
* processor_anchor      — substring between Start/Stop anchors + optional
                          JSON expansion (plugins/processor/anchor/anchor.go:46-71)
* processor_gotime / processor_strptime — time reformat/parse
                          (plugins/processor/gotime/processor_gotime.go:35-42,
                           plugins/processor/strptime/strptime.go:60-73)
* processor_droplastkey — drop DropKey iff all Include keys present
                          (plugins/processor/droplastkey/processor_drop_last_key.go:26-34)
* processor_log_to_sls_metric — log rows → metric rows (name, labels,
                          value, time) (plugins/processor/logtoslsmetric/
                          processor_log_to_sls_metric.go:32-43)
* processor_encrypt     — AES field encryption via Spark's aes_encrypt
                          (plugins/processor/encrypt)
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from loongcollector_spark.operators.base import Processor, register


@register("processor_json")
class JsonExpand(Processor):
    """Recursive JSON expansion with depth limit, connector-joined key
    paths and optional source-key prefixing. Dynamic keys → one
    ``map<string,string>`` output column built in an Arrow-batch UDF
    (dynamic key sets can't be typed columns without a schema).

    Semantics (processor_json.go): ``ExpandDepth`` 0 = unlimited; nested
    keys joined with ``ExpandConnector``; ``UseSourceKeyAsPrefix``
    prepends the source key; ``ExpandArray`` expands arrays with numeric
    path components, else arrays stay serialized JSON.
    """

    def __init__(
        self,
        SourceKey: str,
        ExpandDepth: int = 0,
        ExpandConnector: str = "_",
        Prefix: str = "",
        UseSourceKeyAsPrefix: bool = False,
        ExpandArray: bool = False,
        DestKey: str = "expanded",
        KeepSource: bool = True,
    ) -> None:
        self.source_key = SourceKey
        self.depth = ExpandDepth
        self.conn = ExpandConnector
        self.prefix = Prefix
        self.use_source_prefix = UseSourceKeyAsPrefix
        self.expand_array = ExpandArray
        self.dest = DestKey
        self.keep_source = KeepSource

    def __call__(self, df: DataFrame) -> DataFrame:
        depth, conn = self.depth, self.conn
        prefix = self.prefix + (
            (self.source_key + conn) if self.use_source_prefix else ""
        )
        expand_array = self.expand_array

        @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
        def expand(s):
            import pandas as pd

            def flatten(obj, path, d, out):
                too_deep = depth > 0 and d > depth
                if isinstance(obj, dict) and not too_deep:
                    for k, v in obj.items():
                        flatten(v, path + [str(k)], d + 1, out)
                elif isinstance(obj, list) and expand_array and not too_deep:
                    for i, v in enumerate(obj):
                        flatten(v, path + [str(i)], d + 1, out)
                else:
                    key = prefix + conn.join(path)
                    if isinstance(obj, (dict, list)):
                        out[key] = json.dumps(obj, separators=(",", ":"))
                    elif isinstance(obj, bool):
                        out[key] = "true" if obj else "false"
                    elif obj is None:
                        out[key] = ""
                    else:
                        out[key] = str(obj)

            res = []
            for v in s:
                try:
                    obj = json.loads(v) if v is not None else None
                except (ValueError, TypeError):
                    obj = None
                if not isinstance(obj, (dict, list)):
                    res.append(None)
                    continue
                out: dict[str, str] = {}
                flatten(obj, [], 1, out)
                res.append(out)
            return pd.Series(res)

        out = df.withColumn(self.dest, expand(F.col(self.source_key)))
        if not self.keep_source:
            out = out.drop(self.source_key)
        return out


@register("processor_csv")
class CsvParse(Processor):
    """CSV decode of one field (processor_csv.go:31-44). ``SplitKeys``
    name the leading fields; extras go to ``_decode_preserve_`` joined
    (PreserveOthers) or to ``{ExpandKeyPrefix}{i}`` columns
    (ExpandOthers). Quote-aware via from_csv when no expansion is
    needed, else split-based."""

    def __init__(
        self,
        SourceKey: str,
        SplitKeys: list[str],
        SplitSep: str = ",",
        TrimLeadingSpace: bool = False,
        PreserveOthers: bool = False,
        ExpandOthers: bool = False,
        ExpandKeyPrefix: str = "expand_",
        ExpandMax: int = 8,
        KeepSource: bool = True,
    ) -> None:
        self.source_key = SourceKey
        self.keys = SplitKeys
        self.sep = SplitSep
        self.trim = TrimLeadingSpace
        self.preserve = PreserveOthers
        self.expand = ExpandOthers
        self.expand_prefix = ExpandKeyPrefix
        self.expand_max = ExpandMax
        self.keep_source = KeepSource

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        schema = ", ".join(f"`{k}` string" for k in self.keys)
        nk = len(self.keys)
        if not (self.preserve or self.expand):
            parsed = F.from_csv(src, F.lit(schema), {"sep": self.sep,
                                "ignoreLeadingWhiteSpace": str(self.trim).lower()})
            for k in self.keys:
                df = df.withColumn(k, parsed[k])
        else:
            arr = F.split(src, re.escape(self.sep), -1)
            if self.trim:
                arr = F.transform(arr, lambda x: F.ltrim(x))
            for i, k in enumerate(self.keys):
                df = df.withColumn(k, F.try_element_at(arr, F.lit(i + 1)))
            if self.expand:
                for j in range(self.expand_max):
                    df = df.withColumn(
                        f"{self.expand_prefix}{j + 1}",
                        F.when(F.size(arr) > nk + j,
                               F.try_element_at(arr, F.lit(nk + j + 1))),
                    )
            elif self.preserve:
                df = df.withColumn(
                    "_decode_preserve_",
                    F.when(
                        F.size(arr) > nk,
                        F.array_join(F.slice(arr, nk + 1, 1_000_000), self.sep),
                    ),
                )
        if not self.keep_source:
            df = df.drop(self.source_key)
        return df


@register("processor_anchor")
class Anchor(Processor):
    """Substring extraction between Start/Stop literal anchors per field
    spec (anchor.go:46-71). Each anchor: {Start, Stop, FieldName,
    FieldType ('string'|'json')}; json fields get depth-1 expansion into
    ``{FieldName}_{key}`` map entries."""

    def __init__(self, SourceKey: str, Anchors: list[dict], KeepSource: bool = True):
        self.source_key = SourceKey
        self.anchors = Anchors
        self.keep_source = KeepSource

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        for a in self.anchors:
            start, stop = a["Start"], a["Stop"]
            name = a["FieldName"]
            if start:
                pos = F.instr(src, start)
                after = F.when(
                    pos > 0,
                    F.substring(src, pos + F.lit(len(start)), F.length(src)),
                )
            else:
                after = src
            val = F.substring_index(after, stop, 1) if stop else after
            if a.get("FieldType") == "json":
                df = df.withColumn(
                    name, F.from_json(val, T.MapType(T.StringType(), T.StringType()))
                )
            else:
                df = df.withColumn(name, val)
        if not self.keep_source:
            df = df.drop(self.source_key)
        return df


_GO_TIME_MAP = [
    ("2006", "yyyy"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("04", "mm"),
    ("05", "ss"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
]


@register("processor_gotime")
class GoTime(Processor):
    """Parse a field with a Go reference-time layout and reformat
    (processor_gotime.go:35-42). Layout translated driver-side."""

    def __init__(
        self,
        SourceKey: str,
        SourceFormat: str,
        DestKey: str,
        DestFormat: str,
        SourceLocation: str = "UTC",
    ) -> None:
        self.source_key = SourceKey
        self.src_fmt = self._go_to_spark(SourceFormat)
        self.dest_key = DestKey
        self.dest_fmt = self._go_to_spark(DestFormat)
        self.tz = SourceLocation

    @staticmethod
    def _go_to_spark(layout: str) -> str:
        out = layout
        for a, b in _GO_TIME_MAP:
            out = out.replace(a, b)
        return out

    def __call__(self, df: DataFrame) -> DataFrame:
        ts = F.try_to_timestamp(F.col(self.source_key), F.lit(self.src_fmt))
        return df.withColumn(self.dest_key, F.date_format(ts, self.dest_fmt))


@register("processor_strptime")
class Strptime(Processor):
    """strptime a field into the event time (strptime.go:60-73);
    delegates to the same directive translation as
    processor_parse_timestamp_native."""

    def __init__(self, SourceKey: str, Format: str, DestKey: str = "ts",
                 AdjustUTCOffset: int = 0):
        from loongcollector_spark.operators.parsers import ParseTimestampNative

        self.inner = ParseTimestampNative(
            SourceKey=SourceKey, SourceFormat=Format, DestKey=DestKey
        )
        self.offset = AdjustUTCOffset

    def __call__(self, df: DataFrame) -> DataFrame:
        out = self.inner(df)
        if self.offset:
            out = out.withColumn(
                self.inner.dest,
                F.col(self.inner.dest) + F.expr(f"INTERVAL {self.offset} SECOND"),
            )
        return out


@register("processor_droplastkey")
class DropLastKey(Processor):
    """Drop ``DropKey`` iff all ``Include`` keys are present (non-null)
    (processor_drop_last_key.go:26-34)."""

    def __init__(self, DropKey: str, Include: list[str]):
        self.drop_key = DropKey
        self.include = Include

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.drop_key not in df.columns:
            return df
        if not all(k in df.columns for k in self.include):
            return df
        cond = F.lit(True)
        for k in self.include:
            cond = cond & F.col(k).isNotNull()
        return df.withColumn(
            self.drop_key, F.when(~cond, F.col(self.drop_key))
        )


@register("processor_log_to_sls_metric")
class LogToMetric(Processor):
    """Convert log rows to metric rows: labels from ``MetricLabelKeys``,
    one output row per (name, value) pair in ``MetricValues``
    (processor_log_to_sls_metric.go:32-43). Reshaping = select + explode;
    output schema (metric_name, labels map, value double, ts)."""

    def __init__(
        self,
        MetricLabelKeys: list[str],
        MetricValues: dict[str, str],  # name_source_col -> value_source_col
        TimeKey: str = "ts",
    ) -> None:
        self.label_keys = MetricLabelKeys
        self.metric_values = MetricValues
        self.time_key = TimeKey

    def __call__(self, df: DataFrame) -> DataFrame:
        labels = F.map_from_arrays(
            F.array(*[F.lit(k) for k in self.label_keys]),
            F.array(*[F.col(k).cast("string") for k in self.label_keys]),
        )
        pairs = F.array(
            *[
                F.struct(
                    F.col(nk).cast("string").alias("metric_name"),
                    F.col(vk).cast("double").alias("value"),
                )
                for nk, vk in self.metric_values.items()
            ]
        )
        return (
            df.withColumn("labels", labels)
            .select(
                F.col(self.time_key).alias("ts"),
                "labels",
                F.explode(pairs).alias("m"),
            )
            .select("m.metric_name", "labels", "m.value", "ts")
            .filter(F.col("value").isNotNull())
        )


@register("processor_otel_log")
class OtelLogReshape(Processor):
    """Reshape rows into the OTel LogRecord shape
    (plugins/processor/otel/ — severity/body/attributes/timeUnixNano).
    Pure schema reshaping: struct + map construction, no UDF."""

    def __init__(
        self,
        BodyKey: str = "text",
        TimeKey: str = "ts",
        SeverityKey: str | None = "level",
        AttributeKeys: list[str] | None = None,
    ) -> None:
        self.body_key = BodyKey
        self.time_key = TimeKey
        self.severity_key = SeverityKey
        self.attribute_keys = AttributeKeys or []

    def __call__(self, df: DataFrame) -> DataFrame:
        sev = (
            F.coalesce(F.col(self.severity_key), F.lit("INFO"))
            if self.severity_key and self.severity_key in df.columns
            else F.lit("INFO")
        )
        attrs = F.map_from_arrays(
            F.array(*[F.lit(k) for k in self.attribute_keys]),
            F.array(*[F.col(k).cast("string") for k in self.attribute_keys]),
        )
        return df.select(
            (F.unix_timestamp(F.col(self.time_key)).cast("long") * F.lit(1_000_000_000)
             ).alias("timeUnixNano"),
            sev.alias("severityText"),
            F.col(self.body_key).alias("body"),
            attrs.alias("attributes"),
        )


@register("processor_encrypt")
class Encrypt(Processor):
    """AES-CBC field encryption (plugins/processor/encrypt) via Spark's
    built-in aes_encrypt (3.3+)."""

    def __init__(self, SourceKeys: list[str], EncryptionKey: str, IV: str | None = None):
        if len(EncryptionKey) not in (16, 24, 32):
            raise ValueError("EncryptionKey must be 16/24/32 bytes")
        self.source_keys = SourceKeys
        self.key = EncryptionKey
        self.iv = IV

    def __call__(self, df: DataFrame) -> DataFrame:
        for k in self.source_keys:
            args = [F.col(k).cast("binary"), F.lit(self.key).cast("binary"),
                    F.lit("CBC"), F.lit("PKCS")]
            if self.iv:
                args.append(F.lit(self.iv).cast("binary"))
            df = df.withColumn(k, F.base64(F.aes_encrypt(*args)))
        return df
