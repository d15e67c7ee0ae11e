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
    spec (anchor.go:46-71, ProcessAnchor :157-215). Each anchor:
    {Start, Stop, FieldName, FieldType ('string'|'json'), ExpondJSON,
    ExpondConnecter (default '_'), MaxExpondDepth (0 → 100),
    IgnoreJSONError — accepted for config parity; in the reference it
    only gates the alarm log, the field is absent either way}.
    Reference parity notes:

    * a missing Start OR a missing non-empty Stop skips the anchor
      entirely (go:160-175) → NULL here, never the tail-to-EOL
    * json fields expand into a ``map<string,string>`` keyed
      ``FieldName<conn>path`` — nested objects recurse when ExpondJSON
      (depth capped at MaxExpondDepth, go:131-155 ExpondJSONCallBack),
      else depth-1 with raw JSON values; strings are unescaped, other
      scalars keep their raw JSON text (the jsonparser behavior)
    """

    def __init__(self, SourceKey: str, Anchors: list[dict], KeepSource: bool = True):
        self.source_key = SourceKey
        self.anchors = Anchors
        self.keep_source = KeepSource

    @staticmethod
    def _expand_json(name: str, conn: str, deep: bool, max_depth: int):
        @F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
        def expand(s):
            import pandas as pd

            def raw(v):
                if isinstance(v, str):
                    return v
                if isinstance(v, bool):
                    return "true" if v else "false"
                if v is None:
                    return "null"
                if isinstance(v, (dict, list)):
                    return json.dumps(v, separators=(",", ":"))
                return json.dumps(v)

            def walk(obj, pre, d, out):
                for k, v in obj.items():
                    key = pre + conn + str(k)
                    # go:141 — at max depth or non-object: emit leaf
                    if deep and isinstance(v, dict) and d + 1 != max_depth:
                        walk(v, key, d + 1, out)
                    else:
                        out[key] = raw(v)

            res = []
            for v in s:
                if v is None:
                    res.append(None)
                    continue
                try:
                    obj = json.loads(v)
                    if not isinstance(obj, dict):
                        raise ValueError("not an object")
                except Exception:  # noqa: BLE001 — IgnoreJSONError path
                    res.append(None)
                    continue
                out: dict[str, str] = {}
                if deep:
                    walk(obj, name, 0, out)
                else:
                    for k, v2 in obj.items():
                        out[name + conn + str(k)] = raw(v2)
                res.append(out)
            return pd.Series(res)

        return expand

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
            if stop:
                # a non-empty Stop that never occurs skips the anchor
                val = F.when(
                    F.instr(after, stop) > 0, F.substring_index(after, stop, 1)
                )
            else:
                val = after
            if a.get("FieldType") == "json":
                conn = a.get("ExpondConnecter") or "_"
                max_depth = a.get("MaxExpondDepth", 0)
                deep = a.get("ExpondJSON", False) and max_depth != 1
                if max_depth == 0:
                    max_depth = 100
                df = df.withColumn(
                    name, self._expand_json(name, conn, deep, max_depth)(val)
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
    (processor_gotime.go:29-32, :84-103, :119-168). Layout translated
    driver-side. Fixed patterns ``seconds`` / ``milliseconds`` /
    ``microseconds`` / ``nanoseconds`` parse integer epochs (go:84-103).
    ``SourceLocation`` / ``DestLocation`` are UTC hour offsets (int, the
    reference's FixedZone model) applied as wall-time shifts — values are
    NTZ wall-times here, so parse at source offset, format at dest.
    ``KeepSource=False`` drops the source column (go:149-151)."""

    _FIXED = {
        "seconds": 1,
        "milliseconds": 1_000,
        "microseconds": 1_000_000,
        "nanoseconds": 1_000_000_000,
    }

    def __init__(
        self,
        SourceKey: str,
        SourceFormat: str,
        DestKey: str,
        DestFormat: str,
        SourceLocation: int | str = 0,
        DestLocation: int | str = 0,
        KeepSource: bool = True,
    ) -> None:
        self.source_key = SourceKey
        self.fixed_div = self._FIXED.get(SourceFormat)
        self.src_fmt = self._go_to_spark(SourceFormat)
        self.dest_key = DestKey
        self.dest_fmt = self._go_to_spark(DestFormat)
        # legacy string form ('UTC') means offset 0
        self.src_off = SourceLocation if isinstance(SourceLocation, int) else 0
        self.dest_off = DestLocation if isinstance(DestLocation, int) else 0
        self.keep_source = KeepSource

    @staticmethod
    def _go_to_spark(layout: str) -> str:
        out = layout
        for a, b in _GO_TIME_MAP:
            out = out.replace(a, b)
        return out

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        if self.fixed_div is not None:
            # integer epoch: timezone-independent instant; render at the
            # dest offset (epoch → UTC wall + dest hours)
            epoch = src.try_cast("long")
            ts = F.timestamp_seconds(
                (epoch / self.fixed_div).cast("double")
            ) + F.expr(f"INTERVAL {self.dest_off} HOURS")
        else:
            ts = F.try_to_timestamp(src, F.lit(self.src_fmt)) + F.expr(
                f"INTERVAL {self.dest_off - self.src_off} HOURS"
            )
        out = df.withColumn(self.dest_key, F.date_format(ts, self.dest_fmt))
        if not self.keep_source and self.source_key != self.dest_key:
            out = out.drop(self.source_key)
        return out


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
    """Drop ``DropKey`` iff ANY ``Include`` key is present — the
    reference sets dropFlag on the FIRST Include hit
    (processor_drop_last_key.go:63-73), i.e. OR, not AND."""

    def __init__(self, DropKey: str, Include: list[str]):
        if not Include:
            raise ValueError("Invalid config, Include is empty")
        self.drop_key = DropKey
        self.include = Include

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.drop_key not in df.columns:
            return df
        present = [k for k in self.include if k in df.columns]
        if not present:
            return df
        cond = F.lit(False)
        for k in present:
            cond = cond | F.col(k).isNotNull()
        return df.withColumn(
            self.drop_key, F.when(~cond, F.col(self.drop_key))
        )


@register("processor_log_to_sls_metric")
class LogToMetric(Processor):
    """Convert log rows to metric rows: labels from ``MetricLabelKeys``
    (+ constant ``CustomMetricLabels``), one output row per (name, value)
    pair in ``MetricValues`` (processor_log_to_sls_metric.go:32-43).
    Validation mirrors ProcessLogs (go:172-260) — the whole event is
    dropped when any metric name fails ``^[a-zA-Z_:][a-zA-Z0-9_:]*$``,
    any value is not float-parsable, or any label value contains the
    SLS separators ``|`` / ``#$#``. Reshaping = select + explode;
    output schema (metric_name, labels map, value double, ts)."""

    _NAME_RX = r"^[a-zA-Z_:][a-zA-Z0-9_:]*$"

    def __init__(
        self,
        MetricLabelKeys: list[str],
        MetricValues: dict[str, str],  # name_source_col -> value_source_col
        TimeKey: str = "ts",
        CustomMetricLabels: dict[str, str] | None = None,
    ) -> None:
        self.label_keys = MetricLabelKeys
        self.metric_values = MetricValues
        self.time_key = TimeKey
        self.custom_labels = CustomMetricLabels or {}

    def __call__(self, df: DataFrame) -> DataFrame:
        ok = F.lit(True)
        for nk, vk in self.metric_values.items():
            ok = ok & F.col(nk).cast("string").rlike(self._NAME_RX)
            ok = ok & F.col(vk).cast("string").try_cast("double").isNotNull()
        for lk in self.label_keys:
            lv = F.col(lk).cast("string")
            ok = ok & lv.isNotNull() & ~lv.contains("|") & ~lv.contains("#$#")
        keys = list(self.label_keys) + list(self.custom_labels)
        vals = [F.col(k).cast("string") for k in self.label_keys] + [
            F.lit(v) for v in self.custom_labels.values()
        ]
        labels = F.map_from_arrays(
            F.array(*[F.lit(k) for k in keys]), F.array(*vals)
        )
        pairs = F.array(
            *[
                F.struct(
                    F.col(nk).cast("string").alias("metric_name"),
                    F.col(vk).cast("string").try_cast("double").alias("value"),
                )
                for nk, vk in self.metric_values.items()
            ]
        )
        return (
            df.filter(ok)
            .withColumn("labels", labels)
            .select(
                F.col(self.time_key).alias("ts"),
                "labels",
                F.explode(pairs).alias("m"),
            )
            .select("m.metric_name", "labels", "m.value", "ts")
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
    """AES-CBC field encryption (plugins/processor/encrypt/
    processor_encrypt.go:95-144) via Spark's built-in aes_encrypt.
    Reference semantics: ``Key``/``IV`` config strings are HEX (go:175,
    :185-196; IV default = 16 zero bytes), output is lowercase hex
    (go:113); with an explicit IV the ciphertext is NOT IV-prefixed
    (go:126-143) — Spark always prepends the IV, so it is stripped;
    an EMPTY IV selects random-IV mode where the IV IS prepended.
    Raw (non-hex) 16/24/32-char keys are accepted as an engine
    convenience."""

    def __init__(self, SourceKeys: list[str], EncryptionKey: str,
                 IV: str | None = "0" * 32):
        self.source_keys = SourceKeys
        self.key = self._decode(EncryptionKey, "EncryptionKey")
        # None/'' → random-IV mode (prepended), like the Go empty IV
        self.iv = self._decode(IV, "IV") if IV else None

    @staticmethod
    def _decode(s: str, what: str) -> bytes:
        """Hex first (the reference's format, go:175); when the hex
        decode yields an invalid length but the RAW bytes are valid
        (e.g. a 16-char passphrase that happens to be hex chars), fall
        back to raw — so pre-hex configs keep working."""
        want = (16, 24, 32) if what == "EncryptionKey" else (16,)
        candidates = []
        try:
            candidates.append(bytes.fromhex(s))
        except ValueError:
            pass
        candidates.append(s.encode())
        for b in candidates:
            if len(b) in want:
                return b
        raise ValueError(
            f"{what} must be "
            + ("16/24/32" if what == "EncryptionKey" else "16")
            + " bytes (hex-encoded or raw)"
        )

    def __call__(self, df: DataFrame) -> DataFrame:
        for k in self.source_keys:
            if self.iv is not None:
                full = F.aes_encrypt(
                    F.col(k).cast("binary"), F.lit(self.key),
                    F.lit("CBC"), F.lit("PKCS"), F.lit(self.iv),
                )
                # strip Spark's prepended IV: Go emits ciphertext only
                ct = F.substring(full, F.lit(17), F.length(full))
            else:
                ct = F.aes_encrypt(
                    F.col(k).cast("binary"), F.lit(self.key),
                    F.lit("CBC"), F.lit("PKCS"),
                )
            df = df.withColumn(k, F.lower(F.hex(ct)))
        return df


# ---------------------------------------------------------------------------
# OTel metric / trace reshapes (plugins/processor/otel/processor_otel_metric.go,
# processor_otel_trace.go; converters pkg/protocol/decoder/opentelemetry/
# otlpDataToSLSProto.go:49-229, otlp_trace_parser.go:19-170,218-283).
# ---------------------------------------------------------------------------

_OTLP_ANYVALUE = T.StructType(
    [
        T.StructField("stringValue", T.StringType()),
        T.StructField("boolValue", T.BooleanType()),
        T.StructField("intValue", T.StringType()),
        T.StructField("doubleValue", T.DoubleType()),
    ]
)
_OTLP_KVS = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", _OTLP_ANYVALUE),
        ]
    )
)


def _otlp_attr_string(v):
    """pcommon.Value.AsString over the scalar AnyValue subset."""
    return F.coalesce(
        v["stringValue"],
        v["intValue"],
        F.when(
            v["doubleValue"].isNotNull(),
            _g_format(v["doubleValue"]),
        ),
        v["boolValue"].cast("string"),
        F.lit(""),
    )


def _g_format(d):
    """Approximate Go strconv.FormatFloat(x, 'g', -1, 64) for the common
    range: integral values print without a trailing '.0'."""
    as_long = d.cast("long")
    return F.when(
        (d == as_long.cast("double")) & (F.abs(d) < F.lit(1e15)),
        as_long.cast("string"),
    ).otherwise(d.cast("string"))


def _norm_attrs(attrs):
    """array<struct<key,AnyValue>> → array<struct<k,v>> of strings."""
    return F.transform(
        F.coalesce(attrs, F.array()),
        lambda a: F.struct(a["key"].alias("k"), _otlp_attr_string(a["value"]).alias("v")),
    )


def _kv(key: str, val) -> "F.Column":
    v = F.lit(val) if isinstance(val, str) else val
    return F.struct(F.lit(key).alias("k"), v.alias("v"))


def _labels_string(*kv_arrays):
    """MetricLabels.String(): sort by KEY (not by the joined 'k#$#v'
    string — for keys containing chars ordering before '#', e.g. 'a!'
    vs 'a', the two orders diverge; ADVICE r2), then join 'k#$#v' with
    '|' (pkg/helper/log_helper.go:209-228)."""
    allkv = F.concat(*kv_arrays) if len(kv_arrays) > 1 else kv_arrays[0]
    by_key = F.array_sort(
        allkv,
        lambda a, b: F.when(a["k"] < b["k"], -1)
        .when(a["k"] > b["k"], 1)
        .otherwise(F.when(a["v"] < b["v"], -1).when(a["v"] > b["v"], 1).otherwise(0)),
    )
    return F.array_join(
        F.transform(by_key, lambda e: F.concat(e["k"], F.lit("#$#"), e["v"])),
        "|",
    )


_AGG_TEMPORALITY = {
    "1": "Delta",
    "2": "Cumulative",
    "AGGREGATION_TEMPORALITY_DELTA": "Delta",
    "AGGREGATION_TEMPORALITY_CUMULATIVE": "Cumulative",
}


def _temporality_str(col):
    m = F.create_map(
        *[F.lit(x) for kvp in _AGG_TEMPORALITY.items() for x in kvp]
    )
    return F.coalesce(F.try_element_at(m, col), F.lit("Unspecified"))



def _json_str(s):
    """JSON string literal (with quotes) of a string column — to_json only
    serializes containers, so escape via a 1-element array and strip the
    brackets."""
    j = F.to_json(F.array(F.coalesce(s, F.lit(""))))
    return F.substring(j, 2, F.length(j) - 2)


@register("processor_otel_metric")
class OtelMetricReshape(Processor):
    """OTLP-JSON metrics payload → one row per datapoint in the SLS metric
    shape (``__name__``, ``__time_nano__``, ``__labels__``, ``__value__``),
    mirroring ConvertOtlpMetricV1 (otlpDataToSLSProto.go:344-430):

    * gauge / sum — one row per NumberDataPoint; sum adds
      ``otlp.metric.ismonotonic`` + ``otlp.metric.aggregation.temporality``
      labels (:140-160)
    * histogram — ``_sum``/``_min``/``_max`` (when present), ``_count``,
      and one ``_bucket`` row per bound with CUMULATIVE count and an
      ``le`` label, last bound ``+Inf`` (:185-229)
    * summary — ``_sum``/``_count`` + one row per quantile with a
      ``quantile`` label (:162-183)

    * exponential histogram — base 2^(2^-scale) bucket ranges as le
      labels, offsets and zeroCount as their own rows (:231-274)

    Not covered (documented):
    the protobuf/protojson binary input formats (this container has no
    OTLP proto libs — JSON only). ``__value__`` stays a typed double and
    ``__time_nano__`` a typed long rather than the reference's
    stringly-typed log contents.

    Pure from_json + nested higher-order functions — the payload is
    parsed once, every datapoint expansion is JVM-side.
    """

    _EXEMPLARS = T.ArrayType(
        T.StructType(
            [
                T.StructField("filteredAttributes", _OTLP_KVS),
                T.StructField("timeUnixNano", T.StringType()),
                T.StructField("asDouble", T.DoubleType()),
                T.StructField("asInt", T.StringType()),
                T.StructField("spanId", T.StringType()),
                T.StructField("traceId", T.StringType()),
            ]
        )
    )
    _DP_NUM = T.ArrayType(
        T.StructType(
            [
                T.StructField("attributes", _OTLP_KVS),
                T.StructField("timeUnixNano", T.StringType()),
                T.StructField("asDouble", T.DoubleType()),
                T.StructField("asInt", T.StringType()),
                T.StructField("exemplars", _EXEMPLARS),
            ]
        )
    )
    _SCHEMA = T.StructType(
        [
            T.StructField(
                "resourceMetrics",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "resource",
                                T.StructType([T.StructField("attributes", _OTLP_KVS)]),
                            ),
                            T.StructField(
                                "scopeMetrics",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "metrics",
                                                T.ArrayType(
                                                    T.StructType(
                                                        [
                                                            T.StructField("name", T.StringType()),
                                                            T.StructField(
                                                                "gauge",
                                                                T.StructType(
                                                                    [T.StructField("dataPoints", _DP_NUM)]
                                                                ),
                                                            ),
                                                            T.StructField(
                                                                "sum",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField("dataPoints", _DP_NUM),
                                                                        T.StructField(
                                                                            "isMonotonic", T.BooleanType()
                                                                        ),
                                                                        T.StructField(
                                                                            "aggregationTemporality",
                                                                            T.StringType(),
                                                                        ),
                                                                    ]
                                                                ),
                                                            ),
                                                            T.StructField(
                                                                "histogram",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "dataPoints",
                                                                            T.ArrayType(
                                                                                T.StructType(
                                                                                    [
                                                                                        T.StructField(
                                                                                            "attributes", _OTLP_KVS
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "timeUnixNano",
                                                                                            T.StringType(),
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "count", T.StringType()
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "sum", T.DoubleType()
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "min", T.DoubleType()
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "max", T.DoubleType()
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "bucketCounts",
                                                                                            T.ArrayType(T.StringType()),
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "explicitBounds",
                                                                                            T.ArrayType(T.DoubleType()),
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "exemplars", _EXEMPLARS
                                                                                        ),
                                                                                    ]
                                                                                )
                                                                            ),
                                                                        ),
                                                                        T.StructField(
                                                                            "aggregationTemporality",
                                                                            T.StringType(),
                                                                        ),
                                                                    ]
                                                                ),
                                                            ),
                                                            T.StructField(
                                                                "exponentialHistogram",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "dataPoints",
                                                                            T.ArrayType(
                                                                                T.StructType(
                                                                                    [
                                                                                        T.StructField("attributes", _OTLP_KVS),
                                                                                        T.StructField("timeUnixNano", T.StringType()),
                                                                                        T.StructField("count", T.StringType()),
                                                                                        T.StructField("sum", T.DoubleType()),
                                                                                        T.StructField("min", T.DoubleType()),
                                                                                        T.StructField("max", T.DoubleType()),
                                                                                        T.StructField("zeroCount", T.StringType()),
                                                                                        T.StructField("scale", T.IntegerType()),
                                                                                        T.StructField(
                                                                                            "positive",
                                                                                            T.StructType(
                                                                                                [
                                                                                                    T.StructField("offset", T.IntegerType()),
                                                                                                    T.StructField("bucketCounts", T.ArrayType(T.StringType())),
                                                                                                ]
                                                                                            ),
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "negative",
                                                                                            T.StructType(
                                                                                                [
                                                                                                    T.StructField("offset", T.IntegerType()),
                                                                                                    T.StructField("bucketCounts", T.ArrayType(T.StringType())),
                                                                                                ]
                                                                                            ),
                                                                                        ),
                                                                                    ]
                                                                                )
                                                                            ),
                                                                        ),
                                                                        T.StructField("aggregationTemporality", T.StringType()),
                                                                    ]
                                                                ),
                                                            ),
                                                            T.StructField(
                                                                "summary",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "dataPoints",
                                                                            T.ArrayType(
                                                                                T.StructType(
                                                                                    [
                                                                                        T.StructField(
                                                                                            "attributes", _OTLP_KVS
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "timeUnixNano",
                                                                                            T.StringType(),
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "count", T.StringType()
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "sum", T.DoubleType()
                                                                                        ),
                                                                                        T.StructField(
                                                                                            "quantileValues",
                                                                                            T.ArrayType(
                                                                                                T.StructType(
                                                                                                    [
                                                                                                        T.StructField(
                                                                                                            "quantile",
                                                                                                            T.DoubleType(),
                                                                                                        ),
                                                                                                        T.StructField(
                                                                                                            "value",
                                                                                                            T.DoubleType(),
                                                                                                        ),
                                                                                                    ]
                                                                                                )
                                                                                            ),
                                                                                        ),
                                                                                    ]
                                                                                )
                                                                            ),
                                                                        )
                                                                    ]
                                                                ),
                                                            ),
                                                        ]
                                                    )
                                                ),
                                            )
                                        ]
                                    )
                                ),
                            ),
                        ]
                    )
                ),
            )
        ]
    )

    def __init__(self, SourceKey: str = "content", Format: str = "json") -> None:
        if Format.lower() != "json":
            raise ValueError("only Format='json' is supported (no proto libs)")
        self.source_key = SourceKey

    def __call__(self, df: DataFrame) -> DataFrame:
        parsed = F.from_json(F.col(self.source_key), self._SCHEMA)
        rm = F.explode(parsed["resourceMetrics"]).alias("__rm__")
        df = df.select("*", rm)
        res_kv = _norm_attrs(F.col("__rm__.resource.attributes"))
        df = df.withColumn("__res_kv__", res_kv)
        m = F.explode(F.flatten(F.col("__rm__.scopeMetrics.metrics"))).alias("__m__")
        df = df.select("*", m).drop("__rm__")

        entry = lambda suffix, t, attrs, extras, value: F.struct(  # noqa: E731
            F.lit(suffix).alias("suffix"),
            t.alias("t"),
            attrs.alias("attrs"),
            extras.alias("extras"),
            value.cast("double").alias("value"),
        )
        no_extras = F.array().cast(
            "array<struct<k:string,v:string>>"
        )
        entry_arr_t = (
            "array<struct<suffix:string,t:string,"
            "attrs:array<struct<k:string,v:string>>,"
            "extras:array<struct<k:string,v:string>>,value:double>>"
        )
        empty_entries = F.array().cast(entry_arr_t)

        mm = F.col("__m__")
        num_value = lambda dp: F.coalesce(  # noqa: E731
            dp["asDouble"], dp["asInt"].try_cast("double")
        )
        empty_kv = F.array().cast("array<struct<k:string,v:string>>")

        def exemplar_entries(dp, extras):
            """newExemplarMetricLogFromRaw (otlpDataToSLSProto.go:79-118):
            one `<name>_exemplars` row per exemplar — traceId/spanId
            labels when non-empty, filtered attributes appended, value =
            DoubleValue() (0 for int exemplars, faithfully), and the
            time value in SECONDS (the reference formats Unix())."""

            def one(ex):
                tid = F.coalesce(ex["traceId"], F.lit(""))
                sid = F.coalesce(ex["spanId"], F.lit(""))
                # decimal division: long/double rounds ns near the
                # second boundary (Go Unix() truncates)
                t_secs = (
                    (ex["timeUnixNano"].try_cast("decimal(26,0)")
                     / F.lit(1_000_000_000))
                    .cast("long").cast("string")
                )
                ex_extras = F.concat(
                    extras,
                    F.when(tid != "", F.array(_kv("traceId", tid))).otherwise(empty_kv),
                    F.when(sid != "", F.array(_kv("spanId", sid))).otherwise(empty_kv),
                    _norm_attrs(ex["filteredAttributes"]),
                )
                return entry(
                    "_exemplars", t_secs, _norm_attrs(dp["attributes"]),
                    ex_extras, F.coalesce(ex["asDouble"], F.lit(0.0)),
                )

            return F.coalesce(F.transform(dp["exemplars"], one), empty_entries)

        gauge = F.coalesce(
            F.flatten(
                F.transform(
                    mm["gauge"]["dataPoints"],
                    lambda dp: F.concat(
                        F.array(
                            entry(
                                "", dp["timeUnixNano"],
                                _norm_attrs(dp["attributes"]),
                                no_extras, num_value(dp),
                            )
                        ),
                        exemplar_entries(dp, no_extras),
                    ),
                )
            ),
            empty_entries,
        )
        sum_extras = F.array(
            _kv("otlp.metric.ismonotonic",
                F.coalesce(mm["sum"]["isMonotonic"], F.lit(False)).cast("string")),
            _kv("otlp.metric.aggregation.temporality",
                _temporality_str(mm["sum"]["aggregationTemporality"])),
        )
        sums = F.coalesce(
            F.flatten(
                F.transform(
                    mm["sum"]["dataPoints"],
                    lambda dp: F.concat(
                        F.array(
                            entry(
                                "", dp["timeUnixNano"],
                                _norm_attrs(dp["attributes"]),
                                sum_extras, num_value(dp),
                            )
                        ),
                        exemplar_entries(dp, sum_extras),
                    ),
                )
            ),
            empty_entries,
        )
        hist_extras = F.array(
            _kv("otlp.metric.aggregation.temporality",
                _temporality_str(mm["histogram"]["aggregationTemporality"])),
            _kv("otlp.metric.histogram.type", "Histogram"),
        )

        def hist_entries(dp):
            t = dp["timeUnixNano"]
            attrs = _norm_attrs(dp["attributes"])
            bounds = F.coalesce(dp["explicitBounds"], F.array().cast("array<double>"))
            counts = F.coalesce(dp["bucketCounts"], F.array().cast("array<string>"))
            n = F.least(F.size(bounds) + 1, F.size(counts))
            idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                F.array().cast("array<int>")
            )
            buckets = F.transform(
                idx,
                lambda j: entry(
                    "_bucket",
                    t,
                    attrs,
                    F.concat(
                        hist_extras,
                        F.array(
                            _kv(
                                "le",
                                F.when(
                                    j <= F.size(bounds),
                                    _g_format(F.try_element_at(bounds, j)),
                                ).otherwise(F.lit("+Inf")),
                            )
                        ),
                    ),
                    F.aggregate(
                        F.slice(counts, F.lit(1), j),
                        F.lit(0.0),
                        lambda acc, x: acc + F.coalesce(x.try_cast("double"), F.lit(0.0)),
                    ),
                ),
            )
            fixed = F.array(
                entry("_sum", t, attrs, hist_extras, dp["sum"]),
                entry("_min", t, attrs, hist_extras, dp["min"]),
                entry("_max", t, attrs, hist_extras, dp["max"]),
                entry("_count", t, attrs, hist_extras, dp["count"].try_cast("double")),
            )
            return F.concat(fixed, buckets, exemplar_entries(dp, hist_extras))

        hists = F.coalesce(
            F.flatten(F.transform(mm["histogram"]["dataPoints"], hist_entries)),
            empty_entries,
        )

        def summary_entries(dp):
            t = dp["timeUnixNano"]
            attrs = _norm_attrs(dp["attributes"])
            quantiles = F.transform(
                F.coalesce(
                    dp["quantileValues"],
                    F.array().cast("array<struct<quantile:double,value:double>>"),
                ),
                lambda q: entry(
                    "",
                    t,
                    attrs,
                    F.array(_kv("quantile", _g_format(q["quantile"]))),
                    q["value"],
                ),
            )
            return F.concat(
                F.array(
                    entry("_sum", t, attrs, no_extras, dp["sum"]),
                    entry("_count", t, attrs, no_extras, dp["count"].try_cast("double")),
                ),
                quantiles,
            )

        summaries = F.coalesce(
            F.flatten(F.transform(mm["summary"]["dataPoints"], summary_entries)),
            empty_entries,
        )

        exp_extras = F.array(
            _kv("otlp.metric.aggregation.temporality",
                _temporality_str(mm["exponentialHistogram"]["aggregationTemporality"])),
            _kv("otlp.metric.histogram.type", "ExponentialHistogram"),
        )

        def exp_hist_entries(dp):
            # ExponentialHistogramToLogs (otlpDataToSLSProto.go:231-274):
            # base = 2^(2^-scale); positive bucket i covers
            # (base^(offset+i), base^(offset+i+1)], negative buckets are
            # the mirrored [..) ranges; counts are NOT cumulative; offsets
            # and zeroCount emit as their own le-labelled rows.
            t = dp["timeUnixNano"]
            attrs = _norm_attrs(dp["attributes"])
            base = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -dp["scale"].cast("double")))

            def side(struct_col, positive):
                counts = F.coalesce(
                    struct_col["bucketCounts"], F.array().cast("array<string>")
                )
                off = F.coalesce(struct_col["offset"], F.lit(0)).cast("double")
                n = F.size(counts)
                idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                    F.array().cast("array<int>")
                )

                def one(j):
                    lower = F.pow(base, off + (j - 1).cast("double"))
                    upper = lower * base
                    le = (
                        F.concat(F.lit("("), _g_format(lower), F.lit(","),
                                 _g_format(upper), F.lit("]"))
                        if positive
                        else F.concat(F.lit("["), _g_format(-upper), F.lit(","),
                                      _g_format(-lower), F.lit(")"))
                    )
                    return entry(
                        "_bucket", t, attrs,
                        F.concat(exp_extras, F.array(_kv("le", le))),
                        F.try_element_at(counts, j).try_cast("double"),
                    )

                off_key = "positive.offset" if positive else "negative.offset"
                return F.concat(
                    F.transform(idx, one),
                    F.array(
                        entry(
                            "_bucket", t, attrs,
                            F.concat(exp_extras, F.array(_kv("le", off_key))),
                            off,
                        )
                    ),
                )

            fixed = F.array(
                entry("_sum", t, attrs, exp_extras, dp["sum"]),
                entry("_min", t, attrs, exp_extras, dp["min"]),
                entry("_max", t, attrs, exp_extras, dp["max"]),
                entry("_count", t, attrs, exp_extras, dp["count"].try_cast("double")),
                entry(
                    "_bucket", t, attrs,
                    F.concat(exp_extras, F.array(_kv("le", "zero.count"))),
                    F.coalesce(dp["zeroCount"], F.lit("0")).try_cast("double"),
                ),
            )
            return F.concat(fixed, side(dp["positive"], True),
                            side(dp["negative"], False))

        exp_hists = F.coalesce(
            F.flatten(
                F.transform(
                    mm["exponentialHistogram"]["dataPoints"], exp_hist_entries
                )
            ),
            empty_entries,
        )

        entries = F.filter(
            F.concat(gauge, sums, hists, summaries, exp_hists),
            lambda e: e["value"].isNotNull(),
        )
        df = df.select("*", F.explode(entries).alias("__e__"))
        name = F.regexp_replace(
            F.concat(mm["name"], F.col("__e__.suffix")), r"[^a-zA-Z0-9_:]", "_"
        )
        out = df.select(
            name.alias("__name__"),
            F.col("__e__.t").try_cast("long").alias("__time_nano__"),
            _labels_string(
                F.col("__res_kv__"), F.col("__e__.attrs"), F.col("__e__.extras")
            ).alias("__labels__"),
            F.col("__e__.value").alias("__value__"),
        )
        return out


@register("processor_otel_trace")
class OtelTraceReshape(Processor):
    """OTLP-JSON traces payload → one row per span with the reference's
    flat fields (otlp_trace_parser.go:19-48,132-216): host, service,
    resource (JSON of remaining resource attrs), otlp.name, otlp.version,
    traceID, spanID, parentSpanID, kind (short string, :218-233), name,
    links (JSON, :271-283), logs (JSON of span events, :256-269),
    traceState, start/end/duration (epoch MICROseconds, :180-192),
    attribute (JSON), statusCode (OK/ERROR/UNSET, :235-243),
    statusMessage.

    Attribute values serialize via AsString (scalar subset) into
    key-sorted JSON objects — the reference marshals Go maps, which are
    also key-sorted. Format='json' only, like OtelMetricReshape.
    """

    _SPAN = T.StructType(
        [
            T.StructField("traceId", T.StringType()),
            T.StructField("spanId", T.StringType()),
            T.StructField("parentSpanId", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("startTimeUnixNano", T.StringType()),
            T.StructField("endTimeUnixNano", T.StringType()),
            T.StructField("traceState", T.StringType()),
            T.StructField("attributes", _OTLP_KVS),
            T.StructField(
                "events",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("name", T.StringType()),
                            T.StructField("timeUnixNano", T.StringType()),
                            T.StructField("attributes", _OTLP_KVS),
                        ]
                    )
                ),
            ),
            T.StructField(
                "links",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("traceId", T.StringType()),
                            T.StructField("spanId", T.StringType()),
                            T.StructField("attributes", _OTLP_KVS),
                        ]
                    )
                ),
            ),
            T.StructField(
                "status",
                T.StructType(
                    [
                        T.StructField("code", T.StringType()),
                        T.StructField("message", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    _SCHEMA = T.StructType(
        [
            T.StructField(
                "resourceSpans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "resource",
                                T.StructType([T.StructField("attributes", _OTLP_KVS)]),
                            ),
                            T.StructField(
                                "scopeSpans",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "scope",
                                                T.StructType(
                                                    [
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField("version", T.StringType()),
                                                    ]
                                                ),
                                            ),
                                            T.StructField("spans", T.ArrayType(_SPAN)),
                                        ]
                                    )
                                ),
                            ),
                        ]
                    )
                ),
            )
        ]
    )

    _KIND = {
        "1": "internal", "SPAN_KIND_INTERNAL": "internal",
        "2": "server", "SPAN_KIND_SERVER": "server",
        "3": "client", "SPAN_KIND_CLIENT": "client",
        "4": "producer", "SPAN_KIND_PRODUCER": "producer",
        "5": "consumer", "SPAN_KIND_CONSUMER": "consumer",
    }
    _STATUS = {
        "1": "OK", "STATUS_CODE_OK": "OK",
        "2": "ERROR", "STATUS_CODE_ERROR": "ERROR",
    }

    def __init__(self, SourceKey: str = "content", Format: str = "json") -> None:
        if Format.lower() != "json":
            raise ValueError("only Format='json' is supported (no proto libs)")
        self.source_key = SourceKey

    def __call__(self, df: DataFrame) -> DataFrame:
        parsed = F.from_json(F.col(self.source_key), self._SCHEMA)
        df = df.select("*", F.explode(parsed["resourceSpans"]).alias("__rs__"))
        res = F.col("__rs__.resource.attributes")
        res_kv = _norm_attrs(res)
        host = F.coalesce(
            F.try_element_at(F.map_from_entries(res_kv), F.lit("host.name")),
            F.lit(""),
        )
        service = F.coalesce(
            F.try_element_at(F.map_from_entries(res_kv), F.lit("service.name")),
            F.lit(""),
        )
        rest_kv = F.filter(
            res_kv, lambda e: ~e["k"].isin("host.name", "service.name")
        )
        df = (
            df.withColumn("__host__", host)
            .withColumn("__service__", service)
            .withColumn("__resource__", self._kv_json(rest_kv))
            .select("*", F.explode(F.col("__rs__.scopeSpans")).alias("__ss__"))
            .drop("__rs__")
        )
        span = F.explode(F.col("__ss__.spans")).alias("__sp__")
        df = df.select("*", span)
        sp = F.col("__sp__")
        kind_map = F.create_map(*[F.lit(x) for kvp in self._KIND.items() for x in kvp])
        status_map = F.create_map(*[F.lit(x) for kvp in self._STATUS.items() for x in kvp])
        start_ns = sp["startTimeUnixNano"].try_cast("decimal(26,0)")
        end_ns = sp["endTimeUnixNano"].try_cast("decimal(26,0)")
        micros = lambda c: (c / 1000).cast("long").cast("string")  # noqa: E731
        events_json = F.concat(
            F.lit("["),
            F.array_join(
                F.coalesce(F.transform(
                    sp["events"],
                    lambda e: F.concat(
                        F.lit('{"attribute":'), self._kv_json(_norm_attrs(e["attributes"])),
                        F.lit(',"name":'), _json_str(e["name"]),
                        F.lit(',"time":'), F.coalesce(e["timeUnixNano"], F.lit("0")),
                        F.lit("}"),
                    ),
                ), F.array().cast("array<string>")),
                ",",
            ),
            F.lit("]"),
        )
        links_json = F.concat(
            F.lit("["),
            F.array_join(
                F.coalesce(F.transform(
                    sp["links"],
                    lambda l: F.concat(
                        F.lit('{"attribute":'), self._kv_json(_norm_attrs(l["attributes"])),
                        F.lit(',"spanID":'), _json_str(F.lower(l["spanId"])),
                        F.lit(',"traceID":'), _json_str(F.lower(l["traceId"])),
                        F.lit("}"),
                    ),
                ), F.array().cast("array<string>")),
                ",",
            ),
            F.lit("]"),
        )
        out = df.select(
            F.col("__host__").alias("host"),
            F.col("__service__").alias("service"),
            F.col("__resource__").alias("resource"),
            F.coalesce(F.col("__ss__.scope.name"), F.lit("")).alias("otlp_name"),
            F.coalesce(F.col("__ss__.scope.version"), F.lit("")).alias("otlp_version"),
            F.lower(F.coalesce(sp["traceId"], F.lit(""))).alias("traceID"),
            F.lower(F.coalesce(sp["spanId"], F.lit(""))).alias("spanID"),
            F.lower(F.coalesce(sp["parentSpanId"], F.lit(""))).alias("parentSpanID"),
            F.coalesce(
                F.try_element_at(kind_map, sp["kind"]), F.lit("")
            ).alias("kind"),
            F.coalesce(sp["name"], F.lit("")).alias("name"),
            links_json.alias("links"),
            events_json.alias("logs"),
            F.coalesce(sp["traceState"], F.lit("")).alias("traceState"),
            micros(start_ns).alias("start"),
            micros(end_ns).alias("end"),
            micros(end_ns - start_ns).alias("duration"),
            self._kv_json(_norm_attrs(sp["attributes"])).alias("attribute"),
            F.coalesce(
                F.try_element_at(status_map, sp["status"]["code"]), F.lit("UNSET")
            ).alias("statusCode"),
            F.coalesce(sp["status"]["message"], F.lit("")).alias("statusMessage"),
        )
        return out

    @staticmethod
    def _kv_json(kvs):
        """array<struct<k,v>> → key-sorted JSON object string (Go
        json.Marshal of a map also emits sorted keys). to_json handles
        the escaping; map entry order follows the sorted array."""
        sorted_kvs = F.array_sort(
            kvs,
            lambda a, b: F.when(a["k"] < b["k"], -1)
            .when(a["k"] > b["k"], 1)
            .otherwise(0),
        )
        return F.coalesce(
            F.to_json(F.map_from_entries(sorted_kvs)), F.lit("{}")
        )


@register("processor_otel_log_parse")
class OtelLogParse(Processor):
    """OTLP-JSON logs payload → one row per LogRecord with the
    reference's flat fields (ConvertOtlpLogV1,
    otlpDataToSLSProto.go:280-338): time_unix_nano, severity_number,
    severity_text, content (body AsString), attributes / resources as
    key-sorted JSON strings (NULL when empty, like the reference omitting
    the key). Completes the OTLP payload trio beside OtelMetricReshape /
    OtelTraceReshape; same single from_json + explodes, no shuffle."""

    _SCHEMA = T.StructType(
        [
            T.StructField(
                "resourceLogs",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "resource",
                                T.StructType([T.StructField("attributes", _OTLP_KVS)]),
                            ),
                            T.StructField(
                                "scopeLogs",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "logRecords",
                                                T.ArrayType(
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "timeUnixNano", T.StringType()
                                                            ),
                                                            T.StructField(
                                                                "severityNumber", T.StringType()
                                                            ),
                                                            T.StructField(
                                                                "severityText", T.StringType()
                                                            ),
                                                            T.StructField("body", _OTLP_ANYVALUE),
                                                            T.StructField("attributes", _OTLP_KVS),
                                                        ]
                                                    )
                                                ),
                                            )
                                        ]
                                    )
                                ),
                            ),
                        ]
                    )
                ),
            )
        ]
    )

    def __init__(self, SourceKey: str = "content", Format: str = "json") -> None:
        if Format.lower() != "json":
            raise ValueError("only Format='json' is supported (no proto libs)")
        self.source_key = SourceKey

    def __call__(self, df: DataFrame) -> DataFrame:
        parsed = F.from_json(F.col(self.source_key), self._SCHEMA)
        df = df.select("*", F.explode(parsed["resourceLogs"]).alias("__rl__"))
        res_kv = _norm_attrs(F.col("__rl__.resource.attributes"))
        resources = F.when(
            F.size(res_kv) > 0, OtelTraceReshape._kv_json(res_kv)
        )
        df = df.withColumn("__res__", resources)
        lr = F.explode(
            F.flatten(F.col("__rl__.scopeLogs.logRecords"))
        ).alias("__lr__")
        df = df.select("*", lr).drop("__rl__")
        rec = F.col("__lr__")
        attrs_kv = _norm_attrs(rec["attributes"])
        out = df.select(
            rec["timeUnixNano"].try_cast("long").alias("time_unix_nano"),
            F.coalesce(
                rec["severityNumber"].try_cast("int"), F.lit(0)
            ).alias("severity_number"),
            F.coalesce(rec["severityText"], F.lit("")).alias("severity_text"),
            _otlp_attr_string(rec["body"]).alias("content"),
            F.when(
                F.size(attrs_kv) > 0, OtelTraceReshape._kv_json(attrs_kv)
            ).alias("attributes"),
            F.col("__res__").alias("resources"),
        )
        return out
