"""Conversion-op unit tests (plugins/processor/{json,csv,anchor,gotime,
droplastkey,logtoslsmetric,encrypt} parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.convert import (
    Anchor,
    CsvParse,
    DropLastKey,
    Encrypt,
    GoTime,
    JsonExpand,
    LogToMetric,
    Strptime,
)
from tests.conftest import rows_as_dicts


class TestJsonExpand:
    NESTED = '{"a":{"b":{"c":1}},"arr":[1,2],"s":"x","n":null,"t":true}'

    def test_unlimited_depth(self, text_df_factory):
        df = text_df_factory([self.NESTED])
        out = rows_as_dicts(JsonExpand(SourceKey="content")(df))
        m = out[0]["expanded"]
        assert m["a_b_c"] == "1"
        assert m["arr"] == "[1,2]"  # arrays stay serialized by default
        assert m["s"] == "x"
        assert m["n"] == ""
        assert m["t"] == "true"

    def test_depth_limit_and_prefix(self, text_df_factory):
        df = text_df_factory([self.NESTED])
        proc = JsonExpand(
            SourceKey="content", ExpandDepth=2, Prefix="p_",
            UseSourceKeyAsPrefix=True,
        )
        m = rows_as_dicts(proc(df))[0]["expanded"]
        # depth 2: a_b stops there, value re-serialized
        assert m["p_content_a_b"] == '{"c":1}'

    def test_expand_array(self, text_df_factory):
        df = text_df_factory(['{"arr":[5,6]}'])
        m = rows_as_dicts(JsonExpand(SourceKey="content", ExpandArray=True)(df))[0][
            "expanded"
        ]
        assert m["arr_0"] == "5" and m["arr_1"] == "6"


class TestCsv:
    def test_quote_aware(self, text_df_factory):
        df = text_df_factory(['"a,b",c'])
        out = rows_as_dicts(CsvParse(SourceKey="content", SplitKeys=["x", "y"])(df))
        assert out[0]["x"] == "a,b" and out[0]["y"] == "c"

    def test_preserve_others(self, text_df_factory):
        df = text_df_factory(["1,2,3,4"])
        out = rows_as_dicts(
            CsvParse(SourceKey="content", SplitKeys=["x"], PreserveOthers=True)(df)
        )
        assert out[0]["_decode_preserve_"] == "2,3,4"


class TestAnchor:
    def test_first_occurrence(self, text_df_factory):
        df = text_df_factory(["pre START middle STOP post START x"])
        proc = Anchor(
            SourceKey="content",
            Anchors=[{"Start": "START ", "Stop": " STOP", "FieldName": "mid"}],
        )
        assert rows_as_dicts(proc(df))[0]["mid"] == "middle"

    def test_json_field(self, text_df_factory):
        # keys are FieldName<conn>key, jsonparser-style raw values
        # (anchor.go ExpondJSONCallBack / depth-1 ObjectEach)
        df = text_df_factory(['data={"k":"v","n":3,"o":{"x":1}} end'])
        proc = Anchor(
            SourceKey="content",
            Anchors=[{"Start": "data=", "Stop": " end", "FieldName": "j",
                      "FieldType": "json"}],
        )
        assert rows_as_dicts(proc(df))[0]["j"] == {
            "j_k": "v", "j_n": "3", "j_o": '{"x":1}'
        }

    def test_json_expond_depth(self, text_df_factory):
        df = text_df_factory(['d={"a":{"b":{"c":1}},"s":"x"};'])
        proc = Anchor(
            SourceKey="content",
            Anchors=[{"Start": "d=", "Stop": ";", "FieldName": "j",
                      "FieldType": "json", "ExpondJSON": True,
                      "MaxExpondDepth": 2, "ExpondConnecter": "."}],
        )
        m = rows_as_dicts(proc(df))[0]["j"]
        # depth cap 2: a.b emitted as raw json, not recursed to a.b.c
        assert m == {"j.a.b": '{"c":1}', "j.s": "x"}

    def test_missing_stop_skips_anchor(self, text_df_factory):
        # go:166-175: a non-empty Stop that never occurs → anchor skipped
        df = text_df_factory(["data=abc"])
        proc = Anchor(
            SourceKey="content",
            Anchors=[{"Start": "data=", "Stop": "|", "FieldName": "m"}],
        )
        assert rows_as_dicts(proc(df))[0]["m"] is None


class TestTimes:
    def test_gotime_layout(self, text_df_factory):
        df = text_df_factory(["2024/01/05 12:13:14"])
        proc = GoTime(
            SourceKey="content",
            SourceFormat="2006/01/02 15:04:05",
            DestKey="out",
            DestFormat="2006-01-02",
        )
        assert rows_as_dicts(proc(df))[0]["out"] == "2024-01-05"

    def test_strptime_offset(self, text_df_factory):
        df = text_df_factory(["2024-01-05 00:00:00"])
        proc = Strptime(
            SourceKey="content", Format="%Y-%m-%d %H:%M:%S",
            DestKey="t", AdjustUTCOffset=3600,
        )
        assert str(rows_as_dicts(proc(df))[0]["t"]) == "2024-01-05 01:00:00"


class TestDropLastKey:
    def test_drops_when_any_include_present(self, spark):
        # reference sets dropFlag on the FIRST Include hit (go:63-73):
        # OR semantics — k1 missing but k2 present still drops
        df = spark.createDataFrame(
            [("raw1", "a", "b"), ("raw2", None, "b"), ("raw3", None, None)],
            "raw string, k1 string, k2 string",
        )
        out = rows_as_dicts(
            DropLastKey(DropKey="raw", Include=["k1", "k2"])(df),
            order_by=("raw",),
        )
        vals = {(r["k1"], r["k2"]): r["raw"] for r in out}
        assert vals[("a", "b")] is None  # k1 present → dropped
        assert vals[(None, "b")] is None  # k2 present → dropped
        assert vals[(None, None)] == "raw3"  # no include key → kept


class TestLogToMetric:
    def test_reshape(self, spark):
        df = spark.createDataFrame(
            [("cpu", 0.5, "h1", "2024-01-01 00:00:00")],
            "mname string, mval double, host string, ts_s string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp"))
        proc = LogToMetric(MetricLabelKeys=["host"], MetricValues={"mname": "mval"})
        rows = proc(df).collect()
        assert rows[0].metric_name == "cpu"
        assert rows[0].labels == {"host": "h1"}
        assert rows[0].value == 0.5


class TestLabelsString:
    def test_sorts_by_key_not_joined_string(self, spark):
        """ADVICE r2: keys with chars ordering before '#' ('a!' vs 'a')
        must sort by KEY, matching MetricLabels.String() key sort —
        sorting the joined 'k#$#v' strings would put 'a!#$#…' first."""
        from loongcollector_spark.operators.convert import _kv, _labels_string

        out = spark.range(1).select(
            _labels_string(
                F.array(_kv("a!", "v1"), _kv("a", "v2"), _kv("b", "v3"))
            ).alias("s")
        ).collect()[0].s
        # key order: 'a' < 'a!' < 'b'  ('a!' joined would sort before 'a'
        # because '!' (0x21) < '#' (0x23))
        assert out == "a#$#v2|a!#$#v1|b#$#v3"


class TestEncrypt:
    def test_aes_cbc_deterministic_with_iv(self, text_df_factory):
        df = text_df_factory(["secret payload"])
        proc = Encrypt(
            SourceKeys=["content"],
            EncryptionKey="00112233445566778899aabbccddeeff",
            IV="ffeeddccbbaa99887766554433221100",
        )
        a = rows_as_dicts(proc(df))[0]["content"]
        b = rows_as_dicts(proc(df))[0]["content"]
        assert a == b and a != "secret payload"
        # hex output, no IV prefix (go:113, :126-143)
        assert set(a) <= set("0123456789abcdef") and len(a) == 32

    def test_key_length_validation(self):
        with pytest.raises(ValueError, match="16/24/32"):
            Encrypt(SourceKeys=["x"], EncryptionKey="short")

    def test_nist_cbc_vector(self, spark):
        """NIST SP 800-38A F.2.1 CBC-AES128.Encrypt: the first output
        block for the published key/IV/plaintext — anchors the hex
        key/IV decoding, IV stripping, and hex output end-to-end."""
        pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
        df = spark.createDataFrame([(bytearray(pt),)], "v binary")
        out = Encrypt(
            SourceKeys=["v"],
            EncryptionKey="2b7e151628aed2a6abf7158809cf4f3c",
            IV="000102030405060708090a0b0c0d0e0f",
        )(df)
        got = out.collect()[0].v
        assert got[:32] == "7649abac8119b246cee98e9b12e9197d"
        assert len(got) == 64  # + one PKCS#7 padding block, no IV prefix


class TestOtelReshape:
    def test_logrecord_shape(self, spark):
        from loongcollector_spark.operators.convert import OtelLogReshape

        df = spark.createDataFrame(
            [("hello", "ERROR", "c1", "2024-01-01 00:00:00")],
            "text string, level string, conv_id string, ts_s string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp"))
        out = OtelLogReshape(AttributeKeys=["conv_id"])(df).collect()[0]
        assert out.timeUnixNano == 1704067200 * 1_000_000_000
        assert out.severityText == "ERROR"
        assert out.body == "hello"
        assert out.attributes == {"conv_id": "c1"}


class TestOtelMetricTrace:
    """OTLP-JSON reshapes (plugins/processor/otel/processor_otel_metric.go,
    processor_otel_trace.go; otlpDataToSLSProto.go converters)."""

    def _metric_rows(self, spark, payload):
        import json as _json

        from loongcollector_spark.operators.convert import OtelMetricReshape

        df = spark.createDataFrame([(_json.dumps(payload),)], "content string")
        return {
            (r["__name__"], r["__labels__"]): (r["__time_nano__"], r["__value__"])
            for r in OtelMetricReshape(SourceKey="content")(df).collect()
        }

    def test_gauge_and_sum(self, spark):
        rows = self._metric_rows(spark, {
            "resourceMetrics": [{
                "resource": {"attributes": [
                    {"key": "host.name", "value": {"stringValue": "h1"}}]},
                "scopeMetrics": [{"metrics": [
                    {"name": "cpu load", "gauge": {"dataPoints": [
                        {"attributes": [{"key": "core", "value": {"intValue": "0"}}],
                         "timeUnixNano": "17000", "asDouble": 0.5},
                        {"attributes": [], "timeUnixNano": "17001", "asInt": "7"}]}},
                    {"name": "req", "sum": {"isMonotonic": True,
                        "aggregationTemporality": 2,
                        "dataPoints": [{"attributes": [],
                                        "timeUnixNano": "17002", "asInt": "42"}]}},
                ]}]}]})
        # name formatting: space → _, labels sorted k#$#v joined with |
        assert rows[("cpu_load", "core#$#0|host.name#$#h1")] == (17000, 0.5)
        assert rows[("cpu_load", "host.name#$#h1")] == (17001, 7.0)
        assert rows[(
            "req",
            "host.name#$#h1|otlp.metric.aggregation.temporality#$#Cumulative"
            "|otlp.metric.ismonotonic#$#true",
        )] == (17002, 42.0)

    def test_histogram_cumulative_buckets(self, spark):
        rows = self._metric_rows(spark, {
            "resourceMetrics": [{
                "resource": {"attributes": []},
                "scopeMetrics": [{"metrics": [
                    {"name": "lat", "histogram": {
                        "aggregationTemporality": "AGGREGATION_TEMPORALITY_DELTA",
                        "dataPoints": [{"attributes": [], "timeUnixNano": "1",
                            "count": "6", "sum": 12.5, "min": 0.1, "max": 9.0,
                            "bucketCounts": ["1", "2", "3"],
                            "explicitBounds": [1.0, 5.0]}]}}]}]}]})
        base = "otlp.metric.aggregation.temporality#$#Delta|otlp.metric.histogram.type#$#Histogram"
        assert rows[("lat_sum", base)] == (1, 12.5)
        assert rows[("lat_min", base)] == (1, 0.1)
        assert rows[("lat_max", base)] == (1, 9.0)
        assert rows[("lat_count", base)] == (1, 6.0)
        # cumulative counts per bound, last is +Inf (HistogramToLogs:209-226)
        assert rows[("lat_bucket", f"le#$#1|{base}")] == (1, 1.0)
        assert rows[("lat_bucket", f"le#$#5|{base}")] == (1, 3.0)
        assert rows[("lat_bucket", f"le#$#+Inf|{base}")] == (1, 6.0)

    def test_summary_quantiles(self, spark):
        rows = self._metric_rows(spark, {
            "resourceMetrics": [{
                "resource": {"attributes": []},
                "scopeMetrics": [{"metrics": [
                    {"name": "q", "summary": {"dataPoints": [
                        {"attributes": [], "timeUnixNano": "9", "count": "10",
                         "sum": 5.0,
                         "quantileValues": [{"quantile": 0.5, "value": 1.5},
                                            {"quantile": 0.99, "value": 2.5}]}]}}]}]}]})
        assert rows[("q_sum", "")] == (9, 5.0)
        assert rows[("q_count", "")] == (9, 10.0)
        assert rows[("q", "quantile#$#0.5")] == (9, 1.5)
        assert rows[("q", "quantile#$#0.99")] == (9, 2.5)

    def test_trace_span_flat_fields(self, spark):
        import json as _json

        from loongcollector_spark.operators.convert import OtelTraceReshape

        payload = _json.dumps({
            "resourceSpans": [{
                "resource": {"attributes": [
                    {"key": "host.name", "value": {"stringValue": "h1"}},
                    {"key": "service.name", "value": {"stringValue": "svc"}},
                    {"key": "env", "value": {"stringValue": "prod"}}]},
                "scopeSpans": [{"scope": {"name": "lib", "version": "1.2"},
                    "spans": [{
                        "traceId": "0AF7651916CD43DD8448EB211C80319C",
                        "spanId": "B7AD6B7169203331", "parentSpanId": "",
                        "name": "op", "kind": 2,
                        "startTimeUnixNano": "1700000000000000000",
                        "endTimeUnixNano": "1700000001500000000",
                        "traceState": "a=b",
                        "attributes": [
                            {"key": "http.method", "value": {"stringValue": "GET"}}],
                        "events": [{"name": "ev1",
                                    "timeUnixNano": "1700000000600000000",
                                    "attributes": [
                                        {"key": "x", "value": {"intValue": "1"}}]}],
                        "links": [{"traceId": "FF000000000000000000000000000001",
                                   "spanId": "FF00000000000002", "attributes": []}],
                        "status": {"code": 2, "message": "boom"}}]}]}]})
        df = spark.createDataFrame([(payload,)], "content string")
        r = OtelTraceReshape(SourceKey="content")(df).collect()[0]
        assert r.host == "h1" and r.service == "svc"
        assert r.resource == '{"env":"prod"}'  # host/service removed
        assert r.otlp_name == "lib" and r.otlp_version == "1.2"
        assert r.traceID == "0af7651916cd43dd8448eb211c80319c"
        assert r.spanID == "b7ad6b7169203331" and r.parentSpanID == ""
        assert r.kind == "server" and r.name == "op"
        assert r.traceState == "a=b"
        # nanos → MICROseconds (otlp_trace_parser.go:180-192)
        assert r.start == "1700000000000000"
        assert r.end == "1700000001500000"
        assert r.duration == "1500000"
        assert r.attribute == '{"http.method":"GET"}'
        assert r.statusCode == "ERROR" and r.statusMessage == "boom"
        assert r.logs == ('[{"attribute":{"x":"1"},"name":"ev1",'
                          '"time":1700000000600000000}]')
        assert r.links == ('[{"attribute":{},"spanID":"ff00000000000002",'
                           '"traceID":"ff000000000000000000000000000001"}]')

    def test_bad_payload_yields_no_rows(self, spark):
        from loongcollector_spark.operators.convert import (
            OtelMetricReshape,
            OtelTraceReshape,
        )

        df = spark.createDataFrame(
            [("not json",), ("{}",), (None,)], "content string"
        )
        assert OtelMetricReshape(SourceKey="content")(df).count() == 0
        assert OtelTraceReshape(SourceKey="content")(df).count() == 0

    def test_exponential_histogram(self, spark):
        """ExponentialHistogramToLogs (otlpDataToSLSProto.go:231-274):
        base 2^(2^-scale) bucket ranges, offsets + zeroCount rows."""
        rows = self._metric_rows(spark, {
            "resourceMetrics": [{
                "resource": {"attributes": []},
                "scopeMetrics": [{"metrics": [
                    {"name": "eh", "exponentialHistogram": {
                        "aggregationTemporality": 2,
                        "dataPoints": [{"attributes": [], "timeUnixNano": "5",
                            "count": "7", "sum": 10.5, "zeroCount": "1",
                            "scale": 0,
                            "positive": {"offset": 1,
                                         "bucketCounts": ["2", "3"]},
                            "negative": {"offset": 0,
                                         "bucketCounts": ["1"]}}]}}]}]}]})
        base = ("otlp.metric.aggregation.temporality#$#Cumulative"
                "|otlp.metric.histogram.type#$#ExponentialHistogram")
        assert rows[("eh_sum", base)] == (5, 10.5)
        assert rows[("eh_count", base)] == (5, 7.0)
        assert rows[("eh_bucket", f"le#$#zero.count|{base}")] == (5, 1.0)
        assert rows[("eh_bucket", f"le#$#(2,4]|{base}")] == (5, 2.0)
        assert rows[("eh_bucket", f"le#$#(4,8]|{base}")] == (5, 3.0)
        assert rows[("eh_bucket", f"le#$#positive.offset|{base}")] == (5, 1.0)
        assert rows[("eh_bucket", f"le#$#[-2,-1)|{base}")] == (5, 1.0)
        assert rows[("eh_bucket", f"le#$#negative.offset|{base}")] == (5, 0.0)

    def test_exemplar_rows(self, spark):
        """newExemplarMetricLogFromRaw (otlpDataToSLSProto.go:79-118):
        <name>_exemplars rows with traceId/spanId + filtered-attribute
        labels, SECONDS-scale time (truncated), DoubleValue() semantics
        (0.0 for int exemplars)."""
        rows = self._metric_rows(spark, {
            "resourceMetrics": [{
                "resource": {"attributes": []},
                "scopeMetrics": [{"metrics": [
                    {"name": "g", "gauge": {"dataPoints": [
                        {"attributes": [{"key": "core",
                                         "value": {"intValue": "0"}}],
                         "timeUnixNano": "1700000000123456789",
                         "asDouble": 0.5,
                         "exemplars": [
                             {"filteredAttributes": [
                                 {"key": "q", "value": {"stringValue": "x"}}],
                              "timeUnixNano": "1700000000999999999",
                              "asDouble": 42.5,
                              "spanId": "ab12", "traceId": "cd34"},
                             {"timeUnixNano": "1700000001000000000",
                              "asInt": "7"}]}]}}]}]}]})
        assert rows[("g", "core#$#0")] == (1700000000123456789, 0.5)
        assert rows[(
            "g_exemplars", "core#$#0|q#$#x|spanId#$#ab12|traceId#$#cd34"
        )] == (1700000000, 42.5)  # seconds, truncated like Go Unix()
        assert rows[("g_exemplars", "core#$#0")] == (1700000001, 0.0)


class TestOtelLogParse:
    def test_log_records_flat(self, spark):
        """ConvertOtlpLogV1 (otlpDataToSLSProto.go:280-338) flat fields;
        empty attribute maps omit the key (NULL here)."""
        import json as _json

        from loongcollector_spark.operators.convert import OtelLogParse

        payload = _json.dumps({"resourceLogs": [{
            "resource": {"attributes": [
                {"key": "host.name", "value": {"stringValue": "h1"}}]},
            "scopeLogs": [{"logRecords": [
                {"timeUnixNano": "1700000000000000000", "severityNumber": 9,
                 "severityText": "INFO", "body": {"stringValue": "hello"},
                 "attributes": [{"key": "k", "value": {"intValue": "5"}}]},
                {"timeUnixNano": "1700000001000000000",
                 "body": {"doubleValue": 2.5}, "attributes": []}]}]}]})
        df = spark.createDataFrame([(payload,)], "content string")
        rows = OtelLogParse(SourceKey="content")(df).orderBy("time_unix_nano").collect()
        assert rows[0].severity_number == 9 and rows[0].content == "hello"
        assert rows[0].attributes == '{"k":"5"}'
        assert rows[0].resources == '{"host.name":"h1"}'
        assert rows[1].severity_number == 0 and rows[1].severity_text == ""
        assert rows[1].content == "2.5" and rows[1].attributes is None


class TestDesensitizeParity:
    """processor_desensitize parity (go:147-185 + native .cpp:198-249):
    every-occurrence replacement by default (ReplacingAll=true), per-
    occurrence md5 of the matched content, first-only with
    ReplacingAll=false, NULL source untouched in full mode."""

    def _run(self, spark, texts, **kw):
        from loongcollector_spark.operators.enrich import Desensitize

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i int, v string"
        )
        out = Desensitize(SourceKey="v", **kw)(df)
        return [r.v for r in out.orderBy("i").collect()]

    def test_regex_const_all_occurrences(self, spark):
        got = self._run(
            spark, ["psw=a1,x psw=b2", "none", None],
            Method="const", Match="regex", ReplaceString="***",
            RegexBegin="psw=", RegexContent=r"[a-z]\d",
        )
        assert got == ["psw=***,x psw=***", "none", None]

    def test_regex_const_first_only(self, spark):
        got = self._run(
            spark, ["psw=a1,x psw=b2"],
            Method="const", Match="regex", ReplaceString="***",
            RegexBegin="psw=", RegexContent=r"[a-z]\d",
            ReplacingAll=False,
        )
        assert got == ["psw=***,x psw=b2"]

    def test_regex_md5_each_occurrence_hashed(self, spark):
        import hashlib

        h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
        got = self._run(
            spark, ["k=aa; k=bb", "k=aa only", None],
            Method="md5", Match="regex",
            RegexBegin="k=", RegexContent="[a-z]{2}",
        )
        assert got == [
            f"k={h('aa')}; k={h('bb')}",
            f"k={h('aa')} only",
            None,
        ]

    def test_regex_md5_first_only(self, spark):
        import hashlib

        h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
        got = self._run(
            spark, ["k=aa; k=bb"],
            Method="md5", Match="regex",
            RegexBegin="k=", RegexContent="[a-z]{2}",
            ReplacingAll=False,
        )
        assert got == [f"k={h('aa')}; k=bb"]

    def test_full_null_untouched_empty_replaced(self, spark):
        import hashlib

        got = self._run(spark, ["secret", "", None],
                        Method="const", Match="full", ReplaceString="###")
        assert got == ["###", "###", None]
        got = self._run(spark, ["secret", None], Method="md5", Match="full")
        assert got == [hashlib.md5(b"secret").hexdigest(), None]


class TestStringReplaceUnquote:
    """unquote = strconv.Unquote twin (processor_string_replace.go:116-128):
    quoted values strip + decode; unquoted values decode escapes with
    literal quotes preserved; Go error cases keep the original."""

    def _run(self, spark, texts):
        from loongcollector_spark.operators.enrich import StringReplace

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i int, v string"
        )
        out = StringReplace(SourceKey="v", Method="unquote")(df)
        return [r.v for r in out.orderBy("i").collect()]

    def test_unquote_matrix(self, spark):
        got = self._run(spark, [
            '"hello"',            # quoted → stripped
            r'"a\tb\n"',          # quoted + escapes decoded
            r'say "hi"\t!',       # unquoted: escapes decode, quotes stay
            r'"bad \q escape"',   # invalid escape → original kept
            '"a"b"',              # bare interior quote → original kept
            r'é\x41',        # unquoted escape decode
            "plain",              # nothing to do
            None,
        ])
        assert got == [
            "hello",
            "a\tb\n",
            'say "hi"\t!',
            r'"bad \q escape"',
            '"a"b"',
            "éA",
            "plain",
            None,
        ]

    def test_pure_decoder_matches_go_table(self):
        from loongcollector_spark.operators.enrich import _go_unquote_value

        assert _go_unquote_value(r'"\x41\102C"') == "ABC"
        assert _go_unquote_value(r'"\U0001F600"') == "\U0001F600"
        for bad in ['"a\nb"', r'"\8"', '"tail\\"', r'"\ud800"']:
            try:
                _go_unquote_value(bad)
                raise AssertionError(f"{bad!r} should error")
            except ValueError:
                pass


class TestAppenderParity:
    """processor_appender.go:76-140: {{$ENV}}/{{__host__}} templates,
    unknown vars pass through, missing key created, SortLabels re-sort."""

    def test_template_and_missing_key(self, spark, monkeypatch):
        import socket

        from loongcollector_spark.operators.enrich import Appender

        monkeypatch.setenv("LC_TEST_SUFFIX", "fromenv")
        df = spark.createDataFrame([("x",)], "other string")
        out = Appender(Key="lbl", Value="a-{{$LC_TEST_SUFFIX}}-{{nope}}")(df)
        assert out.collect()[0]["lbl"] == "a-fromenv-nope"
        out2 = Appender(Key="lbl", Value="|host={{__host__}}")(
            spark.createDataFrame([("v",)], "lbl string")
        )
        assert out2.collect()[0]["lbl"] == f"v|host={socket.gethostname()}"

    def test_sort_labels(self, spark):
        from loongcollector_spark.operators.enrich import Appender

        df = spark.createDataFrame([("z#$#1|a#$#2",)], "lbl string")
        out = Appender(Key="lbl", Value="|m#$#3", SortLabels=True)(df)
        assert out.collect()[0]["lbl"] == "a#$#2|m#$#3|z#$#1"
        # entries without the separator are dropped; empty value kept
        df2 = spark.createDataFrame([("b#$#|junk",)], "lbl string")
        out2 = Appender(Key="lbl", Value="|a#$#1", SortLabels=True)(df2)
        assert out2.collect()[0]["lbl"] == "a#$#1|b#$#"


class TestBase64DecodeStrict:
    def test_invalid_base64_yields_null(self, spark):
        # Go base64.StdEncoding errors on bad charset/padding →
        # no decoded key (processor_base64_decoding.go:50-58)
        import base64

        from loongcollector_spark.operators.enrich import Base64Decode

        ok = base64.b64encode(b"hello").decode()
        df = spark.createDataFrame(
            [(0, ok), (1, "not!!base64"), (2, "QUJD="), (3, ""), (4, None)],
            "i int, v string",
        )
        out = Base64Decode(SourceKey="v", NewKey="d")(df)
        got = [r.d for r in out.orderBy("i").collect()]
        assert got == ["hello", None, None, "", None]


class TestGoTimeParity:
    """processor_gotime.go:84-103 fixed epoch patterns, :74-79 int-hour
    FixedZone locations, :149-151 KeepSource."""

    def test_fixed_epoch_patterns(self, spark):
        df = spark.createDataFrame(
            [("1704067200", "1704067200123", "1704067200123456")],
            "s string, ms string, us string",
        )
        out = GoTime(SourceKey="s", SourceFormat="seconds",
                     DestKey="o1", DestFormat="2006-01-02 15:04:05")(df)
        out = GoTime(SourceKey="ms", SourceFormat="milliseconds",
                     DestKey="o2", DestFormat="15:04:05")(out)
        out = GoTime(SourceKey="us", SourceFormat="microseconds",
                     DestKey="o3", DestFormat="15:04:05")(out)
        r = out.collect()[0]
        assert r.o1 == "2024-01-01 00:00:00"
        assert r.o2 == "00:00:00" and r.o3 == "00:00:00"

    def test_locations_and_keepsource(self, spark):
        df = spark.createDataFrame([("2024-01-01 12:00:00",)], "t string")
        out = GoTime(
            SourceKey="t", SourceFormat="2006-01-02 15:04:05",
            DestKey="beijing", DestFormat="2006-01-02 15:04:05",
            SourceLocation=0, DestLocation=8, KeepSource=False,
        )(df)
        rows = out.collect()
        assert rows[0].beijing == "2024-01-01 20:00:00"
        assert "t" not in out.columns


class TestLogToMetricValidation:
    def test_invalid_rows_dropped_custom_labels_added(self, spark):
        # go:172-260: bad name regex / non-float value / separator in
        # label value → whole event dropped; CustomMetricLabels constant
        df = spark.createDataFrame(
            [
                ("cpu", "1.5", "h1"),
                ("2bad", "1.0", "h1"),      # name fails ^[a-zA-Z_:]...
                ("ok_name", "notnum", "h1"),  # value not float
                ("mem", "2.0", "a|b"),      # label contains '|'
            ],
            "mname string, mval string, host string",
        ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        out = LogToMetric(
            MetricLabelKeys=["host"], MetricValues={"mname": "mval"},
            CustomMetricLabels={"cluster": "c1"},
        )(df)
        rows = out.collect()
        assert [(r.metric_name, r.value) for r in rows] == [("cpu", 1.5)]
        assert rows[0].labels == {"host": "h1", "cluster": "c1"}
