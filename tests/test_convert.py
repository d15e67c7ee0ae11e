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
        df = text_df_factory(['data={"k":"v"} end'])
        proc = Anchor(
            SourceKey="content",
            Anchors=[{"Start": "data=", "Stop": " end", "FieldName": "j",
                      "FieldType": "json"}],
        )
        assert rows_as_dicts(proc(df))[0]["j"] == {"k": "v"}


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
    def test_drops_only_when_all_present(self, spark):
        df = spark.createDataFrame(
            [("raw1", "a", "b"), ("raw2", None, "b")],
            "raw string, k1 string, k2 string",
        )
        out = rows_as_dicts(
            DropLastKey(DropKey="raw", Include=["k1", "k2"])(df),
            order_by=("k2",),
        )
        vals = {r["k1"]: r["raw"] for r in out}
        assert vals["a"] is None  # all include keys present → dropped
        assert vals[None] == "raw2"  # k1 missing → kept


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


class TestEncrypt:
    def test_aes_cbc_deterministic_with_iv(self, text_df_factory):
        df = text_df_factory(["secret payload"])
        proc = Encrypt(
            SourceKeys=["content"],
            EncryptionKey="0123456789abcdef",
            IV="fedcba9876543210",
        )
        a = rows_as_dicts(proc(df))[0]["content"]
        b = rows_as_dicts(proc(df))[0]["content"]
        assert a == b and a != "secret payload"

    def test_key_length_validation(self):
        with pytest.raises(ValueError, match="16/24/32"):
            Encrypt(SourceKeys=["x"], EncryptionKey="short")


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
