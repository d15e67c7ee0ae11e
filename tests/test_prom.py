"""Prometheus inner-processor tests: text-exposition parse
(core/prometheus/labels/TextParser.cpp fixture shapes) + relabel actions
(core/prometheus/labels/Relabel.cpp:129-250 semantics)."""

from __future__ import annotations

import hashlib

from loongcollector_spark.operators.prom import PromParse, PromRelabel


def _parse(spark, lines, **kw):
    df = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "idx int, content string"
    )
    return PromParse(SourceKey="content", **kw)(df)


def _hashmod(s: str, mod: int) -> int:
    h = hashlib.md5(s.encode()).digest()
    v = 0
    for i in range(8, 16):
        v = (v << 8) | h[i]
    return v % mod


class TestPromParse:
    def test_full_line(self, spark):
        rows = _parse(
            spark,
            ['http_requests_total{method="post",code="200"} 1027 1395066363000'],
        ).collect()
        r = rows[0]
        assert r.name == "http_requests_total"
        assert dict(r.labels) == {
            "__name__": "http_requests_total", "method": "post", "code": "200"
        }
        assert r.value == 1027.0 and r.ts_ms == 1395066363000

    def test_no_labels_no_ts(self, spark):
        r = _parse(spark, ["metric_simple 42.5"]).collect()[0]
        assert dict(r.labels) == {"__name__": "metric_simple"}
        assert r.value == 42.5 and r.ts_ms is None

    def test_label_value_escapes(self, spark):
        """TextParser.cpp:180-190: \\\\, \\\", \\n unescape."""
        r = _parse(spark, ['esc{v="a\\"b\\\\c\\nd"} 1']).collect()[0]
        assert r.labels["v"] == 'a"b\\c\nd'

    def test_inf_nan(self, spark):
        import math

        rows = {r.name: r.value for r in _parse(
            spark, ["up +Inf", "down -Inf", "nn NaN"]).collect()}
        assert rows["up"] == float("inf") and rows["down"] == float("-inf")
        assert math.isnan(rows["nn"])

    def test_comments_blanks_garbage_dropped(self, spark):
        out = _parse(spark, ["# HELP x y", "", "   ", "garbage line {{{", "ok 1"])
        assert out.count() == 1

    def test_default_ts(self, spark):
        df = spark.createDataFrame([(5000, "m 1")], "scrape_ms long, content string")
        r = PromParse(SourceKey="content", DefaultTsMs="scrape_ms")(df).collect()[0]
        assert r.ts_ms == 5000


class TestPromRelabel:
    def _one(self, spark, labels, configs):
        df = spark.createDataFrame(
            [(labels,)], "labels map<string,string>"
        )
        return PromRelabel(RelabelConfigs=configs)(df)

    def test_replace_with_interpolation(self, spark):
        out = self._one(
            spark, {"method": "post", "code": "200"},
            [{"action": "replace", "source_labels": ["method", "code"],
              "separator": "-", "regex": r"(post)-(\d+)",
              "target_label": "mc", "replacement": "$1_$2"}],
        ).collect()[0]
        assert out.labels["mc"] == "post_200"

    def test_replace_no_match_no_change(self, spark):
        out = self._one(
            spark, {"method": "get"},
            [{"action": "replace", "source_labels": ["method"],
              "regex": "post", "target_label": "m2"}],
        ).collect()[0]
        assert "m2" not in out.labels

    def test_replace_empty_result_deletes_target(self, spark):
        """Relabel.cpp:180-183: empty replacement result deletes."""
        out = self._one(
            spark, {"method": "post", "gone": "x"},
            [{"action": "replace", "source_labels": ["method"],
              "regex": "(post)", "target_label": "gone", "replacement": ""}],
        ).collect()[0]
        assert "gone" not in out.labels

    def test_keep_drop_anchored(self, spark):
        df = spark.createDataFrame(
            [({"n": "abc"},), ({"n": "abcd"},)], "labels map<string,string>"
        )
        # Prometheus regexes are FULLY anchored: 'abc' must not keep 'abcd'
        kept = PromRelabel(
            RelabelConfigs=[{"action": "keep", "source_labels": ["n"],
                             "regex": "abc"}])(df)
        assert [r.labels["n"] for r in kept.collect()] == ["abc"]
        dropped = PromRelabel(
            RelabelConfigs=[{"action": "drop", "source_labels": ["n"],
                             "regex": "abc"}])(df)
        assert [r.labels["n"] for r in dropped.collect()] == ["abcd"]

    def test_keepequal_dropequal(self, spark):
        df = spark.createDataFrame(
            [({"a": "x", "b": "x"},), ({"a": "x", "b": "y"},)],
            "labels map<string,string>",
        )
        eq = PromRelabel(RelabelConfigs=[
            {"action": "keepequal", "source_labels": ["a"], "target_label": "b"}])
        assert eq(df).count() == 1
        ne = PromRelabel(RelabelConfigs=[
            {"action": "dropequal", "source_labels": ["a"], "target_label": "b"}])
        assert ne(df).count() == 1

    def test_hashmod_md5_last8(self, spark):
        """Relabel.cpp:195-205: uint64 from md5 bytes 8..15, % modulus."""
        for v, mod in (("post", 10), ("some-longer-value", 1000)):
            out = self._one(
                spark, {"src": v},
                [{"action": "hashmod", "source_labels": ["src"],
                  "modulus": mod, "target_label": "shard"}],
            ).collect()[0]
            assert out.labels["shard"] == str(_hashmod(v, mod)), v

    def test_labelmap_labeldrop_labelkeep(self, spark):
        base = {"__name__": "m", "code": "200", "method": "post"}
        mapped = self._one(
            spark, base,
            [{"action": "labelmap", "regex": "co(.*)",
              "replacement": "copy_$1"}],
        ).collect()[0]
        assert mapped.labels["copy_de"] == "200"
        dropped = self._one(
            spark, base, [{"action": "labeldrop", "regex": "code"}]
        ).collect()[0]
        assert set(dropped.labels) == {"__name__", "method"}
        kept = self._one(
            spark, base, [{"action": "labelkeep", "regex": "__name__|code"}]
        ).collect()[0]
        assert set(kept.labels) == {"__name__", "code"}

    def test_labelmap_collision_last_win_under_exception_policy(self, spark):
        """ADVICE r2: labelmap targets colliding with existing labels (or
        with each other) must not throw under the EXCEPTION dedup policy;
        the mapped value wins."""
        old = spark.conf.get("spark.sql.mapKeyDedupPolicy")
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
        try:
            out = self._one(
                spark, {"__name__": "m", "code": "200", "copy_de": "old"},
                [{"action": "labelmap", "regex": "co(.*)",
                  "replacement": "copy_$1"}],
            ).collect()[0]
            # 'code' → 'copy_de' overwrites the pre-existing 'copy_de';
            # 'copy_de' itself also matches and maps to 'copy_py_de'
            assert out.labels["copy_de"] == "200"
            assert out.labels["copy_py_de"] == "old"
            assert out.labels["code"] == "200"
        finally:
            spark.conf.set("spark.sql.mapKeyDedupPolicy", old)

    def test_lower_upper_dropmetric(self, spark):
        out = self._one(
            spark, {"__name__": "m", "env": "Prod"},
            [{"action": "lowercase", "source_labels": ["env"],
              "target_label": "env_lc"},
             {"action": "uppercase", "source_labels": ["env"],
              "target_label": "env_uc"}],
        ).collect()[0]
        assert out.labels["env_lc"] == "prod" and out.labels["env_uc"] == "PROD"
        df = spark.createDataFrame(
            [({"__name__": "a"},), ({"__name__": "b"},)],
            "labels map<string,string>",
        )
        keep = PromRelabel(RelabelConfigs=[
            {"action": "dropmetric", "match_list": ["a"]}])(df)
        assert [r.labels["__name__"] for r in keep.collect()] == ["b"]
