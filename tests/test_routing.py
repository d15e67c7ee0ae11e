"""Router semantics: multicast copies, DiscardingTag, exploded variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from loongcollector_spark.routing import (
    ExprCondition,
    LogstoreRouter,
    Route,
    Router,
    TagCondition,
)


def _df(spark):
    rows = [
        ("r1", "log", "a"),
        ("r2", "metric", "a"),
        ("r3", "log", "b"),
    ]
    return spark.createDataFrame(rows, "id string, kind string, tag string")


class TestRouter:
    def test_multicast_copies(self, spark):
        """Router.cpp:50-82 — a row matching k conditions lands in all k
        sinks, unconditional sinks always receive."""
        router = Router([
            Route("logs", TagCondition("kind", "log")),
            Route("tag_a", TagCondition("tag", "a")),
            Route("everything", None),
        ])
        sinks = router.route(_df(spark))
        got = {k: sorted(r.id for r in v.collect()) for k, v in sinks.items()}
        assert got["logs"] == ["r1", "r3"]
        assert got["tag_a"] == ["r1", "r2"]
        assert got["everything"] == ["r1", "r2", "r3"]  # multicast

    def test_discarding_tag(self, spark):
        router = Router([
            Route("logs", TagCondition("kind", "log", discarding_tag=True)),
        ])
        out = router.route(_df(spark))["logs"]
        assert "kind" not in out.columns

    def test_exploded_equals_filtered(self, spark):
        router = Router([
            Route("logs", ExprCondition("kind = 'log'")),
            Route("everything", None),
        ])
        df = _df(spark)
        exploded = router.route_multicast_exploded(df)
        filtered = router.route(df)
        for name in ("logs", "everything"):
            a = sorted(r.id for r in exploded.filter(F.col("__sink__") == name).collect())
            b = sorted(r.id for r in filtered[name].collect())
            assert a == b, name

    def test_exclusive_first_match_wins(self, spark):
        router = Router([
            Route("logs", TagCondition("kind", "log")),
            Route("tag_a", TagCondition("tag", "a")),
            Route("rest", None),
        ])
        tagged = router.route_exclusive_tagged(_df(spark))
        got = {r["id"]: r["__sink__"] for r in tagged.collect()}
        assert got == {"r1": "logs", "r2": "tag_a", "r3": "logs"}

    def test_logstore_router_drop_dismatch(self, spark):
        router = LogstoreRouter(
            source_key="kind",
            router_regex=["log"],
            router_logstore=["logstore_a"],
            drop_dis_match=True,
        )
        out = router(_df(spark))
        assert sorted(r.id for r in out.collect()) == ["r1", "r3"]


class TestFieldsWithConditionRegexp:
    def test_regexp_relation_is_search_not_fullmatch(self, spark):
        # Go regexp.MatchString searches anywhere in the value
        # (processor_fields_with_condition.go:125-127)
        from loongcollector_spark.operators.enrich import FieldsWithCondition

        df = spark.createDataFrame(
            [("prefix-ERR-42-suffix",), ("clean",)], "msg string"
        )
        out = FieldsWithCondition(Switch=[{
            "Case": {"RelationOperator": "regexp",
                     "FieldConditions": {"msg": r"ERR-\d+"}},
            "AddFields": {"sev": "error"},
        }])(df)
        got = {r.msg: r.sev for r in out.collect()}
        assert got["prefix-ERR-42-suffix"] == "error"  # substring hit
        assert got["clean"] is None


class TestFilterKeyRegexEventFilter:
    def test_drops_logs_not_columns(self, spark):
        # go:69-97 — "if key is unmatched, drop this log": whole-event
        # semantics over present (non-NULL) field NAMES
        from loongcollector_spark.operators.filters import FilterKeyRegex

        df = spark.createDataFrame(
            [(0, "v", None), (1, None, "x"), (2, "v", "x")],
            "i int, wanted string, legacy_old string",
        )
        out = FilterKeyRegex(Include=["want"], Exclude=["legacy_"])(df)
        rows = out.collect()
        assert [r.i for r in rows] == [0]  # 1: include missing; 2: excluded
        assert set(out.columns) == {"i", "wanted", "legacy_old"}  # no projection
        # include regex matching no column name at all → empty
        assert FilterKeyRegex(Include=["nope"])(df).count() == 0


class TestCloudMeta:
    def test_mock_platform_flags_rename_jsonpath(self, spark):
        # MockManager constants (pkg/helper/platformmeta/mock.go:28-71)
        from loongcollector_spark.operators.enrich import CloudMeta

        df = spark.createDataFrame([("x",)], "v string")
        out = CloudMeta(
            Platform="mock",
            Metadata=["__cloud_instance_id__", "__cloud_region__"],
            RenameMetadata={"__cloud_region__": "region"},
        )(df).collect()[0]
        assert out["__cloud_instance_id__"] == "id_xxx"
        assert out["region"] == "region_xxx"
        packed = CloudMeta(
            Platform="mock",
            Metadata=["__cloud_zone__"],
            JSONPath="cloud_meta",
        )(df).collect()[0]
        assert packed["cloud_meta"] == '{"__cloud_zone__":"zone_xxx"}'
