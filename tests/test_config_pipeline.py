"""YAML config → pipeline compilation (the reference's config-driven
entry path: CollectionConfig → plugin chain → router)."""

from __future__ import annotations

from loongcollector_spark.plans.config_pipeline import load_config


class TestConfigPipeline:
    def test_yaml_end_to_end(self, spark, transcripts):
        cfg = load_config("/root/repo/configs/transcripts_pipeline.yaml")
        sinks = cfg.run(transcripts)
        assert set(sinks) == {"sink_model", "sink_parse_fail", "sink_all"}
        all_rows = sinks["sink_all"]
        assert all_rows.count() == transcripts.count()  # keep-fail + multicast
        model = sinks["sink_model"].select("role_class").distinct().collect()
        assert [r.role_class for r in model] == ["model"]
        # regex grammar rows parsed; others tagged
        ok = all_rows.filter("error_class = ''")
        assert ok.filter("user_key IS NULL").count() == 0
        fails = all_rows.filter("error_class = 'regex_parse_fail'")
        assert fails.count() == transcripts.count() - ok.count()
        # constant field from processor_add_fields
        assert all_rows.select("pipeline").distinct().collect()[0].pipeline == "transcripts_v1"

    def test_inline_yaml(self, spark, transcripts):
        cfg = load_config(
            """
processors:
  - Type: processor_pick_key
    Include: [conv_id, turn_idx, role]
"""
        )
        out = cfg.run(transcripts)["default"]
        assert out.columns == ["conv_id", "turn_idx", "role"]


class TestContainerConfig:
    def test_container_yaml_end_to_end(self, spark):
        from loongcollector_spark.plans.config_pipeline import load_config

        cfg = load_config("configs/container_pipeline.yaml")
        df = spark.createDataFrame(
            [
                ("f1", 0, "t stdout P ab"),
                ("f1", 1, "t stdout F cd"),
                ("f1", 2, "t stderr F solo"),
            ],
            "src string, off int, content string",
        )
        rows = {
            r.off: (r.content, r.n_merged)
            for r in cfg.run(df)["sink_all"].collect()
        }
        assert rows == {0: ("abcd", 2), 2: ("solo", 1)}
