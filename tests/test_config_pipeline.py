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


class TestAgentLogsConfig:
    def test_round3_plugins_yaml_end_to_end(self, spark, transcripts):
        """The round-3 plugins drive from the same YAML surface: Go
        regex parser (search), cloud_meta mock tags, event-level
        key-regex filter, regex-md5 desensitize."""
        cfg = load_config("/root/repo/configs/agent_logs_pipeline.yaml")
        out = cfg.run(transcripts)["sink_all"]
        rows = out.collect()
        assert rows, "some apsara-grammar rows must parse"
        import hashlib
        import re as _re

        for r in rows:
            assert r["__cloud_instance_id__"] == "id_xxx"
            assert r["region"] == "region_xxx"
            # only rows with a parsed user survive the key filter,
            # and the user id is md5-masked
            assert r["u_field"] is not None
            assert _re.fullmatch(r"[0-9a-f]{32}", r["u_field"]), r["u_field"]
        # at least one source text must contain the original uNN the
        # mask replaced (sanity that desensitize actually ran)
        src_users = {m for r in rows for m in _re.findall(r"user:(u\d+)", r["text"] or "")}
        hashed = {hashlib.md5(u.encode()).hexdigest() for u in src_users}
        assert {r["u_field"] for r in rows} <= hashed


class TestJobCliConfigMode:
    def test_run_pipeline_config_mode(self, spark, tmp_path):
        """jobs/run_pipeline.py --config drives an arbitrary YAML plugin
        chain end-to-end (the reference's config-driven entry path)."""
        import sys

        sys.path.insert(0, "/root/repo/jobs")
        import run_pipeline

        out = tmp_path / "cfg_out"
        rc = run_pipeline.main([
            "--input", "/root/testdata/sf0.001",
            "--from-events",
            "--output", str(out),
            "--config", "/root/repo/configs/agent_logs_pipeline.yaml",
        ])
        assert rc == 0
        back = spark.read.parquet(str(out / "sink_all"))
        assert back.count() > 0
        assert back.filter("u_field IS NULL").count() == 0
