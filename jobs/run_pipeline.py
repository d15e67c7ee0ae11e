"""spark-submit entry point for the flagship pipeline.

Cluster usage (the north-rule deployment shape)::

    scripts/package.sh                       # builds dist/loongcollector_spark.zip
    spark-submit \\
        --py-files dist/loongcollector_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        jobs/run_pipeline.py \\
        --input  <transcripts table path / iceberg table> \\
        --output <sink root> \\
        --checkpoint <checkpoint table path> \\
        --unit-expr "date_format(ts, 'yyyy-MM-dd')"

Local smoke::

    python jobs/run_pipeline.py --input /root/testdata/sf0.001 \\
        --from-events --output /tmp/lc_out --checkpoint /tmp/lc_cp
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo-root import when run directly (spark-submit ships the zip instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts parquet/iceberg path, or sf dir with --from-events")
    ap.add_argument("--from-events", action="store_true",
                    help="derive transcripts from <input>/events.parquet")
    ap.add_argument("--output", required=True, help="sink root directory")
    ap.add_argument("--checkpoint", default=None, help="checkpoint table path (enables resume)")
    ap.add_argument("--unit-expr", default="date_format(ts, 'yyyy-MM-dd')",
                    help="SQL expr defining the resume unit (partition) of each row")
    ap.add_argument("--master", default=None)
    ap.add_argument("--single-pass", action="store_true",
                    help="exploded-multicast single write partitioned by sink")
    ap.add_argument("--config", default=None,
                    help="YAML pipeline config (the reference's plugin-chain "
                         "shape); replaces the built-in flagship pipeline")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from loongcollector_spark.session import get_spark
    from loongcollector_spark.monitor import StageMonitor
    from loongcollector_spark.plans.transcript_pipeline import TranscriptPipeline
    from loongcollector_spark.sinks.writers import write_routed_sinks
    from loongcollector_spark.sources.transcripts import transcripts_from_events

    spark = get_spark(app_name="lc_pipeline", master=args.master)
    if args.from_events:
        transcripts = transcripts_from_events(spark, args.input)
    else:
        transcripts = spark.read.parquet(args.input)

    pipe = TranscriptPipeline()
    mon = StageMonitor()
    t0 = time.time()

    if args.config:
        # config-driven mode: the YAML plugin chain is the pipeline,
        # exactly like the reference's CollectionConfig entry path
        from loongcollector_spark.plans.config_pipeline import load_config

        cfg = load_config(args.config)
        sinks = cfg.run(transcripts)
        paths = write_routed_sinks(sinks, args.output)
        summary = {
            "mode": "config",
            "config": args.config,
            "sinks": paths,
        }
    elif args.single_pass:
        from loongcollector_spark.sinks.writers import write_dynamic_topic

        routed = mon.observe(
            pipe.run_single_pass(transcripts), "routed",
            error_class_col="error_class",
        ).sortWithinPartitions("conv_id", "turn_idx")
        write_dynamic_topic(routed, f"{args.output}/routed", topic_col="__sink__")
        pipe.metrics_single_pass(pipe.run_single_pass(transcripts)).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/__metrics__")
        summary = {
            "mode": "single_pass",
            "output": f"{args.output}/routed",
            "stage_metrics": {
                k: {m: int(v) for m, v in d.items()}
                for k, d in mon.results().items()
            },
        }
    elif args.checkpoint:
        from loongcollector_spark.checkpoint import (
            BatchedResumableRunner,
            CheckpointTable,
        )

        cp = CheckpointTable(spark, args.checkpoint)
        runner = BatchedResumableRunner(spark, cp, args.output)
        with_unit = transcripts.withColumn("unit", F.expr(args.unit_expr))

        def transform(unit_df):
            parsed = pipe.parse(unit_df)
            enriched = pipe.enrich(parsed)
            return pipe.route(enriched)

        processed = runner.run(with_unit, transform=transform)
        summary = {
            "mode": "resumable",
            "processed_units": {k: len(v) for k, v in processed.items()},
        }
    else:
        parsed = mon.observe(pipe.parse(transcripts), "parse",
                             error_class_col="error_class")
        enriched = pipe.enrich(parsed)
        sinks = pipe.route(enriched)
        sinks["__metrics__"] = pipe.metrics(dict(sinks))
        paths = write_routed_sinks(sinks, args.output)
        summary = {
            "mode": "full",
            "sinks": paths,
            "stage_metrics": {
                k: {m: int(v) for m, v in d.items()}
                for k, d in mon.results().items()
            },
        }

    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
