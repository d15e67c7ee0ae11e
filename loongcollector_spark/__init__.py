"""loongcollector_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the query & data-processing
capabilities of alibaba/loongcollector (the reference collector agent,
studied read-only at /root/reference) re-expressed Spark-first:

* parse   — regex / JSON / delimiter / apsara / grok / key-value parsers
            as declarative DataFrame transforms (built-in functions where
            possible, Arrow-vectorized pandas UDFs otherwise)
* enrich  — broadcast-join dict lookups, constant tags, renames, masking
* route   — multicast tag router fanning one cached DataFrame out to
            conditional sinks (reference: core/collection_pipeline/route/Router.cpp)
* aggregate — per-sink counters (counts, byte volumes, error-class
            histograms) mirroring the reference's self-monitor metrics

The engine operates over tables of multi-turn conversation / agent
transcripts ``(conv_id, turn_idx, role, text, tool, ts)`` and is designed
for 10^12-row scale: salted repartitioning for hot conversations, AQE
skew handling, partition-pruned scans, checkpoint/lineage tables for
idempotent resume.
"""

__version__ = "0.1.0"

from loongcollector_spark.session import get_spark  # noqa: F401
