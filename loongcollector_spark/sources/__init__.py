"""Sources: transcript synthesis + table readers.

The reference's inputs (file tailing, stdout, kafka — SURVEY.md §2.6) are
replaced by table scans; the transcript corpus is the primary input
(BASELINE.json ``input_hint``).
"""

from loongcollector_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_COLUMNS,
    generate_transcripts,
    transcripts_duckdb_sql,
    transcripts_from_events,
    transcripts_spark_sql,
)
