"""Deterministic synthesis of the transcript input table.

The engine's primary input is an Iceberg table of multi-turn
conversation / agent transcripts with schema

    conv_id: string, turn_idx: int32, role: string,
    text: string, tool: string, ts: timestamp

(BASELINE.json ``input_hint``). No such table ships with the sandbox, so we
derive one **deterministically** from the driver-provided ``events`` parquet
(columns ``event_id, ts, user_id, event_type, value, props``). The derivation
is expressed once as an ANSI-SQL template rendered into BOTH the Spark and
the DuckDB dialect, so the driver's DuckDB oracle can reproduce the exact
same rows — every downstream pipeline query therefore has a full SQL oracle.

Each turn's ``text`` payload is drawn from one of five grammars keyed by
``event_id % 5``, mirroring the reference's parser unit-test fixtures
(FIXTURES.md §2; reference fixtures at
core/unittest/processor/ProcessorParseRegexNativeUnittest.cpp:170-228):

    0  regex line        u<user>\\t<etype>\\tk=<k>
    1  JSON line         {"user":"u<user>","etype":"<etype>","k":<k>}
    2  delimiter line    10.0.<a>.<b>|<ETYPE>|<status>
    3  apsara line       [epoch]\\t[LEVEL]\\t[tid]\\t[/file:line]\\tkey:value...
    4  key-value line    user=u<user>&etype=<etype>&k=<k>

A second generator, :func:`generate_transcripts`, synthesizes arbitrary-size
corpora from ``spark.range`` (fully distributed, no driver loop, seeded) with
a Zipf-hot conversation for skew testing — used by the benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_TAB = "\t"  # real tab char embedded in SQL literals (dialect-safe)

# One template, two dialects. {STR} is the string type name, {K} the
# JSON-scalar extraction expression for props '$.k', {EVENTS} the events
# relation. Everything else is shared ANSI SQL.
_TEMPLATE = """
WITH __base AS (
  SELECT
    event_id, user_id, event_type, ts,
    {K} AS k,
    CAST(event_id % 5 AS INT) AS grammar
  FROM {EVENTS}
)
SELECT
  concat('conv', lpad(CAST(user_id AS {STR}), 8, '0')) AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
  CASE event_type WHEN 'signup' THEN 'system' WHEN 'click' THEN 'user'
       WHEN 'view' THEN 'user' WHEN 'purchase' THEN 'assistant'
       ELSE 'tool' END AS role,
  CASE grammar
    WHEN 0 THEN concat('u', CAST(user_id AS {STR}), '{TAB}', event_type, '{TAB}k=', k)
    WHEN 1 THEN concat('{{"user":"u', CAST(user_id AS {STR}), '","etype":"',
                       event_type, '","k":', k, '}}')
    WHEN 2 THEN concat('10.0.', CAST(user_id % 256 AS {STR}), '.',
                       CAST(event_id % 256 AS {STR}), '|', upper(event_type), '|',
                       CASE CAST(event_id % 3 AS INT)
                            WHEN 0 THEN '200' WHEN 1 THEN '404' ELSE '500' END)
    WHEN 3 THEN concat('[1704067200]{TAB}[',
                       CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END,
                       ']{TAB}[', CAST(event_id AS {STR}), ']{TAB}',
                       '[/app/pipeline.cpp:42]{TAB}',
                       'user:u', CAST(user_id AS {STR}), '{TAB}etype:', event_type)
    ELSE concat('user=u', CAST(user_id AS {STR}), '&etype=', event_type, '&k=', k)
  END AS text,
  CASE event_type WHEN 'signup' THEN 'none' WHEN 'click' THEN 'browser'
       WHEN 'view' THEN 'search' WHEN 'purchase' THEN 'db'
       ELSE 'code' END AS tool,
  ts
FROM __base
"""


def transcripts_spark_sql(events_relation: str = "events") -> str:
    """Spark-SQL text deriving the transcripts table from ``events``."""
    return _TEMPLATE.format(
        STR="STRING",
        K="get_json_object(props, '$.k')",
        EVENTS=events_relation,
        TAB=_TAB,
    )


def transcripts_duckdb_sql(events_relation: str = "events") -> str:
    """DuckDB-SQL text deriving the *identical* transcripts table."""
    return _TEMPLATE.format(
        STR="VARCHAR",
        K="json_extract_string(props, '$.k')",
        EVENTS=events_relation,
        TAB=_TAB,
    )


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``{sf_dir}/events.parquet`` and shape it into transcripts."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("__lc_events_src")
    return spark.sql(transcripts_spark_sql("__lc_events_src"))


def generate_transcripts(
    spark: SparkSession,
    n_rows: int,
    n_convs: int | None = None,
    hot_frac: float = 0.2,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed, seeded transcript corpus of ``n_rows`` turns.

    Fully expression-based over ``spark.range`` — no driver-side loop, no
    Python UDF — so generating 10^7+ rows is a narrow, codegen'd stage.
    ``hot_frac`` of the rows land in one hot conversation (``conv00000000``)
    to model the skew the reference sidesteps via shard hashing
    (plugins/aggregator/shardhash/aggregator_shardhash.go:158-162).
    """
    n_convs = n_convs or max(2, n_rows // 200)
    df = spark.range(0, n_rows, numPartitions=partitions)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    is_hot = (F.pmod(h, F.lit(100)) < F.lit(int(hot_frac * 100))).cast("boolean")
    user = F.when(is_hot, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(n_convs - 1)) + 1
    )
    etype = F.element_at(
        F.array(*(F.lit(t) for t in ["signup", "click", "view", "purchase", "error"])),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(5)) + 1).cast("int"),
    )
    k = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(100))
    base = (
        df.withColumn("event_id", F.col("id"))
        .withColumn("user_id", user)
        .withColumn("event_type", etype)
        .withColumn("props", F.concat(F.lit('{"k": '), k.cast("string"), F.lit("}")))
        # Monotonic-per-user timestamps: 2024-01-01 + id seconds keeps
        # (conv_id, turn_idx) order aligned with ts order.
        .withColumn("ts", F.timestamp_seconds(F.lit(1704067200) + F.col("id")))
        .drop("id")
    )
    base.createOrReplaceTempView("__lc_events_gen")
    out = spark.sql(transcripts_spark_sql("__lc_events_gen"))
    # The turn_idx window shuffles by user_id, which would cluster the hot
    # conversation (hot_frac of ALL rows) into one output partition → one
    # unsplittable parquet file → a guaranteed straggler task on every
    # downstream scan. Round-robin repartition restores uniform file sizes;
    # at real scale this is the Iceberg write-distribution choice.
    if partitions:
        out = out.repartition(partitions)
    return out
