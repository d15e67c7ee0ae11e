"""The flagship job: parse → enrich → route → aggregate over transcripts.

This is the single end-to-end slice of SURVEY.md §7 Stage 1, exercising
every operator category:

1. **parse** — anchored dispatch over the five payload grammars
   (regex / JSON / delimiter / apsara / key-value), first match wins —
   the multi-``Match`` fallback semantics of processor_grok
   (plugins/processor/grok/processor_grok.go:148-194) expressed as one
   codegen'd ``CASE WHEN`` chain of built-in functions. No UDF: at
   10^12 rows the parse stage must stay inside whole-stage codegen.
2. **enrich** — broadcast dict-map joins (tool→tool_class,
   role→role_class), reference processor_dict_map semantics.
3. **route** — multicast tag router (Router.cpp:50-82): sink A
   (role_class == 'model'), sink B (error_class != ''), sink C
   (unconditional) — A/B rows also land in C.
4. **aggregate** — per-sink counters keyed by (conv_id prefix, hour
   bucket): counts, byte volumes, error-class histogram — the
   reference's self-monitor counters per sink.

Every stage has an equivalent DuckDB SQL (``oracle_*`` functions) over
the same ``events`` parquet, giving the driver a full value-level
correctness oracle for the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loongcollector_spark.aggregators import sink_metrics_flat
from loongcollector_spark.operators.enrich import DictMap
from loongcollector_spark.routing import Route, Router, TagCondition, ExprCondition
from loongcollector_spark.sources.transcripts import (
    transcripts_duckdb_sql,
    transcripts_from_events,
)

# ---------------------------------------------------------------------------
# Grammar patterns (shared between the Spark plan and the DuckDB oracle —
# both RE2 and Java regex read these identically; no SQL-literal escaping
# issues because the Spark side passes them through the Python API).
PAT_REGEX = r"^(u\d+)\t(\w+)\tk=(\d+)$"
PAT_DELIM = r"^(\d+\.\d+\.\d+\.\d+)\|([A-Z]+)\|(\d+)$"
PAT_APSARA = r"^\[(\d+)\]\t\[(\w+)\]\t\[(\d+)\]\t\[([^\]]*):(\d+)\]\t"
PAT_KV = r"^user=(u\d+)&etype=([a-z]+)&k=(\d+)$"

TOOL_CLASS_DICT = {
    "search": "retrieval",
    "code": "execution",
    "browser": "web",
    "db": "storage",
    # 'none' deliberately unmapped → HandleMissing/Missing semantics
}
ROLE_CLASS_DICT = {
    "user": "human",
    "assistant": "model",
    "system": "meta",
    "tool": "machine",
}


class TranscriptPipeline:
    """parse → enrich → route → aggregate, built-ins only."""

    SINKS = ("sink_model", "sink_errors", "sink_all")

    def __init__(self, conv_prefix_len: int = 6):
        self.conv_prefix_len = conv_prefix_len
        self.router = Router(
            [
                Route("sink_model", TagCondition("role_class", "model")),
                Route("sink_errors", ExprCondition("error_class <> ''")),
                Route("sink_all", None),  # unconditional — multicast target
            ]
        )

    # -- parse ---------------------------------------------------------
    def parse(self, df: DataFrame) -> DataFrame:
        """Anchored dispatch: regex → JSON → delimiter → apsara → kv.

        Performance shape (measured at 2M rows, local[32]): each grammar
        pattern is matched ONCE per row (`rlike` is cheap); field
        extraction then rides a single `split`/`str_to_map`/`from_json`
        per matching grammar instead of per-field `regexp_extract`
        (which re-runs the whole match per column) — and crucially the
        JSON path parses Jackson exactly once, gated on a `{` prefix:
        `get_json_object` on non-JSON rows burns ~40µs/row in internal
        exceptions. This formulation is ~10× faster than the naive
        per-field CASE of extracts and stays in whole-stage codegen.
        """
        t = F.col("text")
        is_regex = t.rlike(PAT_REGEX)
        is_delim = t.rlike(PAT_DELIM)
        is_apsara = t.rlike(PAT_APSARA)
        is_kv = t.rlike(PAT_KV)

        # Single Jackson parse per {-prefixed row; null struct on malformed
        # or non-object input (mirrors json_valid + $.etype check).
        json_struct = F.when(
            t.startswith("{"),
            F.from_json(t, "user string, etype string, k string"),
        )
        base = df.withColumns(
            {
                "__tab__": F.when(is_regex | is_apsara, F.split(t, "\t", -1)),
                "__pipe__": F.when(is_delim, F.split(t, r"\|", -1)),
                "__kvmap__": F.when(is_kv, F.str_to_map(t, F.lit("&"), F.lit("="))),
                "__json__": json_struct,
                "__is_regex__": is_regex,
                "__is_delim__": is_delim,
                "__is_apsara__": is_apsara,
                "__is_kv__": is_kv,
            }
        )
        tab = F.col("__tab__")
        pipe = F.col("__pipe__")
        kvm = F.col("__kvmap__")
        js = F.col("__json__")
        is_regex = F.col("__is_regex__")
        is_delim = F.col("__is_delim__")
        is_apsara = F.col("__is_apsara__")
        is_kv = F.col("__is_kv__")
        is_json = js.isNotNull() & js["etype"].isNotNull()

        def el(arr, i):
            return F.try_element_at(arr, F.lit(i))

        grammar = (
            F.when(is_regex, F.lit("regex"))
            .when(is_json, F.lit("json"))
            .when(is_delim, F.lit("delim"))
            .when(is_apsara, F.lit("apsara"))
            .when(is_kv, F.lit("kv"))
            .otherwise(F.lit("unparsed"))
        )
        # regex grammar u<id>\t<etype>\tk=<k>: the anchored rlike validated
        # the shape, so tab fields ARE the capture groups.
        parsed_user = (
            F.when(is_regex, el(tab, 1))
            .when(is_json, js["user"])
            .when(is_apsara, F.regexp_extract(t, r"user:(u\d+)", 1))
            .when(is_kv, F.try_element_at(kvm, F.lit("user")))
        )
        etype = (
            F.when(is_regex, el(tab, 2))
            .when(is_json, js["etype"])
            .when(is_delim, F.lower(el(pipe, 2)))
            .when(is_apsara, F.regexp_extract(t, r"etype:([a-z]+)", 1))
            .when(is_kv, F.try_element_at(kvm, F.lit("etype")))
        )
        status = F.when(is_delim, el(pipe, 3))
        # apsara level: 2nd bracketed field '[LEVEL]' → strip brackets
        lvl_raw = el(tab, 2)
        level = F.when(
            is_apsara, F.substring(lvl_raw, 2, F.length(lvl_raw) - F.lit(2))
        )
        k_val = (
            F.when(is_regex, F.substring(el(tab, 3), 3, 1_000_000))
            .when(is_json, js["k"])
            .when(is_kv, F.try_element_at(kvm, F.lit("k")))
        )
        out = base.withColumns(
            {
                "grammar": grammar,
                "parsed_user": parsed_user,
                "etype": etype,
                "status": status,
                "level": level,
                "k_val": k_val,
            }
        )
        error_class = (
            F.when(F.col("grammar") == "unparsed", F.lit("parse_fail"))
            .when(F.col("status") == "500", F.lit("http_500"))
            .when(F.col("level") == "ERROR", F.lit("app_error"))
            .otherwise(F.lit(""))
        )
        return out.withColumn("error_class", error_class).drop(
            "__tab__", "__pipe__", "__kvmap__", "__json__",
            "__is_regex__", "__is_delim__", "__is_apsara__", "__is_kv__",
        )

    # -- enrich ----------------------------------------------------------
    def enrich(self, df: DataFrame) -> DataFrame:
        tool_map = DictMap(
            SourceKey="tool",
            DestKey="tool_class",
            MapDict=TOOL_CLASS_DICT,
            HandleMissing=False,  # 'none' rows keep NULL tool_class... see below
        )
        role_map = DictMap(
            SourceKey="role", DestKey="role_class", MapDict=ROLE_CLASS_DICT
        )
        out = role_map(tool_map(df))
        # reference HandleMissing=true twin: unmapped tool → 'Unknown'
        return out.withColumn(
            "tool_class", F.coalesce(F.col("tool_class"), F.lit("Unknown"))
        )

    # -- route -----------------------------------------------------------
    def route(self, df: DataFrame) -> dict[str, DataFrame]:
        return self.router.route(df)

    # -- aggregate ---------------------------------------------------------
    def metrics(self, sinks: dict[str, DataFrame]) -> DataFrame:
        """Per-sink flat metrics rows.

        r6 (guide §2.1 — remove repeated passes): when the dict is the
        router's standard fan-out (exactly the ``SINKS`` keys), the
        N-sink union of :func:`sink_metrics_flat` aggregations — each of
        which re-ran the parse/enrich lineage (or re-scanned the route
        cache) — collapses into ONE pass: ``sink_all`` is the
        unconditional route (row-identical to the shared parent) and the
        exploded multicast reproduces every sink's row set (pinned by
        tests), so one grouped-by-sink aggregation over
        ``route_multicast_exploded(sink_all)`` yields the identical row
        multiset. Measured: 4 aggregation passes → 1 on the bench's
        sf-transcripts row. A custom dict (different keys) keeps the
        general per-frame union path."""
        if set(sinks) == set(self.SINKS):
            return self.metrics_single_pass(
                self.router.route_multicast_exploded(sinks["sink_all"])
            )
        parts = [
            sink_metrics_flat(df, name, prefix_len=self.conv_prefix_len)
            for name, df in sinks.items()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- end to end ---------------------------------------------------------
    def run(self, transcripts: DataFrame) -> dict[str, DataFrame]:
        parsed = self.parse(transcripts)
        enriched = self.enrich(parsed)
        sinks = self.route(enriched)
        # fused metrics (r5): per-sink row sets equal the exploded
        # multicast's (tested), so the per-sink aggregates come from ONE
        # scan of the cached parent + ONE shuffle over the exploded
        # frame instead of metrics()'s 3 cache scans + 3 unioned
        # aggregations. sink_all is the unconditional route == the
        # cached parent itself.
        sinks["__metrics__"] = self.metrics_single_pass(
            self.router.route_multicast_exploded(sinks["sink_all"])
        )
        return sinks

    def run_on_events(self, spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
        return self.run(transcripts_from_events(spark, sf_dir))

    # -- single-pass physical strategy ------------------------------------
    def run_single_pass(self, transcripts: DataFrame) -> DataFrame:
        """One-scan multicast: returns the exploded routed frame
        (one row per (turn, matching sink), ``__sink__`` column). Row sets
        per sink are identical to ``run()``'s; physically this is a single
        codegen stage feeding one (partitioned) write — no cache, no
        repeated scans. Preferred at scale when sinks share a format."""
        enriched = self.enrich(self.parse(transcripts))
        return self.router.route_multicast_exploded(enriched)

    def metrics_single_pass(self, routed: DataFrame) -> DataFrame:
        """Per-sink aggregates off the exploded frame — one aggregation
        for ALL sinks (bounded keys: sink × conv_prefix × hour)."""
        return (
            routed.groupBy(
                F.col("__sink__").alias("sink"),
                F.substring(F.col("conv_id"), 1, self.conv_prefix_len).alias(
                    "conv_prefix"
                ),
                F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
                F.coalesce(F.col("error_class"), F.lit("")).alias("error_class"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.octet_length(F.col("text"))).alias("n_bytes"),
            )
            .select("conv_prefix", "ts_hour", "error_class", "n_rows", "n_bytes", "sink")
        )

    # -- snapshot-sourced metrics (the 10^12-turn strategy) ----------------
    def write_routed(self, routed: DataFrame, path: str) -> None:
        """The real sink write: one partitioned columnar commit of the
        exploded routed frame (``partitionBy(__sink__)`` — each sink is
        a partition directory, the parquet stand-in for the per-sink
        Iceberg tables of the north star)."""
        routed.write.partitionBy("__sink__").mode("overwrite").parquet(path)

    def metrics_from_snapshot(self, spark: SparkSession, path: str) -> DataFrame:
        """Per-sink metrics aggregated from the WRITTEN snapshot instead
        of a second pass over raw text.

        At 10^12 turns the metrics pass is the difference between
        re-running the whole parse (4 anchored regexes + a Jackson
        parse per row, the most expensive stage) and a columnar scan of
        exactly the five columns the aggregation needs — Catalyst
        prunes ``ReadSchema`` to (conv_id, ts, error_class, text) plus
        the ``__sink__`` partition value, and partition pruning gives
        per-sink metrics without touching other sinks' files. This is
        also the exactly-once story: metrics computed from the
        committed snapshot describe precisely the rows that were
        durably written, so a retried/partial job can never publish
        counters that disagree with the table contents (the reference's
        flusher self-monitor counts what it shipped, not what it saw:
        plugins/flusher self-monitor semantics)."""
        return self.metrics_single_pass(spark.read.parquet(path))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL — independent recomputation of each stage for the
# driver's correctness gate. RE2 regexes; same patterns as above.

_PARSED_TEMPLATE = """
WITH transcripts AS ({transcripts}),
parsed AS (
  SELECT *,
    CASE
      WHEN regexp_matches(text, '{p_regex}') THEN 'regex'
      WHEN json_valid(text) AND text LIKE '{{%' AND json_extract_string(text, '$.etype') IS NOT NULL THEN 'json'
      WHEN regexp_matches(text, '{p_delim}') THEN 'delim'
      WHEN regexp_matches(text, '{p_apsara}') THEN 'apsara'
      WHEN regexp_matches(text, '{p_kv}') THEN 'kv'
      ELSE 'unparsed'
    END AS grammar
  FROM transcripts
),
extracted AS (
  SELECT *,
    CASE grammar
      WHEN 'regex' THEN regexp_extract(text, '{p_regex}', 1)
      WHEN 'json' THEN json_extract_string(text, '$.user')
      WHEN 'apsara' THEN regexp_extract(text, 'user:(u\\d+)', 1)
      WHEN 'kv' THEN regexp_extract(text, '{p_kv}', 1)
    END AS parsed_user,
    CASE grammar
      WHEN 'regex' THEN regexp_extract(text, '{p_regex}', 2)
      WHEN 'json' THEN json_extract_string(text, '$.etype')
      WHEN 'delim' THEN lower(regexp_extract(text, '{p_delim}', 2))
      WHEN 'apsara' THEN regexp_extract(text, 'etype:([a-z]+)', 1)
      WHEN 'kv' THEN regexp_extract(text, '{p_kv}', 2)
    END AS etype,
    CASE grammar WHEN 'delim' THEN regexp_extract(text, '{p_delim}', 3) END AS status,
    CASE grammar WHEN 'apsara' THEN regexp_extract(text, '{p_apsara}', 2) END AS level,
    CASE grammar
      WHEN 'regex' THEN regexp_extract(text, '{p_regex}', 3)
      WHEN 'json' THEN json_extract_string(text, '$.k')
      WHEN 'kv' THEN regexp_extract(text, '{p_kv}', 3)
    END AS k_val
  FROM parsed
),
with_err AS (
  SELECT *,
    CASE
      WHEN grammar = 'unparsed' THEN 'parse_fail'
      WHEN status = '500' THEN 'http_500'
      WHEN level = 'ERROR' THEN 'app_error'
      ELSE ''
    END AS error_class
  FROM extracted
),
enriched AS (
  SELECT *,
    CASE tool WHEN 'search' THEN 'retrieval' WHEN 'code' THEN 'execution'
         WHEN 'browser' THEN 'web' WHEN 'db' THEN 'storage'
         ELSE 'Unknown' END AS tool_class,
    CASE role WHEN 'user' THEN 'human' WHEN 'assistant' THEN 'model'
         WHEN 'system' THEN 'meta' WHEN 'tool' THEN 'machine' END AS role_class
  FROM with_err
)
"""


def oracle_enriched_sql(events_relation: str = "events") -> str:
    """CTE prefix ending in the fully parsed+enriched relation ``enriched``."""
    # duckdb regexes: \d must survive as backslash-d; the template uses
    # doubled backslashes only where the template itself is written, the
    # PAT_* constants are raw and inserted verbatim.
    return _PARSED_TEMPLATE.format(
        transcripts=transcripts_duckdb_sql(events_relation),
        p_regex=PAT_REGEX.replace("'", "''"),
        p_delim=PAT_DELIM,
        p_apsara=PAT_APSARA.replace("'", "''"),
        p_kv=PAT_KV,
    )


_SINK_WHERE = {
    "sink_model": "role_class = 'model'",
    "sink_errors": "error_class <> ''",
    "sink_all": "TRUE",
}


def oracle_sink_rows_sql(sink: str, events_relation: str = "events") -> str:
    """Routed rows of one sink, stable (conv_id, turn_idx) order columns."""
    return (
        oracle_enriched_sql(events_relation)
        + f"""
SELECT conv_id, turn_idx, role, text, tool, ts, grammar, parsed_user,
       etype, error_class, tool_class, role_class
FROM enriched WHERE {_SINK_WHERE[sink]}
"""
    )


def oracle_metrics_sql(events_relation: str = "events") -> str:
    """Per-sink flat aggregates across all three sinks (multicast)."""
    parts = []
    for sink, where in _SINK_WHERE.items():
        parts.append(
            f"""
SELECT substr(conv_id, 1, 6) AS conv_prefix,
       date_trunc('hour', ts) AS ts_hour,
       error_class,
       count(*) AS n_rows,
       CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes,
       '{sink}' AS sink
FROM enriched WHERE {where}
GROUP BY 1, 2, 3"""
        )
    return oracle_enriched_sql(events_relation) + " UNION ALL ".join(parts)
