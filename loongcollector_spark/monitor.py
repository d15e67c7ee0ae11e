"""Self-monitor metrics: the reference's per-plugin counters, Spark-native.

Every reference plugin maintains counters (mInEventsTotal,
mOutSuccessfulEventsTotal, mDiscardedEventsTotal, ... —
core/monitor/metric_constants/MetricConstants.h:80-171,
ProcessorParseRegexNative.h:64-67). The Spark-native equivalents:

* ``Observation`` (``df.observe``) — zero-cost aggregates computed during
  the action that already runs, no extra job. Used for per-stage
  in/out/discard counts.
* the per-sink ``sink_metrics`` tables (aggregators.py) — the durable,
  queryable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class StageMonitor:
    """Attach named observations to pipeline stages; read after an action.

    Usage::

        mon = StageMonitor()
        df = mon.observe(df, "parse", error_class_col="error_class")
        df.write...   # action
        mon.results() # {'parse': {'in_events_total': ..., ...}}
    """

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def observe(
        self,
        df: DataFrame,
        stage: str,
        text_col: str | None = "text",
        error_class_col: str | None = None,
    ) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("in_events_total")]
        if text_col and text_col in df.columns:
            aggs.append(
                F.coalesce(F.sum(F.octet_length(F.col(text_col))), F.lit(0)).alias(
                    "in_bytes_total"
                )
            )
        if error_class_col and error_class_col in df.columns:
            aggs.append(
                F.count(F.when(F.col(error_class_col) != "", 1)).alias(
                    "discarded_events_total"
                )
            )
            aggs.append(
                F.count(F.when(F.coalesce(F.col(error_class_col), F.lit("")) == "", 1))
                .alias("out_successful_events_total")
            )
        obs = Observation(stage)
        self._obs[stage] = obs
        return df.observe(obs, *aggs)

    def results(self) -> dict[str, dict]:
        return {name: obs.get for name, obs in self._obs.items()}
