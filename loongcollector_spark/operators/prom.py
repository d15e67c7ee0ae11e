"""Prometheus inner processors, Spark-first.

* ``prom_parse`` — Prometheus text-exposition parsing
  (core/plugin/processor/inner/ProcessorPromParseMetricNative.cpp via
  core/prometheus/labels/TextParser.cpp): one metric row per sample line
  — name, labels map (``\\"``/``\\\\``/``\\n`` escapes in label values
  unescaped, TextParser.cpp:162-190), double value (``+Inf``/``-Inf``/
  ``NaN`` accepted), optional millisecond timestamp. Comment/blank lines
  drop. Pure built-ins: one anchored regexp per line + regexp_extract_all
  over the label block.

* ``prom_relabel`` — Prometheus relabel_configs
  (core/prometheus/labels/Relabel.cpp:129-250): replace / keep / drop /
  keepequal / dropequal / hashmod / labelmap / labeldrop / labelkeep /
  lowercase / uppercase / dropmetric over a ``labels`` map column
  (``__name__`` is an ordinary label, Prometheus-style). Regexes are
  fully anchored like Prometheus' ``^(?:re)$``. All map surgery is
  higher-order functions; duplicate keys resolve LAST_WIN via the session
  policy.

At 100 TB both are narrow row-local projections/filters — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loongcollector_spark.operators.base import Processor, last_win_entries, register

_NAME_RX = r"[a-zA-Z_:][a-zA-Z0-9_:]*"
_LINE_RX = (
    rf"^({_NAME_RX})\s*(\{{.*\}})?\s*([^\s]+)(?:\s+(-?\d+))?\s*$"
)
_LABEL_PAIR_RX = r'([a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"((?:[^"\\]|\\.)*)"'


def _unescape_label_value(v: Column) -> Column:
    """Prometheus label-value escapes: ``\\\\``, ``\\"``, ``\\n``
    (TextParser.cpp:180-190). Sequential-safe via a placeholder."""
    v = F.replace(v, F.lit("\\\\"), F.lit("\x00"))
    v = F.replace(v, F.lit('\\"'), F.lit('"'))
    v = F.replace(v, F.lit("\\n"), F.lit("\n"))
    return F.replace(v, F.lit("\x00"), F.lit("\\"))


@register("processor_prom_parse_metric_native")
class PromParse(Processor):
    """Parse Prometheus exposition lines in ``SourceKey`` into
    (``name``, ``labels`` incl. ``__name__``, ``value``, ``ts_ms``).

    Unparseable / comment / blank lines are dropped (the reference's
    TextParser skips them and counts OutFailedEventsTotal)."""

    def __init__(
        self,
        SourceKey: str = "content",
        DefaultTsMs: str | None = None,
        KeepSource: bool = False,
    ) -> None:
        self.source_key = SourceKey
        self.default_ts = DefaultTsMs
        self.keep_source = KeepSource

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.trim(F.col(self.source_key))
        ok = src.rlike(_LINE_RX) & ~src.startswith("#") & (src != "")
        name = F.regexp_extract(src, _LINE_RX, 1)
        block = F.regexp_extract(src, _LINE_RX, 2)
        raw_val = F.regexp_extract(src, _LINE_RX, 3)
        raw_ts = F.regexp_extract(src, _LINE_RX, 4)
        value = (
            F.when(raw_val == "+Inf", F.lit(float("inf")))
            .when(raw_val == "-Inf", F.lit(float("-inf")))
            .when(raw_val == "NaN", F.lit(float("nan")))
            .otherwise(raw_val.try_cast("double"))
        )
        keys = F.regexp_extract_all(block, F.lit(_LABEL_PAIR_RX), 1)
        vals = F.transform(
            F.regexp_extract_all(block, F.lit(_LABEL_PAIR_RX), 2),
            _unescape_label_value,
        )
        # entries + explicit last-win dedup: a repeated label key (or an
        # explicit __name__ label) must not throw under the default
        # EXCEPTION mapKeyDedupPolicy
        label_entries = F.concat(
            F.zip_with(
                keys, vals,
                lambda k, v: F.struct(k.alias("key"), v.alias("value")),
            ),
            F.array(
                F.struct(
                    F.lit("__name__").alias("key"), name.alias("value")
                )
            ),
        )
        labels = F.map_from_entries(last_win_entries(label_entries))
        ts = raw_ts.try_cast("long")
        if self.default_ts:
            ts = F.coalesce(ts, F.col(self.default_ts).cast("long"))
        out = (
            df.filter(ok & value.isNotNull())
            .withColumn("name", name)
            .withColumn("labels", labels)
            .withColumn("value", value)
            .withColumn("ts_ms", ts)
        )
        if not self.keep_source:
            out = out.drop(self.source_key)
        return out


def _anchored(regex: str) -> str:
    return f"^(?:{regex})$"


def _get(labels: Column, key) -> Column:
    k = F.lit(key) if isinstance(key, str) else key
    return F.coalesce(F.try_element_at(labels, k), F.lit(""))


def _set(labels: Column, key, value: Column) -> Column:
    k = F.lit(key) if isinstance(key, str) else key
    return F.map_concat(
        F.map_filter(labels, lambda mk, _: mk != k),
        F.create_map(k, value),
    )


def _del(labels: Column, key) -> Column:
    k = F.lit(key) if isinstance(key, str) else key
    return F.map_filter(labels, lambda mk, _: mk != k)


@register("processor_prom_relabel_metric_native")
class PromRelabel(Processor):
    """Apply a relabel_configs list to a ``labels`` map column.

    Each config: {action, source_labels, separator=';', regex='(.*)',
    target_label, replacement='$1', modulus, match_list}. Semantics per
    Relabel.cpp:129-250; Prometheus's ``$1`` capture interpolation works
    natively in Spark's regexp_replace. keep/drop/dropmetric filter rows;
    everything else rewrites the map in place.
    """

    def __init__(self, RelabelConfigs: list[dict], LabelsKey: str = "labels"):
        import re as _re

        self.configs = []
        for c in RelabelConfigs:
            cfg = {
                "action": c.get("action", "replace").lower(),
                "source_labels": c.get("source_labels", []),
                "separator": c.get("separator", ";"),
                "regex": c.get("regex", "(.*)"),
                "target_label": c.get("target_label", ""),
                "replacement": c.get("replacement", "$1"),
                "modulus": c.get("modulus", 0),
                "match_list": c.get("match_list", []),
            }
            _re.compile(cfg["regex"])  # fail fast at config time
            self.configs.append(cfg)
        self.labels_key = LabelsKey

    def __call__(self, df: DataFrame) -> DataFrame:
        for cfg in self.configs:
            df = self._apply_one(df, cfg)
        return df

    def _apply_one(self, df: DataFrame, cfg: dict) -> DataFrame:
        labels = F.col(self.labels_key)
        rx = _anchored(cfg["regex"])
        val = F.array_join(
            F.transform(
                F.array(*[F.lit(s) for s in cfg["source_labels"]]),
                lambda s: _get(labels, s),
            ),
            cfg["separator"],
        ) if cfg["source_labels"] else F.lit("")
        act = cfg["action"]
        if act == "keep":
            return df.filter(val.rlike(rx))
        if act == "drop":
            return df.filter(~val.rlike(rx))
        if act == "keepequal":
            return df.filter(_get(labels, cfg["target_label"]) == val)
        if act == "dropequal":
            return df.filter(_get(labels, cfg["target_label"]) != val)
        if act == "dropmetric":
            return df.filter(
                ~_get(labels, "__name__").isin(*cfg["match_list"])
            )
        if act == "replace":
            matched = val.rlike(rx)
            target = F.regexp_replace(val, rx, cfg["target_label"])
            res = F.regexp_replace(val, rx, cfg["replacement"])
            new_labels = (
                F.when(matched & (res == ""), _del(labels, target))
                .when(matched, _set(labels, target, res))
                .otherwise(labels)
            )
            return df.withColumn(self.labels_key, new_labels)
        if act in ("lowercase", "uppercase"):
            fn = F.lower if act == "lowercase" else F.upper
            return df.withColumn(
                self.labels_key, _set(labels, cfg["target_label"], fn(val))
            )
        if act == "hashmod":
            # last 8 bytes of md5(val) as uint64 % modulus (Relabel.cpp:
            # 195-205) — decimal(20,0) holds the full unsigned range
            h = F.conv(F.substring(F.md5(val), 17, 16), 16, 10).cast(
                "decimal(20,0)"
            )
            mod = F.pmod(h, F.lit(cfg["modulus"])).cast("long").cast("string")
            return df.withColumn(
                self.labels_key, _set(labels, cfg["target_label"], mod)
            )
        if act == "labelmap":
            mapped_entries = F.transform(
                F.filter(
                    F.map_entries(labels), lambda e: e["key"].rlike(rx)
                ),
                lambda e: F.struct(
                    F.regexp_replace(
                        e["key"], rx, cfg["replacement"]
                    ).alias("key"),
                    e["value"].alias("value"),
                ),
            )
            # existing ++ mapped with explicit last-win dedup — two source
            # keys can map to one target, and targets can collide with
            # existing labels; must not depend on session dedup policy
            return df.withColumn(
                self.labels_key,
                F.map_from_entries(
                    last_win_entries(
                        F.concat(F.map_entries(labels), mapped_entries)
                    )
                ),
            )
        if act == "labeldrop":
            return df.withColumn(
                self.labels_key,
                F.map_filter(labels, lambda k, _: ~k.rlike(rx)),
            )
        if act == "labelkeep":
            return df.withColumn(
                self.labels_key,
                F.map_filter(labels, lambda k, _: k.rlike(rx)),
            )
        raise ValueError(f"unknown relabel action: {act}")
