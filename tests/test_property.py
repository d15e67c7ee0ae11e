"""Property-based tests (hypothesis): the pipeline must be TOTAL — any
byte soup in `text` flows through parse → enrich → route without throwing,
lands in exactly the right sinks, and never corrupts other rows. This is
the log-pipeline contract: malformed input is data, not an error."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from loongcollector_spark.plans.transcript_pipeline import TranscriptPipeline

TEXTS = st.lists(
    st.one_of(
        st.text(max_size=60),
        st.text(alphabet="u0123456789\t{}|[]&=:k.eror", max_size=40),
        st.just(""),
        st.none(),
    ),
    min_size=1,
    max_size=50,
)


def _df(spark, texts):
    rows = [
        (f"conv{i % 3}", i, "user", t, "search", "2024-01-01 00:00:00")
        for i, t in enumerate(texts)
    ]
    return (
        spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts_s string",
        )
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )


class TestParseTotality:
    @settings(max_examples=5, deadline=None)
    @given(texts=TEXTS)
    def test_parse_never_throws_and_classifies_every_row(self, spark, texts):
        pipe = TranscriptPipeline()
        out = pipe.enrich(pipe.parse(_df(spark, texts))).collect()
        assert len(out) == len(texts)
        for r in out:
            assert r["grammar"] in {
                "regex", "json", "delim", "apsara", "kv", "unparsed"
            }
            assert r["error_class"] is not None  # always classified

    @settings(max_examples=5, deadline=None)
    @given(texts=TEXTS)
    def test_multicast_partition_of_rows(self, spark, texts):
        """Every row lands in sink_all exactly once; conditional sinks are
        subsets; per-turn text equality is preserved."""
        pipe = TranscriptPipeline()
        df = _df(spark, texts)
        sinks = pipe.run(df)
        all_rows = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in sinks["sink_all"].collect()
        }
        assert len(all_rows) == len(texts)
        orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in df.collect()}
        assert all_rows == orig  # text equality under the key
        for name in ("sink_model", "sink_errors"):
            for r in sinks[name].collect():
                assert (r["conv_id"], r["turn_idx"]) in all_rows
