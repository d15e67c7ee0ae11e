"""Parser fixture parity tests — ported from the reference unit tests
(core/unittest/processor/*, FIXTURES.md §2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.parsers import (
    ParseApsaraNative,
    ParseDelimiterNative,
    ParseJsonNative,
    ParseRegexNative,
    ParseTimestampNative,
    SplitKeyValue,
)
from tests.conftest import rows_as_dicts


class TestParseRegex:
    """ProcessorParseRegexNativeUnittest.cpp:154-228 fixture shapes."""

    def test_basic_extract(self, text_df_factory):
        df = text_df_factory(["value1\tvalue2", "value3value4"])
        proc = ParseRegexNative(
            SourceKey="content", Regex=r"(\w+)\t(\w+).*", Keys=["key1", "key2"]
        )
        rows = rows_as_dicts(proc(df))
        # unmatched row dropped (keep_fail default false)
        assert len(rows) == 1
        assert rows[0]["key1"] == "value1" and rows[0]["key2"] == "value2"

    def test_keep_fail_rename_raw_log(self, text_df_factory):
        df = text_df_factory(["value1\tvalue2", "value3value4"])
        proc = ParseRegexNative(
            SourceKey="content",
            Regex=r"(\w+)\t(\w+).*",
            Keys=["key1", "key2"],
            KeepingSourceWhenParseFail=True,
            RenamedSourceKey="rawLog",
            CopingRawLog=True,
        )
        rows = rows_as_dicts(proc(df))
        assert len(rows) == 2
        ok_row, fail_row = rows
        assert ok_row["key1"] == "value1"
        assert ok_row["rawLog"] is None  # keep_succeed default false
        assert fail_row["key1"] is None
        assert fail_row["rawLog"] == "value3value4"
        assert fail_row["__raw_log__"] == "value3value4"

    def test_keep_succeed(self, text_df_factory):
        df = text_df_factory(["a\tb"])
        proc = ParseRegexNative(
            SourceKey="content",
            Regex=r"(\w+)\t(\w+)",
            Keys=["k1", "k2"],
            KeepingSourceWhenParseSucceed=True,
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["content"] == "a\tb"

    def test_whole_line_fast_path(self, text_df_factory):
        df = text_df_factory(["anything at all"])
        proc = ParseRegexNative(SourceKey="content", Regex="(.*)", Keys=["message"])
        rows = rows_as_dicts(proc(df))
        assert rows[0]["message"] == "anything at all"

    def test_comma_joined_keys(self, text_df_factory):
        """ProcessorParseRegexNative.cpp:86-88 single comma-joined key."""
        df = text_df_factory(["x y"])
        proc = ParseRegexNative(
            SourceKey="content", Regex=r"(\w+) (\w+)", Keys=["a,b"]
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["a"] == "x" and rows[0]["b"] == "y"

    def test_full_match_semantics(self, text_df_factory):
        """boost::regex_match = full match: pattern without trailing .*
        must NOT match a longer line."""
        df = text_df_factory(["ab extra"])
        proc = ParseRegexNative(SourceKey="content", Regex=r"(\w+)", Keys=["k"])
        assert proc(df).count() == 0

    def test_python_engine_parity(self, text_df_factory):
        df = text_df_factory(["value1\tvalue2", "nope"])
        proc = ParseRegexNative(
            SourceKey="content",
            Regex=r"(\w+)\t(\w+)",
            Keys=["k1", "k2"],
            Engine="python",
        )
        rows = rows_as_dicts(proc(df))
        assert len(rows) == 1 and rows[0]["k1"] == "value1"


class TestParseJson:
    FIXTURE = '{"k1":"v1","k2":2,"k3":2.5,"k4":true,"k5":null,"k6":{"a":1},"k7":[1,2]}'

    def test_native_value_stringification(self, text_df_factory):
        """ProcessorParseJsonNative.cpp:379-403 exact stringification."""
        df = text_df_factory([self.FIXTURE])
        proc = ParseJsonNative(SourceKey="content", Engine="native")
        rows = rows_as_dicts(proc(df))
        m = rows[0]["parsed"]
        assert m["k1"] == "v1"
        assert m["k2"] == "2"
        assert m["k3"] == "2.500000"
        assert m["k4"] == "true"
        assert m["k5"] == ""
        assert m["k6"] == '{"a":1}'
        assert m["k7"] == "[1,2]"

    def test_native_keys_mode(self, text_df_factory):
        df = text_df_factory([self.FIXTURE, "not json"])
        proc = ParseJsonNative(
            SourceKey="content", Keys=["k1", "k4", "missing"], Engine="native"
        )
        rows = rows_as_dicts(proc(df))
        assert len(rows) == 1
        assert rows[0]["k1"] == "v1"
        assert rows[0]["k4"] == "true"
        assert rows[0]["missing"] == ""

    def test_jvm_mode(self, text_df_factory):
        df = text_df_factory(['{"a":"x","b":1}', "[1,2]", "junk"])
        proc = ParseJsonNative(SourceKey="content", Keys=["a", "b"])
        rows = rows_as_dicts(proc(df))
        assert len(rows) == 1  # array + junk rejected (top level must be object)
        assert rows[0]["a"] == "x" and rows[0]["b"] == "1"

    def test_fail_matrix(self, text_df_factory):
        df = text_df_factory(["{broken"])
        proc = ParseJsonNative(
            SourceKey="content",
            Keys=["a"],
            KeepingSourceWhenParseFail=True,
            RenamedSourceKey="rawLog",
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["rawLog"] == "{broken" and rows[0]["a"] is None


class TestParseDelimiter:
    def test_basic(self, text_df_factory):
        df = text_df_factory(["127.0.0.1|POST|200"])
        proc = ParseDelimiterNative(
            SourceKey="content", Separator="|", Keys=["ip", "method", "status"]
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["ip"] == "127.0.0.1"
        assert rows[0]["method"] == "POST"
        assert rows[0]["status"] == "200"

    def test_underflow(self, text_df_factory):
        df = text_df_factory(["a|b"])
        strict = ParseDelimiterNative(
            SourceKey="content", Separator="|", Keys=["x", "y", "z"]
        )
        assert strict(df).count() == 0
        lax = ParseDelimiterNative(
            SourceKey="content",
            Separator="|",
            Keys=["x", "y", "z"],
            AllowingShortenedFields=True,
        )
        rows = rows_as_dicts(lax(df))
        assert rows[0]["x"] == "a" and rows[0]["y"] == "b" and rows[0]["z"] is None

    def test_overflow_extend(self, text_df_factory):
        """extra field at absolute index i → __column{i}__
        (ProcessorParseDelimiterNative.cpp AddLog overflow path)."""
        df = text_df_factory(["a|b|c|d|e"])
        proc = ParseDelimiterNative(
            SourceKey="content",
            Separator="|",
            Keys=["x", "y", "z"],
            OverflowedFieldsTreatment="extend",
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["__column3__"] == "d"
        assert rows[0]["__column4__"] == "e"

    def test_overflow_keep(self, text_df_factory):
        """rest (separator-prefixed, unsplit) → __column{nk}__
        (SplitString early-exit .cpp:398-402)."""
        df = text_df_factory(["a|b|c|d|e"])
        proc = ParseDelimiterNative(
            SourceKey="content",
            Separator="|",
            Keys=["x", "y", "z"],
            OverflowedFieldsTreatment="keep",
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["__column3__"] == "|d|e"
        assert "__column4__" not in rows[0]

    def test_overflow_discard_and_partial(self, text_df_factory):
        df = text_df_factory(["a|b|c|d|e"])
        proc = ParseDelimiterNative(
            SourceKey="content",
            Separator="|",
            Keys=["x", "_", "z"],
            OverflowedFieldsTreatment="discard",
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["x"] == "a" and rows[0]["z"] == "c"
        assert "_" not in rows[0] and "__column3__" not in rows[0]

    def test_quote_fsm(self, text_df_factory):
        df = text_df_factory(['"a|b"|c'])
        proc = ParseDelimiterNative(
            SourceKey="content", Separator="|", Quote='"', Keys=["x", "y"]
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["x"] == "a|b" and rows[0]["y"] == "c"

    def test_multichar_separator(self, text_df_factory):
        df = text_df_factory(["a&&b&&c"])
        proc = ParseDelimiterNative(
            SourceKey="content", Separator="&&", Keys=["x", "y", "z"]
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["y"] == "b"


class TestParseApsara:
    LINE = (
        "[2024-01-05 12:13:14.123456]\t[WARNING]\t[1234]\t[/path/file.cpp:120]"
        "\tkey1:value1\tkey2:value2"
    )

    def test_datetime_form(self, text_df_factory):
        df = text_df_factory([self.LINE])
        proc = ParseApsaraNative(SourceKey="content")
        rows = rows_as_dicts(proc(df))
        r = rows[0]
        assert r["__LEVEL__"] == "WARNING"
        assert r["__THREAD__"] == "1234"
        assert r["__FILE__"] == "/path/file.cpp"
        assert r["__LINE__"] == "120"
        assert r["apsara_kv"]["key1"] == "value1"
        assert r["apsara_kv"]["key2"] == "value2"
        assert r["microtime"] == "1704456794123456"

    def test_epoch_form(self, text_df_factory):
        df = text_df_factory(["[1378882630]\t[INFO]\t[99]\t[f.cpp:1]\ta:b"])
        proc = ParseApsaraNative(SourceKey="content")
        rows = rows_as_dicts(proc(df))
        assert rows[0]["microtime"] == "1378882630000000"

    def test_value_with_colon(self, text_df_factory):
        """First ':' is the separator; the value may contain more colons
        (.cpp:220-221)."""
        df = text_df_factory(["[1378882630]\t[INFO]\t[99]\t[f.cpp:1]\turl:http://x:8080"])
        proc = ParseApsaraNative(SourceKey="content")
        rows = rows_as_dicts(proc(df))
        assert rows[0]["apsara_kv"]["url"] == "http://x:8080"


class TestParseTimestamp:
    def test_strptime(self, text_df_factory):
        df = text_df_factory(["2024-01-05 12:13:14"])
        proc = ParseTimestampNative(
            SourceKey="content", SourceFormat="%Y-%m-%d %H:%M:%S", DestKey="t"
        )
        rows = rows_as_dicts(proc(df))
        assert str(rows[0]["t"]) == "2024-01-05 12:13:14"

    def test_epoch(self, text_df_factory):
        df = text_df_factory(["1704456794"])
        proc = ParseTimestampNative(SourceKey="content", SourceFormat="%s", DestKey="t")
        rows = rows_as_dicts(proc(df))
        assert rows[0]["t"] is not None

    def test_epoch_ignores_source_timezone(self, text_df_factory):
        """Epoch seconds are timezone-absolute: a non-UTC SourceTimezone
        must NOT shift the %s path (only wall-clock formats need it)."""
        df = text_df_factory(["1704456794"])
        utc = ParseTimestampNative(
            SourceKey="content", SourceFormat="%s", DestKey="t"
        )
        sh = ParseTimestampNative(
            SourceKey="content",
            SourceFormat="%s",
            SourceTimezone="Asia/Shanghai",
            DestKey="t",
        )
        a = rows_as_dicts(utc(df))[0]["t"]
        b = rows_as_dicts(sh(df))[0]["t"]
        assert a == b

    def test_bad_input_null_not_error(self, text_df_factory):
        """ANSI-safe: unparseable time yields NULL, never a job abort."""
        df = text_df_factory(["nonsense"])
        proc = ParseTimestampNative(
            SourceKey="content",
            SourceFormat="%Y-%m-%d",
            DestKey="t",
            ErrorClassKey="ec",
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["t"] is None and rows[0]["ec"] == "time_parse_fail"


class TestSplitKeyValue:
    def test_basic(self, text_df_factory):
        df = text_df_factory(["a=1&b=2&c=3"])
        proc = SplitKeyValue(SourceKey="content", Delimiter="&", Separator="=")
        rows = rows_as_dicts(proc(df))
        assert rows[0]["kv"] == {"a": "1", "b": "2", "c": "3"}

    def test_no_separator_prefix(self, text_df_factory):
        """key_value_splitter.go:112-123 — pairs lacking the separator
        become {NoSeparatorKeyPrefix}{i}, counter over such pairs only."""
        df = text_df_factory(["a=1&orphan&b=2&other"])
        proc = SplitKeyValue(SourceKey="content", Delimiter="&", Separator="=")
        rows = rows_as_dicts(proc(df))
        assert rows[0]["kv"] == {
            "a": "1",
            "no_separator_key_0": "orphan",
            "b": "2",
            "no_separator_key_1": "other",
        }

    def test_empty_key_prefix(self, text_df_factory):
        """go:125-133 — separator-first pairs get {EmptyKeyPrefix}{i}."""
        df = text_df_factory(["=v0&a=1&=v1"])
        proc = SplitKeyValue(SourceKey="content", Delimiter="&", Separator="=")
        rows = rows_as_dicts(proc(df))
        assert rows[0]["kv"] == {
            "empty_key_0": "v0",
            "a": "1",
            "empty_key_1": "v1",
        }

    def test_duplicate_keys_last_win_under_exception_policy(
        self, spark, text_df_factory
    ):
        """ADVICE r2: 'a=1&a=2' must resolve last-win even when the
        session runs Spark's default EXCEPTION dedup policy."""
        old = spark.conf.get("spark.sql.mapKeyDedupPolicy")
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
        try:
            df = text_df_factory(["a=1&a=2&b=3"])
            proc = SplitKeyValue(SourceKey="content", Delimiter="&", Separator="=")
            rows = rows_as_dicts(proc(df))
            assert rows[0]["kv"] == {"a": "2", "b": "3"}
        finally:
            spark.conf.set("spark.sql.mapKeyDedupPolicy", old)

    def test_discard_when_separator_not_found(self, text_df_factory):
        df = text_df_factory(["a=1&orphan&b=2"])
        proc = SplitKeyValue(
            SourceKey="content",
            Delimiter="&",
            Separator="=",
            DiscardWhenSeparatorNotFound=True,
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["kv"] == {"a": "1", "b": "2"}

    def test_quote_unwrap(self, text_df_factory):
        """go:185-191 — values wrapped in Quote are unwrapped."""
        df = text_df_factory(['a="hello"&b=plain&c=""'])
        proc = SplitKeyValue(
            SourceKey="content", Delimiter="&", Separator="=", Quote='"'
        )
        rows = rows_as_dicts(proc(df))
        assert rows[0]["kv"] == {"a": "hello", "b": "plain", "c": ""}

    def test_reference_defaults(self, text_df_factory):
        """default Delimiter tab / Separator colon (go:46-50)."""
        df = text_df_factory(["k1:v1\tk2:v2:with:colons"])
        proc = SplitKeyValue(SourceKey="content")
        rows = rows_as_dicts(proc(df))
        assert rows[0]["kv"] == {"k1": "v1", "k2": "v2:with:colons"}

    def test_multichar_separator_value_offset(self, text_df_factory):
        df = text_df_factory(["a::1&b::2"])
        proc = SplitKeyValue(SourceKey="content", Delimiter="&", Separator="::")
        rows = rows_as_dicts(proc(df))
        assert rows[0]["kv"] == {"a": "1", "b": "2"}


class TestParseContainerLog:
    """ProcessorParseContainerLogNative fixtures
    (core/unittest/processor/ParseContainerLogBenchmark shapes +
    .cpp:176-259 containerd text, :464-526 docker json)."""

    def _run(self, spark, lines, **kw):
        from loongcollector_spark.operators.parsers import ParseContainerLogNative

        df = spark.createDataFrame(
            [(i, ln) for i, ln in enumerate(lines)], "idx int, content string"
        )
        proc = ParseContainerLogNative(SourceKey="content", **kw)
        return {r["idx"]: r.asDict() for r in proc(df).collect()}

    def test_containerd_full_and_plain(self, spark):
        rows = self._run(spark, [
            "2021-08-25T07:00:00.000000000Z stdout F full line",
            "2021-08-25T07:00:01.000000000Z stderr plain content",
        ])
        assert rows[0]["_time_"] == "2021-08-25T07:00:00.000000000Z"
        assert rows[0]["_source_"] == "stdout"
        assert rows[0]["content"] == "full line"
        assert rows[0]["_part_"] is False
        # no P/F tag: everything after the stream is content
        assert rows[1]["content"] == "plain content"
        assert rows[1]["_source_"] == "stderr"

    def test_containerd_partial_tag(self, spark):
        rows = self._run(spark, [
            "2021-08-25T07:00:00Z stdout P piece one ",
            "2021-08-25T07:00:00Z stdout P PP 1",  # P then non-space → content
        ])
        assert rows[0]["_part_"] is True and rows[0]["content"] == "piece one "
        assert rows[1]["_part_"] is True and rows[1]["content"] == "PP 1"

    def test_containerd_pseudo_tag_rides_into_content(self, spark):
        """'PP 1' after the stream is NOT a tag (pch3 != pch2+2)."""
        rows = self._run(spark, ["2021-08-25T07:00:00Z stdout PP 1"])
        assert rows[0]["_part_"] is False and rows[0]["content"] == "PP 1"

    def test_containerd_bad_rows_kept_or_dropped(self, spark):
        bad = ["no-delimiters-here", "2021 notastream content"]
        kept = self._run(spark, bad)
        assert kept[0]["content"] == "no-delimiters-here"
        assert kept[0]["_time_"] is None and kept[0]["_source_"] is None
        assert kept[1]["content"] == "2021 notastream content"
        dropped = self._run(spark, bad, KeepingSourceWhenParseFail=False)
        assert dropped == {}

    def test_containerd_ignoring_streams(self, spark):
        lines = [
            "2021-08-25T07:00:00Z stdout F out",
            "2021-08-25T07:00:01Z stderr F err",
        ]
        only_err = self._run(spark, lines, IgnoringStdout=True)
        assert list(only_err) == [1] and only_err[1]["content"] == "err"
        only_out = self._run(spark, lines, IgnoringStderr=True)
        assert list(only_out) == [0] and only_out[0]["content"] == "out"

    def test_docker_json(self, spark):
        rows = self._run(spark, [
            '{"log":"hello world\\n","stream":"stdout","time":"2024-01-01T00:00:00Z"}',
            '{"log":"no newline","stream":"stderr","time":"t2"}',
            '{"log":"x","stream":"weird","time":"t3"}',
            "not json at all",
        ], Format="docker_json-file")
        assert rows[0]["content"] == "hello world"  # ONE trailing \n stripped
        assert rows[0]["_source_"] == "stdout" and rows[0]["_time_"] == "2024-01-01T00:00:00Z"
        assert rows[1]["content"] == "no newline"
        # invalid stream / invalid json kept verbatim
        assert rows[2]["content"] == '{"log":"x","stream":"weird","time":"t3"}'
        assert rows[3]["content"] == "not json at all"

    def test_partial_merge_window(self, spark):
        """containerd P-pieces merge with the next F/plain line, joined
        WITHOUT separator (MergeEvents insertLineBreak=false); a trailing
        P-run still merges (.cpp:154-157)."""
        from loongcollector_spark.operators.parsers import ParseContainerLogNative
        from loongcollector_spark.operators.splits import MergePartialLogs

        lines = [
            ("c1", 0, "t stdout P abc"),
            ("c1", 1, "t stdout P def"),
            ("c1", 2, "t stdout F ghi"),
            ("c1", 3, "t stdout F solo"),
            ("c1", 4, "t stdout P dangling"),
            ("c2", 0, "t stdout P x"),
            ("c2", 1, "t stdout F y"),
        ]
        df = spark.createDataFrame(lines, "src string, off int, content string")
        parsed = ParseContainerLogNative(SourceKey="content")(df)
        merged = MergePartialLogs(
            SourceKey="content", GroupKey="src", OrderKey="off"
        )(parsed)
        got = {
            (r["src"], r["off"]): (r["content"], r["n_merged"])
            for r in merged.collect()
        }
        assert got == {
            ("c1", 0): ("abcdefghi", 3),
            ("c1", 3): ("solo", 1),
            ("c1", 4): ("dangling", 1),
            ("c2", 0): ("xy", 2),
        }


class TestFileSources:
    def test_container_stdout_end_to_end(self, spark, tmp_path):
        """Raw containerd files on disk → merged logical events, offsets
        stable per file (the dev+inode+offset analogue)."""
        import os

        from loongcollector_spark.sources.files import (
            container_stdout_lines,
            read_text_files,
        )

        d = tmp_path / "logs"
        os.makedirs(d)
        (d / "a.log").write_text(
            "t1 stdout P hello \n"
            "t2 stdout P world\n"
            "t3 stdout F !\n"
            "t4 stderr F oops\n"
        )
        (d / "b.log").write_text("t5 stdout F solo\n")

        lines = read_text_files(spark, str(d), glob="*.log")
        assert lines.count() == 5
        offs = {
            (os.path.basename(r["_file_"]), r["_offset_"])
            for r in lines.collect()
        }
        assert ("a.log", 0) in offs and ("b.log", 0) in offs

        out = container_stdout_lines(spark, str(d), glob="*.log")
        got = {
            (os.path.basename(r["_file_"]), r["content"]): (
                r["n_merged"], r["_source_"], r["_time_"]
            )
            for r in out.collect()
        }
        assert got[("a.log", "hello world!")] == (3, "stdout", "t1")
        assert got[("a.log", "oops")] == (1, "stderr", "t4")
        assert got[("b.log", "solo")] == (1, "stdout", "t5")

    def test_streaming_reader_schema(self, spark, tmp_path):
        import os

        from loongcollector_spark.sources.files import read_text_files

        d = tmp_path / "slogs"
        os.makedirs(d)
        (d / "x.log").write_text("line\n")
        s = read_text_files(spark, str(d), stream=True)
        assert s.isStreaming
        assert set(s.columns) == {"content", "_file_", "_offset_"}

    def test_streaming_merge_guard_and_foreachbatch_offsets(self, spark, tmp_path):
        """VERDICT r2 #4: the batch multiline merge must reject streaming
        input loudly; the supported path (per_file_line_offsets inside
        foreachBatch + MergeMultilineLog per batch) yields correct merges
        even when files arrive across separate triggers."""
        import os

        import pytest as _pytest

        from loongcollector_spark.operators.splits import MergeMultilineLog
        from loongcollector_spark.sources.files import (
            per_file_line_offsets,
            read_text_files,
        )

        d = tmp_path / "mlogs"
        os.makedirs(d)
        (d / "a.log").write_text("START one\ncont a\nSTART two\n")
        (d / "b.log").write_text("START three\ncont b\ncont c\n")

        s = read_text_files(spark, str(d), stream=True)
        merger = MergeMultilineLog(
            SourceKey="content", GroupKey="_file_", OrderKey="_offset_",
            StartPattern=r"^START",
        )
        with _pytest.raises(ValueError, match="stateful_multiline_merge"):
            merger(s)

        # supported path: re-derive dense offsets per micro-batch, merge
        # per batch — maxFilesPerTrigger=1 forces the files into separate
        # triggers
        results = []

        def handle(batch_df, _bid):
            merged = merger(per_file_line_offsets(batch_df.drop("_offset_")))
            results.extend(
                (os.path.basename(r["_file_"]), r["content"]) for r in merged.collect()
            )

        src = (
            spark.readStream.option("maxFilesPerTrigger", "1")
            .text(str(d))
            .select(
                F.col("value").alias("content"),
                F.input_file_name().alias("_file_"),
            )
        )
        q = src.writeStream.foreachBatch(handle).trigger(
            availableNow=True
        ).start()
        assert q.awaitTermination(600), "query did not finish"
        got = set(results)
        assert ("a.log", "START one\ncont a") in got
        assert ("a.log", "START two") in got
        assert ("b.log", "START three\ncont b\ncont c") in got
        assert len(got) == 3


def _pb_varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _pb_len(fnum: int, payload: bytes) -> bytes:
    return _pb_varint((fnum << 3) | 2) + _pb_varint(len(payload)) + payload


def _pb_kv(k: str, v: str) -> bytes:
    return _pb_len(1, k.encode()) + _pb_len(2, v.encode())


def _pb_log(time: int, contents: dict, time_ns: int | None = None) -> bytes:
    body = _pb_varint(1 << 3) + _pb_varint(time)
    for k, v in contents.items():
        body += _pb_len(2, _pb_kv(k, v))
    if time_ns is not None:
        body += _pb_varint((4 << 3) | 5) + time_ns.to_bytes(4, "little")
    return body


def _pb_log_group(logs, topic="t1", source="s1", tags=None) -> bytes:
    out = b""
    for lg in logs:
        out += _pb_len(1, lg)
    out += _pb_len(3, topic.encode()) + _pb_len(4, source.encode())
    for k, v in (tags or {}).items():
        out += _pb_len(6, _pb_kv(k, v))
    return out


class TestParseFromPb:
    """sls_logs.proto wire decode (ProcessorParseFromPBNative) — payloads
    hand-encoded with a tiny proto2 writer above, so the decoder is
    checked against the wire format itself, not against itself."""

    def test_log_group_roundtrip(self, spark):
        from loongcollector_spark.operators.pb import ParseFromPbNative

        pb = _pb_log_group(
            [
                _pb_log(1700000000, {"k1": "v1", "k2": "v2"}, time_ns=123),
                _pb_log(1700000001, {"k3": "v3"}),
            ],
            topic="top", source="10.0.0.1", tags={"host": "h1"},
        )
        df = spark.createDataFrame([(1, bytearray(pb))], "gid int, raw binary")
        rows = ParseFromPbNative(SourceKey="raw")(df).orderBy("log_time").collect()
        assert len(rows) == 2
        r0 = rows[0]
        assert r0.gid == 1 and r0.topic == "top" and r0.source == "10.0.0.1"
        assert dict(r0.tags) == {"host": "h1"}
        assert r0.log_time == 1700000000 and r0.log_time_ns == 123
        assert dict(r0.contents) == {"k1": "v1", "k2": "v2"}
        assert rows[1].log_time_ns is None
        assert dict(rows[1].contents) == {"k3": "v3"}

    def test_garbage_and_null_dropped(self, spark):
        from loongcollector_spark.operators.pb import ParseFromPbNative

        good = _pb_log_group([_pb_log(1, {"a": "b"})])
        df = spark.createDataFrame(
            [(1, bytearray(b"\xff\xff\xff")), (2, None), (3, bytearray(good))],
            "gid int, raw binary",
        )
        rows = ParseFromPbNative(SourceKey="raw")(df).collect()
        assert [r.gid for r in rows] == [3]

    def test_unsupported_protocol_rejected(self):
        import pytest as _pytest

        from loongcollector_spark.operators.pb import ParseFromPbNative

        with _pytest.raises(ValueError):
            ParseFromPbNative(Protocol="otlp")

    def test_multibyte_varint_and_unicode(self, spark):
        from loongcollector_spark.operators.pb import ParseFromPbNative

        pb = _pb_log_group([_pb_log(2**31 - 1, {"键": "值" * 50})])
        df = spark.createDataFrame([(1, bytearray(pb))], "gid int, raw binary")
        r = ParseFromPbNative(SourceKey="raw")(df).collect()[0]
        assert r.log_time == 2**31 - 1 and r.contents["键"] == "值" * 50


class TestPbRoundtrip:
    def test_serialize_then_parse_roundtrip(self, spark):
        """flusher-side LogGroup serialization → ParseFromPbNative decode
        reproduces rows exactly (wire-format roundtrip through the
        library's own encoder + decoder, each independently tested)."""
        from loongcollector_spark.operators.pb import (
            ParseFromPbNative,
            serialize_log_groups,
        )

        rows = [
            ("convA", 1700000000 + i, f"text {i}", "user" if i % 2 else "tool")
            for i in range(7)
        ] + [("convB", 1700000100, "solo", "system")]
        df = spark.createDataFrame(
            rows, "conv_id string, t long, text string, role string"
        )
        ser = serialize_log_groups(
            df, group_key="conv_id", time_col="t",
            content_cols=["text", "role"], source="s1", max_log_count=3,
        )
        got_groups = {(r.conv_id, r.n_logs) for r in ser.collect()}
        assert got_groups == {("convA", 3), ("convA", 3), ("convA", 1),
                              ("convB", 1)} or ("convA", 3) in got_groups
        back = ParseFromPbNative(SourceKey="payload")(ser)
        got = sorted(
            (r.conv_id, r.log_time, r.contents["text"], r.contents["role"])
            for r in back.collect()
        )
        assert got == sorted((c, t, x, ro) for c, t, x, ro in rows)
        assert all(r.source == "s1" for r in back.collect())


class TestProcessorRegexGo:
    """The Go regex plugin twin (plugins/processor/regex/regex.go:105-129):
    search vs FullMatch, non-participating groups absent, group-count
    shortfall fails all rows, source-drop semantics."""

    def _run(self, spark, texts, **kw):
        from loongcollector_spark.operators.parsers import ProcessorRegexGo

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i int, content string"
        )
        out = ProcessorRegexGo(SourceKey="content", **kw)(df)
        return [r.asDict() for r in out.orderBy("i").collect()]

    def test_search_and_nonparticipating(self, spark):
        rows = self._run(
            spark,
            ["pre k=v post", "k=", "nothing here", None],
            Regex=r"k=(\w*)(?: tag=(\w+))?", Keys=["val", "tag"],
        )
        assert rows[0]["val"] == "v" and rows[0]["tag"] is None
        assert rows[0]["content"] is None  # source dropped on success
        assert rows[1]["val"] == ""  # participating empty group
        assert rows[2]["val"] is None
        assert rows[2]["content"] == "nothing here"  # kept on parse error
        assert rows[3]["val"] is None and rows[3]["content"] is None

    def test_full_match(self, spark):
        rows = self._run(
            spark, ["k=v", "pre k=v"],
            Regex=r"k=(\w+)", Keys=["val"], FullMatch=True,
        )
        assert rows[0]["val"] == "v"
        assert rows[1]["val"] is None  # search hit but not full span

    def test_group_shortfall_fails_all(self, spark):
        rows = self._run(
            spark, ["k=v"], Regex=r"k=(\w+)", Keys=["a", "b"],
        )
        assert rows[0]["a"] is None and rows[0]["b"] is None
        assert rows[0]["content"] == "k=v"  # parse error → source kept

    def test_backreference_pattern_two_pass(self, spark):
        # \1 would break the outer-group wrap; config-time detection
        # routes to the search+extract path (code-review r3 finding)
        rows = self._run(
            spark, ["x=ab=ab y", "x=ab=cd y"],
            Regex=r"(\w+)=\1", Keys=["dup"],
        )
        assert rows[0]["dup"] == "ab"
        assert rows[1]["dup"] is None


class TestSplitKeyValueQuoteResplit:
    """Quote-aware pair re-splitting (key_value_splitter.go:145-183):
    a delimiter inside a quoted value must not end the pair — the
    previously documented divergence, now transcribed."""

    def _run(self, spark, text, **kw):
        from loongcollector_spark.operators.parsers import SplitKeyValue

        df = spark.createDataFrame([(text,)], "content string")
        op = SplitKeyValue(SourceKey="content", Delimiter="&",
                           Separator="=", Quote='"', **kw)
        return op(df).collect()[0]["kv"]

    def test_delimiter_inside_quotes(self, spark):
        assert self._run(spark, 'a="1&2"&b=3') == {"a": "1&2", "b": "3"}

    def test_plain_and_unwrap(self, spark):
        assert self._run(spark, 'k="v"&x=1') == {"k": "v", "x": "1"}

    def test_prefix_policies_with_quote_path(self, spark):
        got = self._run(spark, "solo&=v&a=1")
        assert got == {"no_separator_key_0": "solo", "empty_key_0": "v",
                       "a": "1"}

    def test_null_source(self, spark):
        from loongcollector_spark.operators.parsers import SplitKeyValue

        df = spark.createDataFrame([(None,)], "content string")
        op = SplitKeyValue(SourceKey="content", Delimiter="&",
                           Separator="=", Quote='"')
        assert op(df).collect()[0]["kv"] is None
