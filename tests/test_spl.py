"""SPL compiler tests: semantic cases from SplUnittest.cpp + a corpus
smoke sweep over core/unittest/spl/spl.txt (parse+execute, mirroring the
reference's parse-only smoke at SplUnittest.cpp:74)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.functions.spl import SplProgram, run_spl, translate_expr
from tests.xxh64_ref import xxh64 as _xxh64_ref

SPL_CORPUS = "/root/reference/core/unittest/spl/spl.txt"


@pytest.fixture(scope="module")
def spl_df(spark):
    extra = {
        "content_body": '{"body":"{\\"x\\":1}"}',
        "content_simp": "1.2.3.4,10:00,web1",
        "content_complex": '1.2.3.4,"10:00",web1',
        "content_delim": "1;2;3",
        "content_delim1": "a\\b\\c",
        "content_delim2": "a\tb\tc",
        "content_delim3": "a\tb\tc",
        "content_sep": "a:1&b:2",
    }
    rows = [
        (0, "value_3_0", '{"k1":"v1","body":"{\\"x\\":1}"}', "1.2.3.4,10:00,web1",
         "a=1&b=2", "kv", *extra.values()),
        (1, "value_4_0", '{"k1":"v2","body":"{\\"x\\":2}"}', '"q,x",11:00,web2',
         "c=3&d=4", "csv", *extra.values()),
    ]
    schema = (
        "idx int, content string, map_str string, content_csv string, "
        "content_kv string, type string, "
        + ", ".join(f"{k} string" for k in extra)
    )
    return spark.createDataFrame(rows, schema)


class TestSemantics:
    def test_where(self, spl_df):
        out = run_spl(spl_df, "* | where content='value_3_0'")[0]
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["content"] == "value_3_0"

    def test_extend_chain(self, spl_df):
        out = run_spl(
            spl_df,
            "* | extend a = 'hello', b = 'world' | extend d = concat(a, b)",
        )[0]
        assert out.collect()[0]["d"] == "helloworld"

    def test_extend_presto_functions(self, spl_df):
        out = run_spl(
            spl_df,
            "* | extend a = 'hello,volex' | extend b = strpos(a, 'volex') "
            "| extend c = cardinality(split(a, ',')) "
            "| extend e = cast('12' as varchar)",
        )[0]
        r = out.collect()[0]
        assert r["b"] == 7 and r["c"] == 2 and r["e"] == "12"

    def test_project_rename(self, spl_df):
        out = run_spl(spl_df, "* | project-rename renamed=content | project renamed")[0]
        assert out.columns == ["renamed"]

    def test_parse_regexp_named_groups(self, spl_df):
        out = run_spl(
            spl_df, r"* | parse-regexp content, '(?P<word>\w+)_(?P<num>\d+)_\d+'"
        )[0]
        r = out.orderBy("idx").collect()[0]
        assert r["word"] == "value" and r["num"] == "3"

    def test_parse_regexp_as(self, spl_df):
        out = run_spl(spl_df, r"* | parse-regexp content, '([a-z]+)_(\d+)' as w, n")[0]
        r = out.orderBy("idx").collect()[0]
        assert r["w"] == "value" and r["n"] == "3"

    def test_parse_json_path(self, spl_df):
        out = run_spl(spl_df, "* | parse-json -path='$.body' map_str")[0]
        r = out.orderBy("idx").collect()[0]
        assert r["parsed"]["x"] == "1"

    def test_parse_csv_quote(self, spl_df):
        out = run_spl(
            spl_df, "* | parse-csv -quote='\"' content_csv as ip, time, host"
        )[0]
        rows = out.orderBy("idx").collect()
        assert rows[0]["ip"] == "1.2.3.4"
        assert rows[1]["ip"] == "q,x"  # quoted field containing delimiter

    def test_parse_kv(self, spl_df):
        out = run_spl(spl_df, "* | parse-kv -delims='&?' content_kv")[0]
        assert out.orderBy("idx").collect()[0]["kv"] == {"a": "1", "b": "2"}

    def test_parse_kv_regexp(self, spark):
        r"""SplUnittest.cpp TestRegexKV fixture: -regexp mode extracts
        (group1, group2) pairs per match — 'k1=v1&k2=v2?k3=v3' with
        '(\w+)=(\w+)' yields k1..k3 (expected values from the reference
        test's assertions)."""
        df = spark.createDataFrame(
            [(0, "k1=v1&k2=v2?k3=v3"), (1, "k11=v11&k22=v22?k33=v33")],
            "idx int, content string",
        )
        out = run_spl(df, r"* | parse-kv -regexp content, '(\w+)=(\w+)'")[0]
        rows = out.orderBy("idx").collect()
        assert rows[0]["kv"] == {"k1": "v1", "k2": "v2", "k3": "v3"}
        assert rows[1]["kv"] == {"k11": "v11", "k22": "v22", "k33": "v33"}

    def test_multi_output_let(self, spl_df):
        """TestMultiParse shape (SplUnittest.cpp:559-571): .let bindings,
        where-branches, multiple $emissions."""
        script = """
.let src = * | extend marker = 1;
.let ds1 = $src | where type = 'kv' | parse-kv -delims='&?' content_kv;
$ds1;
.let ds2 = $src | where type = 'csv' | parse-csv content_csv as x, y, z;
$ds2;
"""
        outs = run_spl(spl_df, script)
        assert len(outs) == 2
        kv_rows = outs[0].collect()
        csv_rows = outs[1].collect()
        assert len(kv_rows) == 1 and kv_rows[0]["kv"]["a"] == "1"
        assert len(csv_rows) == 1 and csv_rows[0]["x"] == '"q'

    def test_regexp_extract_group_default(self, spl_df):
        """Presto 2-arg regexp_extract returns the WHOLE match."""
        out = run_spl(
            spl_df, r"* | extend m = regexp_extract(content, 'value_\d')"
        )[0]
        assert out.orderBy("idx").collect()[0]["m"] == "value_3"

    def test_two_arg_replace(self, spl_df):
        out = run_spl(spl_df, "* | extend r = replace(content, 'value_')")[0]
        assert out.orderBy("idx").collect()[0]["r"] == "3_0"


@pytest.mark.skipif(not os.path.exists(SPL_CORPUS), reason="corpus not present")
class TestCorpusSmoke:
    def test_corpus_sweep(self, spark, spl_df):
        """Compile+execute every corpus line that uses supported commands;
        assert a healthy pass rate (the reference smoke-parses all 230)."""
        with open(SPL_CORPUS) as f:
            lines = [l.strip() for l in f if l.strip()]
        attempted = passed = 0
        failures = []
        for line in lines:
            attempted += 1
            try:
                outs = SplProgram(line).run(spl_df)
                for o in outs:
                    o.collect()
                passed += 1
            except Exception as e:  # noqa: BLE001
                failures.append((line[:80], str(e)[:80]))
        rate = passed / attempted
        # Expression-library breadth: the full 222-line corpus executes
        # (hmac_*, spooky_hash_*, HLL, instance-variant signatures and
        # Velox slice-0 included as of round 2).
        assert rate >= 0.99, (
            f"only {passed}/{attempted} corpus lines ran; first failures: "
            f"{failures[:8]}"
        )


class TestScalarParity:
    """Value-level parity for the round-2 SPL tail: hmac vectors
    (RFC 2104 — the definition Presto's hmac_* implements), SpookyV2
    shape/determinism, and the instance-variant signatures."""

    def test_hmac_reference_vectors(self, spl_df):
        """corpus spl.txt:69-72 fixture inputs: msg='4444',
        key='this is key'. Expected digests are RFC 2104 values."""
        expected = {
            "hmac_md5": "9951d9dc49bb9c4e81b082f20cdf56a5",
            "hmac_sha1": "05ab1a8f3965e93f68b2412a84561b2aaebe3c94",
            "hmac_sha256": (
                "bd62afe95ea7523b9c396dbda4405959"
                "edd337a7a49cbbe755582378d47d1c3b"
            ),
            "hmac_sha512": (
                "f12db230da63bae301a7cc07e0e208da9466f5e19af097d2fa41d1d7"
                "38897a4322bf3a5c8816493ae16b20e1ec511e6ba5b047f000977d70"
                "e286fd8e915c765d"
            ),
        }
        for fn, want in expected.items():
            out = run_spl(
                spl_df,
                "* | extend a = cast('4444' as VARBINARY), "
                f"b = cast('this is key' as VARBINARY) | extend c = {fn}(a, b)",
            )[0]
            got = bytes(out.limit(1).collect()[0]["c"]).hex()
            assert got == want, (fn, got)

    def test_spooky_hash_shape(self, spl_df):
        out = run_spl(
            spl_df,
            "* | extend a = cast('4444' as VARBINARY) "
            "| extend h32 = spooky_hash_v2_32(a), h64 = spooky_hash_v2_64(a)",
        )[0]
        r = out.limit(1).collect()[0]
        assert len(bytes(r["h32"])) == 4 and len(bytes(r["h64"])) == 8
        # 32-bit = low word of the 128-bit hash1 (SpookyV2 definition)
        assert bytes(r["h64"])[4:] == bytes(r["h32"])

    def test_strrpos_instance(self, spl_df):
        out = run_spl(
            spl_df,
            "* | extend a = 'ababab' | extend p1 = strrpos(a, 'ab', 1), "
            "p2 = strrpos(a, 'ab', 2), p9 = strrpos(a, 'ab', 9)",
        )[0]
        r = out.limit(1).collect()[0]
        assert (r["p1"], r["p2"], r["p9"]) == (5, 3, 0)

    def test_array_position_instance(self, spl_df):
        out = run_spl(
            spl_df,
            "* | extend a = ARRAY [1, 3, 2, 3] | extend "
            "p = array_position(a, 3, 2), pneg = array_position(a, 3, -1), "
            "pmiss = array_position(a, 9, 1)",
        )[0]
        r = out.limit(1).collect()[0]
        assert (r["p"], r["pneg"], r["pmiss"]) == (4, 4, 0)

    def test_combinations(self, spl_df):
        out = run_spl(
            spl_df,
            "* | extend a = ARRAY ['cat', 'leopard', 'mouse'] "
            "| extend b = combinations(a, 2)",
        )[0]
        r = out.limit(1).collect()[0]
        assert [list(x) for x in r["b"]] == [
            ["cat", "leopard"], ["cat", "mouse"], ["leopard", "mouse"]]

    def test_width_bucket_bins(self, spl_df):
        out = run_spl(
            spl_df,
            "* | extend a = ARRAY[0, 2, 4] | extend b = width_bucket(3, a), "
            "lo = width_bucket(-1, a), hi = width_bucket(9, a)",
        )[0]
        r = out.limit(1).collect()[0]
        assert (r["b"], r["lo"], r["hi"]) == (2, 0, 3)

    def test_velox_slice_zero_start(self, spl_df):
        out = run_spl(
            spl_df,
            "* | extend a = ARRAY [5, 20, NULL, 50] "
            "| extend b = slice(a, 0, 3), c = slice(a, 2, 2)",
        )[0]
        r = out.limit(1).collect()[0]
        assert list(r["b"]) == [] and list(r["c"]) == [20, None]


def _nan():
    return float("nan")


class TestCorpusValueAnchors:
    """Value assertions for the widest-used corpus scalar families
    (VERDICT r3 #5): each case is a verbatim spl.txt line with the
    expected Presto-semantics value of its final column, derived from
    Python stdlib / closed form — independent of the Spark translation.
    This sweep caught 7 real parity bugs on landing: ISO day_of_week/dow,
    2-arg truncate, mask-first bitwise_logical_shift_right, 2-arg
    from_unixtime zone, array repeat, lambda ROW constructor, and
    json_size of a scalar."""

    E = 1534521600  # 2018-08-17 16:00:00 UTC, a Friday

    import base64 as _b64
    import math as _m
    import zlib as _z

    CASES = [
        # -- datetime ----------------------------------------------------
        ("* | extend a = from_unixtime(1534521600) | extend b = date(a)",
         __import__("datetime").date(2018, 8, 17)),
        ("* | extend a = 1534521600 | extend b = from_unixtime(a, '+01:00')",
         __import__("datetime").datetime(2018, 8, 17, 17, 0)),
        ("* | extend a = from_unixtime(1534521600) | extend b = to_unixtime(a)",
         1534521600),
        ("* | extend a = 'minute' | extend b = date_trunc(a, from_unixtime(1534521600))",
         __import__("datetime").datetime(2018, 8, 17, 16, 0)),
        ("* | extend a = from_unixtime(1534521600) | extend b = date_add('minute', 33, a)",
         __import__("datetime").datetime(2018, 8, 17, 16, 33)),
        ("* | extend a = from_unixtime(1534521600), b = from_unixtime(1534521800) | extend c = date_diff('minute', a, b)",
         3),
        ("* | extend a = from_unixtime(1534521600) | extend b = date_format(a, '%Y-%m-%d %H:%i:%s')",
         "2018-08-17 16:00:00"),
        ("* | extend a = '2018-08-12 16:13:15' | extend b = parse_datetime(a, '%Y-%m-%d %H:%i:%s')",
         __import__("datetime").datetime(2018, 8, 12, 16, 13, 15)),
        ("* | extend a = '2022-10-19 15:46:05' | extend b = date_parse(a, '%Y-%m-%d %H:%i:%s')",
         __import__("datetime").datetime(2022, 10, 19, 15, 46, 5)),
        ("* | extend a = from_unixtime(1534521600) | extend b = day(a)", 17),
        ("* | extend a = from_unixtime(1534521600) | extend b = day_of_month(a)", 17),
        # ISO-8601: Friday = 5 (Presto day_of_week / dow)
        ("* | extend a = from_unixtime(1534521600) | extend b = day_of_week(a)", 5),
        ("* | extend a = from_unixtime(1534521600) | extend b = dow(a)", 5),
        ("* | extend a = from_unixtime(1534521600) | extend b = day_of_year(a)",
         __import__("datetime").date(2018, 8, 17).timetuple().tm_yday),
        ("* | extend a = from_unixtime(1534521600) | extend b = doy(a)", 229),
        ("* | extend a = from_unixtime(1534521600) | extend b = hour(a)", 16),
        ("* | extend a = from_unixtime(1534521600) | extend b = millisecond(a)", 0),
        ("* | extend a = from_unixtime(1534521600) | extend b = minute(a)", 0),
        ("* | extend a = from_unixtime(1534521600) | extend b = month(a)", 8),
        ("* | extend a = from_unixtime(1534521600) | extend b = quarter(a)", 3),
        ("* | extend a = from_unixtime(1534521600) | extend b = second(a)", 0),
        ("* | extend a = from_unixtime(1534521600) | extend b = week(a)",
         __import__("datetime").date(2018, 8, 17).isocalendar()[1]),
        ("* | extend a = from_unixtime(1534521600) | extend b = week_of_year(a)", 33),
        ("* | extend a = from_unixtime(1534521600) | extend b = year(a)", 2018),
        ("* | extend a = from_unixtime(1534521600) | extend b = year_of_week(a)",
         __import__("datetime").date(2018, 8, 17).isocalendar()[0]),
        ("* | extend a = from_unixtime(1534521600) | extend b = yow(a)", 2018),
        ("* | extend a = from_unixtime(1534521600) | extend b = format_datetime(a, 'yyyyMMdd')",
         "20180817"),
        # -- URL ---------------------------------------------------------
        ("* | extend a = 'https://sls.aliyun.com/v1/path' | extend b = url_extract_fragment(a)", None),
        ("* | extend a = 'https://sls.aliyun.com/v1/path' | extend b = url_extract_host(a)",
         "sls.aliyun.com"),
        ("* | extend a = 'https://sls.aliyun.com/v1/path?a=b&c=d' | extend b = url_extract_parameter(a, 'c')",
         "d"),
        ("* | extend a = 'https://sls.aliyun.com/v1/path' | extend b = url_extract_path(a)",
         "/v1/path"),
        ("* | extend a = 'https://sls.aliyun.com/v1/path' | extend b = url_extract_port(a)", None),
        ("* | extend a = 'https://sls.aliyun.com/v1/path' | extend b = url_extract_protocol(a)",
         "https"),
        ("* | extend a = 'https://sls.aliyun.com/v1/path' | extend b = url_extract_query(a)", None),
        ("* | extend a = 'https://sls.aliyun.com/v1/path?a=b&c=d' | extend b = url_encode(a)",
         __import__("urllib.parse", fromlist=["quote"]).quote(
             "https://sls.aliyun.com/v1/path?a=b&c=d", safe="")),
        ("* | extend a = 'https%3A%2F%2Fsls.aliyun.com%2Fv1%2Fpath' | extend b = url_decode(a)",
         "https://sls.aliyun.com/v1/path"),
        # -- string ------------------------------------------------------
        ("* | extend a = 23 | extend b = chr(a)", chr(23)),
        ("* | extend a = 't' | extend b = codepoint(a)", ord("t")),
        ("* | extend a = 'hello', b = 'world', c = '111' | extend d = concat(a, b, c)",
         "helloworld111"),
        ("* | extend a = 'this is word 555' | extend b = length(a)", 16),
        ("* | extend a = 'this is word 555' | extend b = lower(a)", "this is word 555"),
        ("* | extend a = 'hello volex' | extend b = lpad(a, 100, 'rep')",
         ("rep" * 34)[:89] + "hello volex"),
        ("* | extend a = 'hello volex' | extend b = rpad(a, 100, 'rep')",
         "hello volex" + ("rep" * 34)[:89]),
        ("* | extend a = 'hello volex' | extend b = replace(a, 'hello')", " volex"),
        ("* | extend a = 'hello volex' | extend b = replace(a, 'hello', 'rep')",
         "rep volex"),
        ("* | extend a = 'this is word 555' | extend b = reverse(a)",
         "this is word 555"[::-1]),
        ("* | extend a = 'hello,volex,world,hello' | extend b = split(a, ',')",
         ["hello", "volex", "world", "hello"]),
        ("* | extend a = 'hello,volex,world,hello' | extend b = split(a, ',', 2)",
         ["hello", "volex,world,hello"]),
        ("* | extend a = 'hello,volex,world,hello' | extend b = split_part(a, ',', 2)",
         "volex"),
        ("* | extend a = 'hello,volex,world,hello' | extend b = strpos(a, 'hello')", 1),
        ("* | extend a = 'hello velox' | extend d = strpos(a, 'velox', 1)", 7),
        ("* | extend a = 'hello,volex,world,hello' | extend b = strrpos(a, 'hello')", 19),
        ("* | extend a = 'hello velox' | extend d = strrpos(a, 'velox', 1)", 7),
        ("* | extend a = 'hello velox' | extend d = substr(a, 1)", "hello velox"),
        ("* | extend a = 'hello velox' | extend d = substr(a, 1, 3)", "hel"),
        ("* | extend a = 'this is word 555' | extend b = upper(a)", "THIS IS WORD 555"),
        ("* | extend a = 'hello ' | extend b = repeat(a, 3)",
         ["hello ", "hello ", "hello "]),
        ("* | extend a = 'this is word 555' | extend b = to_utf8(a)",
         bytearray(b"this is word 555")),
        # -- binary / hash-adjacent -------------------------------------
        ("* | extend a = cast('4444' as VARBINARY) | extend b = crc32(a)",
         _z.crc32(b"4444")),
        ("* | extend a = '1101' | extend b = from_base64(a)",
         bytearray(_b64.b64decode("1101"))),
        ("* | extend a = 'D74D' | extend b = from_hex(a)",
         bytearray(bytes.fromhex("D74D"))),
        ("* | extend a = cast('4444' as VARBINARY) | extend b = to_base64(a)",
         _b64.b64encode(b"4444").decode()),
        ("* | extend a = cast('4444' as VARBINARY) | extend b = to_hex(a)",
         b"4444".hex().upper()),
        # -- bitwise -----------------------------------------------------
        ("* | extend a = 9 | extend b = bit_count(a, 64)", 2),
        ("* | extend a = 1342 | extend b = bitwise_and(a, 8)", 1342 & 8),
        ("* | extend a = 1342 | extend b = bitwise_arithmetic_shift_right(a, 8)",
         1342 >> 8),
        ("* | extend a = 1342 | extend b = bitwise_left_shift(a, 8)", 1342 << 8),
        # treated as an 8-bit value: mask first, then logical shift
        ("* | extend a = 1342 | extend b = bitwise_logical_shift_right(a, 9, 8)",
         (1342 & 0xFF) >> 9),
        ("* | extend a = 33 | extend b = bitwise_not(a)", ~33),
        ("* | extend a = 1342 | extend b = bitwise_or(a, 8)", 1342 | 8),
        ("* | extend a = 1342 | extend b = bitwise_right_shift(a, 8)", 1342 >> 8),
        ("* | extend a = 1342 | extend b = bitwise_right_shift_arithmetic(a, 8)",
         1342 >> 8),
        ("* | extend a = 1342 | extend b = bitwise_shift_left(a, 9, 8)",
         (1342 << 9) & 0xFF),
        ("* | extend a = 1342 | extend b = bitwise_xor(a, 8)", 1342 ^ 8),
        # -- arrays ------------------------------------------------------
        ("* | extend a = ARRAY [10, 20, 30] | extend b = array_average(a)", 20.0),
        ("* | extend a = ARRAY [10, 20, 30] | extend b = array_distinct(a)",
         [10, 20, 30]),
        ("* | extend a = ARRAY [10, 20, 30], b = ARRAY [20, 40, 50] | extend b = array_except(a, b)",
         [10, 30]),
        ("* | extend a = ARRAY [10, 20, 30], b = ARRAY [20, 40, 50] | extend b = array_intersect(a, b)",
         [20]),
        ("* | extend a = ARRAY [1, NULL, 2] | extend b = array_join(a, ',', '0')",
         "1,0,2"),
        ("* | extend a = ARRAY [10, 20, 30, 30, 40] | extend b = array_max(a)", 40),
        ("* | extend a = ARRAY [10, 20, 30, 30, 40] | extend b = array_min(a)", 10),
        ("* | extend a = ARRAY [1.2, 3.1, 2.05] | extend b = array_normalize(a, 3.1)",
         [v / (1.2 ** 3.1 + 3.1 ** 3.1 + 2.05 ** 3.1) ** (1 / 3.1)
          for v in (1.2, 3.1, 2.05)]),
        ("* | extend a = ARRAY [10, 20, 30], b = ARRAY [20, 40, 50] | extend b = arrays_overlap(a, b)",
         True),
        ("* | extend a = ARRAY [1, 3, 2] | extend b = array_position(a, 3)", 2),
        ("* | extend a = ARRAY [1, 3, 2] | extend b = array_position(a, 3, 2)", 0),
        ("* | extend a = ARRAY [10, 20, 30] | extend b = array_sort(a)", [10, 20, 30]),
        ("* | extend a = ARRAY [10, 20, 30, 30, 40] | extend b = array_sum(a)", 130),
        ("* | extend a = ARRAY [10, 20, 30, 30, 40] | extend b = cardinality(a)", 5),
        ("* | extend a = ARRAY ['cat', 'leopard', 'mouse'] | extend b = combinations(a, 2)",
         [["cat", "leopard"], ["cat", "mouse"], ["leopard", "mouse"]]),
        ("* | extend a = ARRAY [1, 3, 2] | extend b = contains(a, 3)", True),
        ("* | extend a = ARRAY ['cat', 'leopard', 'mouse'] | extend b = element_at(a, 2)",
         "leopard"),
        ("* | extend a = ARRAY ['cat', NULL, 'leopard', 'mouse'] | extend b = filter(a, x -> x IS NOT NULL)",
         ["cat", "leopard", "mouse"]),
        ("* | extend a = ARRAY [5, 20, NULL, 50] | extend b = reduce(a, 0, (s, x) -> IF(x IS NULL, s, s + x), s -> s)",
         75),
        ("* | extend a = ARRAY [10, 20, 30] | extend b = reverse(a)", [30, 20, 10]),
        ("* | extend a = ARRAY [5, 20, NULL, 50] | extend b = slice(a, 0, 3)", []),
        ("* | extend a = sequence(0, 10)", list(range(11))),
        ("* | extend a = sequence(0, 10, 2)", [0, 2, 4, 6, 8, 10]),
        ("* | extend a = ARRAY [5, NULL, 6] | extend b = transform(a, x -> COALESCE(x, 0) + 1)",
         [6, 1, 7]),
        ("* | extend a = ARRAY[1, 2] | extend b = zip(a, ARRAY['1b', null, '3b'])",
         [(1, "1b"), (2, None), (None, "3b")]),
        ("* | extend a = ARRAY[1, 3, 5], b = ARRAY['a', 'b', 'c'] | extend c = zip_with(a, b, (x, y) -> (y, x))",
         [("a", 1), ("b", 3), ("c", 5)]),
        ("* | extend a = ARRAY[1, 3, 5] | extend b = all_match(a, x -> x > 3)", False),
        # -- maps --------------------------------------------------------
        ("* | extend a = map(ARRAY[1,3], ARRAY[2,4]) | extend b = cardinality(a)", 2),
        ("* | extend a = map(ARRAY[1,3], ARRAY[2,4]) | extend b = element_at(a, 3)", 4),
        ("* | extend a = ARRAY[1,3], b = ARRAY[2,4] | extend c = map(a, b)",
         {1: 2, 3: 4}),
        ("* | extend a = map(ARRAY[1,3], ARRAY[2,4]), b = map(ARRAY[1,30], ARRAY[21,4]) | extend c = map_concat(a, b)",
         {1: 21, 3: 4, 30: 4}),
        ("* | extend a = map(ARRAY[1,3], ARRAY[2,4]) | extend b = map_entries(a)",
         [(1, 2), (3, 4)]),
        ("* | extend a = map(ARRAY[1,3], ARRAY[2,4]) | extend b = map_filter(a, (k, v) -> v IS NOT NULL)",
         {1: 2, 3: 4}),
        ("* | extend a = map(ARRAY[1,3], ARRAY[2,4]) | extend b = map_keys(a)", [1, 3]),
        ("* | extend a = map(ARRAY[1,3], ARRAY[2,4]) | extend b = map_values(a)", [2, 4]),
        ("* | extend a = MAP(ARRAY[1, 2, 3], ARRAY['a', 'b', 'c']), b = MAP(ARRAY[1, 2, 3], ARRAY['d', 'e', 'f']) | extend c = map_zip_with(a, b, (k, v1, v2) -> concat(v1, v2))",
         {1: "ad", 2: "be", 3: "cf"}),
        ("* | extend a = MAP(ARRAY [1, 2, 3], ARRAY ['a', 'b', 'c']) | extend b = transform_keys(a, (k, v) -> k + 1)",
         {2: "a", 3: "b", 4: "c"}),
        ("* | extend a = MAP(ARRAY [1, 2, 3], ARRAY ['a', 'b', 'c']) | extend b = transform_values(a, (k, v) -> k * k)",
         {1: 1, 2: 4, 3: 9}),
        # -- json --------------------------------------------------------
        ("* | extend a = json_parse('{\"x\": {\"a\": 1, \"b\": 2}}') | extend b = is_json_scalar(a)",
         False),
        ("* | extend a = '[1, 2, 3]' | extend b = json_array_contains(a, 2)", True),
        ("* | extend a = '[1, 2, 3]' | extend b = json_array_length(a)", 3),
        ("* | extend a = json_parse('{\"x\": {\"a\": 1, \"b\": 2}}') | extend b = json_extract_scalar(a, '$.x.a')",
         "1"),
        ("* | extend a = json_parse('{\"x\": {\"a\": 1, \"b\": 2}}') | extend b = json_size(a, '$.x.a')",
         0),
        ("* | extend a = json_parse('{\"x\": {\"a\": 1, \"b\": 2}}') | extend b = json_size(a, '$.x')",
         2),
        # -- math --------------------------------------------------------
        ("* | extend a = 30 | extend b = abs(a)", 30),
        ("* | extend a = 30 | extend b = cbrt(a)", 30 ** (1 / 3)),
        ("* | extend a = 30 | extend b = ceil(a)", 30),
        ("* | extend a = 30 | extend b = degrees(a)", _m.degrees(30)),
        ("* | extend a = 30 | extend b = exp(a)", _m.exp(30)),
        ("* | extend a = '312', b = 8 | extend c = from_base(a, b)",
         int("312", 8)),
        ("* | extend a = 30 | extend b = ln(a)", _m.log(30)),
        ("* | extend a = 30 | extend b = log2(a)", _m.log2(30)),
        ("* | extend a = 30 | extend b = log10(a)", _m.log10(30)),
        ("* | extend a = 1321, b = 8 | extend c = mod(a, b)", 1321 % 8),
        ("* | extend a = 30 | extend b = pow(a, 3)", 27000.0),
        ("* | extend a = 30 | extend b = radians(a)", _m.radians(30)),
        ("* | extend a = 30 | extend b = round(a)", 30),
        ("* | extend a = 3.14 | extend b = round(a, 5)", 3.14),
        ("* | extend a = 30 | extend b = sign(a)", 1),
        ("* | extend a = 30 | extend b = sqrt(a)", _m.sqrt(30)),
        ("* | extend a = 19 | extend b = to_base(a, 29)", "j"),
        ("* | extend a = 19.1234567 | extend b = truncate(a)", 19.0),
        ("* | extend a = 19.1234567 | extend b = truncate(a, 3)", 19.123),
        ("* | extend a = 500 | extend b = width_bucket(a, 100, 5000, 10)", 1),
        ("* | extend a = ARRAY[0, 2, 4] | extend b = width_bucket(3, a)", 2),
        ("* | extend a = 30 | extend b = acos(a)", _nan()),
        ("* | extend a = 30 | extend b = atan(a)", _m.atan(30)),
        ("* | extend a = 60 | extend b = atan2(a, 90)", _m.atan2(60, 90)),
        ("* | extend a = 30 | extend b = cos(a)", _m.cos(30)),
        ("* | extend a = 30 | extend b = cosh(a)", _m.cosh(30)),
        ("* | extend a = 30 | extend b = sin(a)", _m.sin(30)),
        ("* | extend a = 30 | extend b = tan(a)", _m.tan(30)),
        ("* | extend a = 30 | extend b = tanh(a)", _m.tanh(30)),
        ("* | extend a = 30 | extend b = is_finite(a)", True),
        ("* | extend a = 30 | extend b = is_infinite(a)", False),
        ("* | extend a = 30 | extend b = is_nan(a)", False),
        ("* | extend a = 1342.2, b = 13.1, c = 8.9 | extend d = greatest(a, b, c)",
         1342.2),
        ("* | extend a = 1342.2, b = 13.1, c = 8.9 | extend d = least(a, b, c)",
         8.9),
        # -- regexp ------------------------------------------------------
        ("* | extend a = 'this is word 555' | extend b = regexp_extract(a, '(\\d+)')",
         "555"),
        ("* | extend a = 'this is word 555' | extend b = regexp_extract(a, '(\\d+)', 1)",
         "555"),
        ("* | extend a = 'this is word 555' | extend b = regexp_extract_all(a, '(\\d+)', 1)",
         ["555"]),
        ("* | extend a = 'this is word 555' | extend b = regexp_like(a, '(\\d+)')",
         True),
        ("* | extend a = 'this is word 555' | extend b = regexp_replace(a, '(\\d+)')",
         "this is word "),
        ("* | extend a = '1a 2b 14m' | extend b = regexp_replace(a, '(\\d+)([ab]) ', '3c$2' )",
         "3ca3cb14m"),
        # -- r5 completion: the remaining deterministic scalar lines -----
        ("* | extend a = 'this is word 555' | extend b = ltrim(a)",
         "this is word 555"),
        ("* | extend a = 'this is word 555' | extend b = rtrim(a)",
         "this is word 555"),
        ("* | extend a = 'this is word 555' | extend b = trim(a)",
         "this is word 555"),
        ("* | extend a = cast('4444' as VARBINARY), b = cast('this is key' as VARBINARY) | extend c = hmac_md5(a, b)",
         bytearray(__import__("hmac").new(b"this is key", b"4444", "md5").digest())),
        ("* | extend a = cast('4444' as VARBINARY), b = cast('this is key' as VARBINARY) | extend c = hmac_sha1(a, b)",
         bytearray(__import__("hmac").new(b"this is key", b"4444", "sha1").digest())),
        ("* | extend a = cast('4444' as VARBINARY), b = cast('this is key' as VARBINARY) | extend c = hmac_sha256(a, b)",
         bytearray(__import__("hmac").new(b"this is key", b"4444", "sha256").digest())),
        ("* | extend a = cast('4444' as VARBINARY), b = cast('this is key' as VARBINARY) | extend c = hmac_sha512(a, b)",
         bytearray(__import__("hmac").new(b"this is key", b"4444", "sha512").digest())),
        # Presto md5/sha*/xxhash64(varbinary) return VARBINARY digests
        ("* | extend a = cast('4444' as VARBINARY) | extend b = md5(a)",
         bytearray(__import__("hashlib").md5(b"4444").digest())),
        ("* | extend a = cast('4444' as VARBINARY) | extend b = sha1(a)",
         bytearray(__import__("hashlib").sha1(b"4444").digest())),
        ("* | extend a = cast('4444' as VARBINARY) | extend b = sha256(a)",
         bytearray(__import__("hashlib").sha256(b"4444").digest())),
        ("* | extend a = cast('4444' as VARBINARY) | extend b = sha512(a)",
         bytearray(__import__("hashlib").sha512(b"4444").digest())),
        # Presto xxhash64: seed-0 XXH64 → 8-byte varbinary (value pinned
        # through the published-vector-anchored transcription; byte order
        # = Presto's Slice.setLong, little-endian)
        ("* | extend a = cast('4444' as VARBINARY) | extend b = xxhash64(a)",
         bytearray(_xxh64_ref(b"4444").to_bytes(8, "little"))),
        ("* | extend a = 1534521600 | extend b = from_unixtime(a)",
         __import__("datetime").datetime(2018, 8, 17, 16, 0)),
        ("* | extend a = 'catl eopard mouse', b = 'cati1 leopard2 mouse2' | extend b = concat(a, b)",
         "catl eopard mousecati1 leopard2 mouse2"),
        ("* | extend a = 30 | extend b = ceiling(a)", 30),
        ("* | extend a = 30 | extend b = floor(a)", 30),
        ("* | extend a = 30 | extend b = power(a, 3)", 27000.0),
        ("* | extend a = 30 | extend b = asin(a)", _nan()),
        ("* | extend a = e() | extend b = a", _m.e),
        ("* | extend a = pi() | extend b = a", _m.pi),
        ("* | extend a = infinity() | extend b = a", float("inf")),
        ("* | extend a = nan() | extend b = a", _nan()),
        ("* | extend a = map()", {}),
        ("* | extend a = empty_approx_set()", None),
        # Presto json_parse canonicalizes (whitespace dropped)
        ("* | extend a = '{\"x\": {\"a\": 1, \"b\": 2}}' | extend b = json_parse(a)",
         '{"x":{"a":1,"b":2}}'),
        ("* | extend a = json_parse('{\"x\": {\"a\": 1, \"b\": 2}}') | extend b = json_format(a)",
         '{"x":{"a":1,"b":2}}'),
        ("* | extend a = json_parse('{\"x\": {\"a\": [1, 2], \"b\": 2}}') | extend b = json_size(a, '$.x.a')",
         2),
    ]

    # nondeterministic corpus lines: anchor a PROPERTY, not a value
    PROPERTY_CASES = [
        ("* | extend a = current_date",
         lambda v: abs((v - __import__("datetime").date.today()).days) <= 1),
        ("* | extend a = rand() | extend b = a",
         lambda v: 0.0 <= v < 1.0),
        ("* | extend a = random() | extend b = a",
         lambda v: 0.0 <= v < 1.0),
        ("* | extend a = ARRAY [10, 20, 30] | extend b = shuffle(a)",
         lambda v: sorted(v) == [10, 20, 30]),
    ]

    # the only corpus lines with NO independent offline anchor: SpookyV2
    # absolute values (no published KATs reachable offline; the family is
    # cross-checked against an independent transcription in
    # tests/test_spl.py::TestScalarParity + tests/spooky_ref.py)
    UNTESTABLE_OFFLINE = [
        "* | extend a = cast('4444' as VARBINARY) | extend b = spooky_hash_v2_32(a)",
        "* | extend a = cast('4444' as VARBINARY) | extend b = spooky_hash_v2_64(a)",
    ]

    @staticmethod
    def _norm(v):
        import datetime
        import math
        from decimal import Decimal

        if isinstance(v, Decimal):
            return float(v)
        if isinstance(v, float):
            return round(v, 9) if math.isfinite(v) else v
        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None)
        if isinstance(v, (list, tuple)):
            return [TestCorpusValueAnchors._norm(x) for x in v]
        if isinstance(v, dict):
            return {k: TestCorpusValueAnchors._norm(x) for k, x in sorted(v.items())}
        if hasattr(v, "asDict"):  # Row
            return [TestCorpusValueAnchors._norm(x) for x in v]
        return v

    def test_corpus_value_anchors(self, spark):
        import math

        df = spark.createDataFrame([(0,)], "idx int")
        failures = []
        for spl, want in self.CASES:
            try:
                out = run_spl(df, spl)[0]
                row = out.drop("idx").collect()[0]
                got = row[len(row) - 1]
            except Exception as e:  # noqa: BLE001
                failures.append(f"{spl!r}: ERROR {e}")
                continue
            g, w = self._norm(got), self._norm(want)
            ok = (
                g == w
                or (
                    isinstance(g, float) and isinstance(w, float)
                    and (
                        (math.isnan(g) and math.isnan(w))
                        or (
                            math.isfinite(g) and math.isfinite(w)
                            and math.isclose(g, w, rel_tol=1e-9, abs_tol=1e-12)
                        )
                    )
                )
            )
            if not ok:
                failures.append(f"{spl!r}: got {got!r} want {want!r}")
        assert not failures, (
            f"{len(failures)}/{len(self.CASES)} corpus value anchors failed:\n"
            + "\n".join(failures[:20])
        )

    def test_corpus_property_anchors(self, spark):
        """Nondeterministic corpus lines: assert the defining property."""
        df = spark.createDataFrame([(0,)], "idx int")
        for spl, prop in self.PROPERTY_CASES:
            out = run_spl(df, spl)[0]
            row = out.drop("idx").collect()[0]
            got = row[len(row) - 1]
            assert prop(got), f"{spl!r}: property failed for {got!r}"


class TestCorpusCommandAnchors:
    """Value anchors for the corpus's pipeline-command lines (spl.txt:1-40)
    over the spl_df fixture. Independent basis: the reference's own
    command value tests (SplUnittest.cpp TestJsonParse/TestRegexParse/
    TestRegexCSV/TestRegexKV expected outputs) + RFC 4180 quoting
    semantics (cross-derivable with Python's csv module). Non-matching
    parse-regexp extraction yielding '' is engine-pinned (the reference
    fixes no value for it in its tests)."""

    CASES = [
        (r"*| parse-regexp content, '(\S+)' as ip",
         {"ip": ["value_3_0", "value_4_0"]}),
        (r"*| parse-regexp content, '\S+\s+(\w+)' as method",
         {"method": ["", ""]}),
        (r"*| parse-regexp content, '(\S+)\s+(\w+)' as ip, method",
         {"ip": ["", ""], "method": ["", ""]}),
        (r"*| parse-regexp content, '(?P<ip>\S+)\s+(?P<method>\w+)'",
         {"ip": ["", ""], "method": ["", ""]}),
        ("*| parse-json map_str",
         {"parsed": [{"k1": "v1", "body": '{"x":1}'},
                     {"k1": "v2", "body": '{"x":2}'}]}),
        ("*| parse-json -prefix='prefix_' map_str",
         {"prefix_parsed": [{"prefix_k1": "v1", "prefix_body": '{"x":1}'},
                            {"prefix_k1": "v2", "prefix_body": '{"x":2}'}]}),
        ("*| parse-json -path='$.body' content_body",
         {"parsed": [{"x": "1"}, {"x": "1"}]}),
        ("*| parse-csv content_csv as ip, time, host",
         {"ip": ["1.2.3.4", '"q'], "time": ["10:00", 'x"'],
          "host": ["web1", "11:00"]}),
        ("*| parse-csv -quote='\"' content_csv as ip, time, host",
         {"ip": ["1.2.3.4", "q,x"], "time": ["10:00", "11:00"],
          "host": ["web1", "web2"]}),
        ("*| parse-csv -delim=';' content_delim as ip, time, host",
         {"ip": ["1", "1"], "time": ["2", "2"], "host": ["3", "3"]}),
        ("*| parse-csv -strict content_csv as ip, time",
         {"ip": [None, None], "time": [None, None]}),
        ("*| parse-csv -strict content_csv as ip, time, host, extra_field",
         {"ip": [None, '"q'], "time": [None, 'x"'],
          "host": [None, "11:00"], "extra_field": [None, "web2"]}),
        ("*| parse-kv -delims='&?' content_kv",
         {"kv": [{"a": "1", "b": "2"}, {"c": "3", "d": "4"}]}),
        ("*| parse-kv -mode='preserve' -delims='&?' content_kv",
         {"kv": [{"a": "1", "b": "2"}, {"c": "3", "d": "4"}]}),
        ("*| parse-kv -kv-sep=':' -delims='&?' content_sep",
         {"kv": [{"a": "1", "b": "2"}] * 2}),
        ("*| parse-kv -kv-sep=':' -prefix='prefix_' -delims='&?' content_sep",
         {"prefix_kv": [{"prefix_a": "1", "prefix_b": "2"}] * 2}),
        ("*| parse-csv content_simp as ip, time, host",
         {"ip": ["1.2.3.4"] * 2, "time": ["10:00"] * 2, "host": ["web1"] * 2}),
        ("*| parse-csv -quote='\"' content_simp as ip, time, host",
         {"ip": ["1.2.3.4"] * 2, "time": ["10:00"] * 2, "host": ["web1"] * 2}),
        ("*| parse-csv -strict content_simp as ip, time, host",
         {"ip": ["1.2.3.4"] * 2, "time": ["10:00"] * 2, "host": ["web1"] * 2}),
        ("*| parse-csv -strict content_simp as ip, time",
         {"ip": [None, None], "time": [None, None]}),
        ("*| parse-csv -strict content_simp as ip, time, host, extra_field",
         {"ip": [None, None], "time": [None, None], "host": [None, None],
          "extra_field": [None, None]}),
        ("*| parse-csv content_complex as ip, time, host",
         {"ip": ["1.2.3.4"] * 2, "time": ['"10:00"'] * 2,
          "host": ["web1"] * 2}),
        ("*| parse-csv -quote='\\x09' content_complex as ip, time, host",
         {"ip": ["1.2.3.4"] * 2, "time": ['"10:00"'] * 2,
          "host": ["web1"] * 2}),
        ("*| parse-csv -quote='\\t' content_complex as ip, time, host",
         {"ip": ["1.2.3.4"] * 2, "time": ['"10:00"'] * 2,
          "host": ["web1"] * 2}),
        ("*| parse-csv -quote='-' content_complex as ip, time, host",
         {"ip": ["1.2.3.4"] * 2, "time": ['"10:00"'] * 2,
          "host": ["web1"] * 2}),
        ("*| parse-csv -delim='\\' content_delim1 as ip, time, host",
         {"ip": ["a"] * 2, "time": ["b"] * 2, "host": ["c"] * 2}),
        ("*| parse-csv -delim='\\11' content_delim2 as ip, time, host",
         {"ip": ["a"] * 2, "time": ["b"] * 2, "host": ["c"] * 2}),
        ("*| parse-csv -delim='\\x09' content_delim3 as ip, time, host",
         {"ip": ["a"] * 2, "time": ["b"] * 2, "host": ["c"] * 2}),
        # chained lines (spl.txt:37-40): later stages add/overwrite cols
        (r"* | parse-regexp content, '(\S+)' as ip | parse-regexp content,"
         r" '\S+\s+(\w+)' as method | parse-regexp content, '(\S+)\s+(\w+)'"
         r" as ipp, methodd | parse-regexp content,"
         r" '(?P<ippp>\S+)\s+(?P<methoddd>\w+)'",
         {"ip": ["value_3_0", "value_4_0"], "method": ["", ""],
          "ipp": ["", ""], "ippp": ["", ""]}),
        ("* | parse-json map_str | parse-json -prefix='prefix_' map_str"
         " | parse-json -path='$.body' content_body",
         {"parsed": [{"x": "1"}, {"x": "1"}],
          "prefix_parsed": [{"prefix_k1": "v1", "prefix_body": '{"x":1}'},
                            {"prefix_k1": "v2", "prefix_body": '{"x":2}'}]}),
        ("* | parse-csv content_csv as ip, time, host | parse-csv"
         " -quote='\"' content_csv as ip1, time1, host1 | parse-csv"
         " -delim=';' content_delim as ip2, time2, host3 | parse-csv"
         " -strict content_csv as ip4, time4 | parse-csv -strict"
         " content_csv as ip5, time5, host5, extra_field5",
         {"ip": ["1.2.3.4", '"q'], "ip1": ["1.2.3.4", "q,x"],
          "ip2": ["1", "1"], "ip4": [None, None],
          "ip5": [None, '"q'], "extra_field5": [None, "web2"]}),
        ("* | parse-kv -delims='&?' content_kv | parse-kv -mode='preserve'"
         " -delims='&?' content_kv | parse-kv -kv-sep=':' -delims='&?'"
         " content_sep | parse-kv -kv-sep=':' -prefix='prefix_'"
         " -delims='&?' content_sep",
         # stage 3 re-parses content_sep into 'kv', overwriting stage 1
         {"kv": [{"a": "1", "b": "2"}] * 2,
          "prefix_kv": [{"prefix_a": "1", "prefix_b": "2"}] * 2}),
    ]

    def test_corpus_command_anchors(self, spl_df):
        failures = []
        for spl, want_cols in self.CASES:
            try:
                out = run_spl(spl_df, spl)[0].orderBy("idx").collect()
            except Exception as e:  # noqa: BLE001
                failures.append(f"{spl!r}: ERROR {e}")
                continue
            for col, want in want_cols.items():
                got = [r[col] for r in out]
                if got != want:
                    failures.append(f"{spl!r} [{col}]: got {got!r} want {want!r}")
        assert not failures, (
            f"{len(failures)} command anchor mismatches:\n"
            + "\n".join(failures[:15])
        )


class TestTranslatorFuzz:
    """Seeded compositional fuzz of translate_expr: every rewrite family
    composed 2-deep with hostile string literals (rewrite keywords,
    arrows, brackets INSIDE literals) must still produce an expression
    Spark parses and executes. Pins the literal-aware rewrite engine
    structurally, beyond the corpus's fixed shapes."""

    LITERALS = [
        "'plain'",
        "'has repeat( inside'",
        "'a -> (b, c)'",
        "'ARRAY[1,2]'",
        "'map(x) contains('",
        "'from_unixtime(0)'",
        "'100% \\d+'",
    ]
    # {s} = string literal slot, {e} = nested scalar expression slot
    TEMPLATES = [
        "concat({s}, {s})",
        "replace({s}, 'a')",
        "repeat({s}, 2)",
        "strpos({s}, 'a')",
        "strrpos({s}, 'a', 1)",
        "split_part({s}, ',', 1)",
        "upper({s})",
        "length({s})",
        "truncate(3.14159, 2)",
        "bitwise_and(5, 3)",
        "bitwise_logical_shift_right(1342, 3, 64)",
        "array_position(ARRAY[1, 3, 2], 3)",
        "array_sum(ARRAY[1, 2, 3])",
        "cardinality(split({s}, ','))",
        "contains(ARRAY[{s}], {s})",
        "zip_with(ARRAY[1, 2], ARRAY[3, 4], (x, y) -> (y, x))",
        "transform(ARRAY[{s}], x -> (x, 1))",
        "json_size(json_parse('{{\"a\": [1]}}'), '$.a')",
        "json_format(json_parse('{{\"b\": 2}}'))",
        "url_extract_host('https://h/p')",
        "to_unixtime(from_unixtime(0))",
        "day_of_week(from_unixtime(0))",
        "width_bucket(3, ARRAY[0, 2, 4])",
        "slice(ARRAY[1, 2, 3], 0, 2)",
        "coalesce(cast({e} as string), {s})",
        "if(({e}) IS NOT NULL, 1, 0)",
        "concat(cast({e} as string), {s})",
    ]

    def test_seeded_compositions_execute(self, spark):
        import random

        rng = random.Random(4242)
        df = spark.createDataFrame([(0,)], "idx int")

        def render(depth):
            t = rng.choice(self.TEMPLATES)
            while depth == 0 and "{e}" in t:
                t = rng.choice(self.TEMPLATES)
            out = t
            while "{s}" in out:
                out = out.replace("{s}", rng.choice(self.LITERALS), 1)
            while "{e}" in out:
                out = out.replace("{e}", render(depth - 1), 1)
            return out

        failures = []
        exprs = [render(1) for _ in range(40)]
        # one job for all 40: each composed expression is a column
        cols = []
        for i, e in enumerate(exprs):
            try:
                cols.append(F.expr(translate_expr(e)).alias(f"c{i}"))
            except Exception as ex:  # noqa: BLE001
                failures.append(f"{e!r}: TRANSLATE/PARSE {ex}")
        try:
            df.select(*cols).collect()
        except Exception as ex:  # noqa: BLE001
            # bisect to name the culprits
            for i, c in enumerate(cols):
                try:
                    df.select(c).collect()
                except Exception as e2:  # noqa: BLE001
                    failures.append(f"{exprs[i]!r}: EXECUTE {e2}")
        assert not failures, "\n".join(failures[:8])


@pytest.mark.skipif(not os.path.exists(SPL_CORPUS), reason="corpus not present")
class TestCorpusCoverage:
    def test_every_corpus_line_accounted(self):
        """VERDICT r4 #3 done-criterion: every corpus line is either
        value-anchored (scalar or command), property-anchored, or on the
        explicit untestable-offline list."""
        import re as _re

        norm = lambda s: _re.sub(r"\s+", " ", s).strip()  # noqa: E731
        with open(SPL_CORPUS) as f:
            corpus = [norm(l) for l in f if l.strip()]
        covered = set()
        for spl, _ in TestCorpusValueAnchors.CASES:
            covered.add(norm(spl))
        for spl, _ in TestCorpusValueAnchors.PROPERTY_CASES:
            covered.add(norm(spl))
        for spl in TestCorpusValueAnchors.UNTESTABLE_OFFLINE:
            covered.add(norm(spl))
        for spl, _ in TestCorpusCommandAnchors.CASES:
            covered.add(norm(spl))
        missing = [l for l in corpus if l not in covered]
        assert not missing, (
            f"{len(missing)} corpus lines unaccounted:\n"
            + "\n".join(repr(m[:100]) for m in missing[:10])
        )
