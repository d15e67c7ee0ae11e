"""SPL compiler tests: semantic cases from SplUnittest.cpp + a corpus
smoke sweep over core/unittest/spl/spl.txt (parse+execute, mirroring the
reference's parse-only smoke at SplUnittest.cpp:74)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.functions.spl import SplProgram, run_spl, translate_expr

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
