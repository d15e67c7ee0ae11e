"""Conversation-level stats / audit / dedup (functions/convstats.py).

Hand-built dirty fixture: duplicate turn_idx, a numbering gap, a
timestamp inversion, a 1-based conversation, an exact duplicate
conversation, and a degenerate repeating conversation — every signal
asserted against hand-computed values.
"""

from __future__ import annotations

import datetime as dt

import pytest

from loongcollector_spark.functions import convstats

_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # c1: clean 3-turn conversation (user → assistant → user)
        ("c1", 0, "user", "hi", "none", _t(0)),
        ("c1", 1, "assistant", "hello there", "search", _t(1)),
        ("c1", 2, "user", "bye", "none", _t(2)),
        # c2: duplicate turn_idx 1 (two rows), gap (no 2, then 3),
        # and a timestamp inversion at turn 3
        ("c2", 0, "user", "a", "none", _t(0)),
        ("c2", 1, "assistant", "b", "code", _t(1)),
        ("c2", 1, "assistant", "b2", "code", _t(2)),
        ("c2", 3, "user", "c", "none", _t(0, 30)),  # ts < 01:00 → inversion
        # c3: 1-based numbering, otherwise clean
        ("c3", 1, "user", "x", "none", _t(0)),
        ("c3", 2, "assistant", "y", "none", _t(1)),
        # c4: exact copy of c1's (role, text) sequence — dup conversation
        ("c4", 0, "user", "hi", "none", _t(5)),
        ("c4", 1, "assistant", "hello there", "search", _t(6)),
        ("c4", 2, "user", "bye", "none", _t(7)),
        # c5: degenerate loop — same assistant text repeated 4×
        ("c5", 0, "assistant", "loop", "code", _t(0)),
        ("c5", 1, "assistant", "loop", "code", _t(1)),
        ("c5", 2, "assistant", "loop", "code", _t(2)),
        ("c5", 3, "assistant", "loop", "code", _t(3)),
    ]
    return spark.createDataFrame(rows, _SCHEMA).cache()


class TestTurnOrderAudit:
    def test_signals(self, dirty):
        out = {
            r["conv_id"]: r.asDict()
            for r in convstats.turn_order_audit(dirty).collect()
        }
        c1 = out["c1"]
        assert (c1["n_dup_turns"], c1["n_gaps"], c1["n_ts_inversions"]) == (0, 0, 0)
        assert c1["base_ok"] and c1["is_clean"]
        c2 = out["c2"]
        assert c2["n_turns"] == 4
        assert c2["n_dup_turns"] == 1  # 4 rows, 3 distinct idx
        assert c2["n_gaps"] == 1  # {0,1,3} misses 2
        assert c2["n_ts_inversions"] == 1  # 00:30 after 02:00
        assert c2["base_ok"] and not c2["is_clean"]
        c3 = out["c3"]
        assert not c3["base_ok"] and not c3["is_clean"]
        assert (c3["n_dup_turns"], c3["n_gaps"]) == (0, 0)

    def test_dup_idx_ordering_deterministic(self, dirty):
        # duplicate turn_idx rows are tie-broken by ts, so the lag
        # comparison is stable under any input partitioning
        a = convstats.turn_order_audit(dirty.repartition(7)).collect()
        b = convstats.turn_order_audit(dirty.coalesce(1)).collect()
        key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
        assert key(a) == key(b)


class TestRoleTransitionMatrix:
    def test_counts(self, dirty):
        out = {
            (r["role"], r["next_role"]): r["n_transitions"]
            for r in convstats.role_transition_matrix(dirty).collect()
        }
        # u→a: c1, c2, c3, c4; a→u: c1, c2, c4
        assert out[("user", "assistant")] == 4
        assert out[("assistant", "user")] == 3
        assert out[("user", "<end>")] == 3  # c1, c2, c4 end on user
        # c5: three a→a plus terminal
        assert out[("assistant", "assistant")] >= 3
        # row sums over `role` == turn counts
        assert sum(out.values()) == dirty.count()


class TestConversationFingerprint:
    def test_dup_marking(self, dirty):
        out = {
            r["conv_id"]: r.asDict()
            for r in convstats.conversation_fingerprint(dirty).collect()
        }
        assert out["c1"]["conv_digest"] == out["c4"]["conv_digest"]
        assert out["c1"]["n_copies"] == 2 and out["c4"]["n_copies"] == 2
        assert out["c1"]["keep"] and not out["c4"]["keep"]  # keep-first
        assert out["c2"]["n_copies"] == 1 and out["c2"]["keep"]
        assert out["c5"]["n_turns"] == 4
        digs = {v["conv_digest"] for v in out.values()}
        assert len(digs) == 4  # c1==c4, the rest distinct

    def test_order_sensitivity(self, spark):
        rows = [
            ("a", 0, "user", "x", "none", _t(0)),
            ("a", 1, "user", "y", "none", _t(1)),
            ("b", 0, "user", "y", "none", _t(0)),
            ("b", 1, "user", "x", "none", _t(1)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        out = convstats.conversation_fingerprint(df).collect()
        digs = {r["conv_id"]: r["conv_digest"] for r in out}
        assert digs["a"] != digs["b"]  # same multiset, different order


class TestConversationFingerprintXor:
    def test_agrees_with_serialize_variant(self, dirty):
        ser = {
            r["conv_id"]: (r["n_turns"], r["n_copies"], r["keep"])
            for r in convstats.conversation_fingerprint(dirty).collect()
        }
        xor = {
            r["conv_id"]: (r["n_turns"], r["n_copies"], r["keep"])
            for r in convstats.conversation_fingerprint_xor(dirty).collect()
        }
        assert ser == xor

    def test_order_sensitivity(self, spark):
        rows = [
            ("a", 0, "user", "x", "none", _t(0)),
            ("a", 1, "user", "y", "none", _t(1)),
            ("b", 0, "user", "y", "none", _t(0)),
            ("b", 1, "user", "x", "none", _t(1)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        out = convstats.conversation_fingerprint_xor(df).collect()
        digs = {r["conv_id"]: r["conv_digest_xor"] for r in out}
        assert digs["a"] != digs["b"]  # commutative fold, position-bound

    def test_partial_aggregation_no_materialization(self, dirty):
        # the whole point: the conversation agg partial-aggregates
        # map-side (bit_xor is commutative) and nothing collect_lists
        plan = (
            convstats.conversation_fingerprint_xor(dirty)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "collect_list" not in plan
        assert "partial_bit_xor" in plan

    def test_numbering_base_sensitivity_documented(self, spark):
        # unlike the serialize variant, the xor digest binds the RAW
        # order value: a 1-based copy of a 0-based conversation is a
        # different digest (gate on turn_order_audit.is_clean upstream)
        rows = [
            ("a", 0, "user", "x", "none", _t(0)),
            ("a", 1, "user", "y", "none", _t(1)),
            ("b", 1, "user", "x", "none", _t(0)),
            ("b", 2, "user", "y", "none", _t(1)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        ser = {
            r["conv_id"]: r["conv_digest"]
            for r in convstats.conversation_fingerprint(df).collect()
        }
        xor = {
            r["conv_id"]: r["conv_digest_xor"]
            for r in convstats.conversation_fingerprint_xor(df).collect()
        }
        assert ser["a"] == ser["b"]  # serialize: numbering-agnostic
        assert xor["a"] != xor["b"]  # xor: canonical numbering required


class TestQualitySignals:
    def test_signals_and_keep(self, dirty):
        out = {
            r["conv_id"]: r.asDict()
            for r in convstats.conversation_quality_signals(dirty).collect()
        }
        c1 = out["c1"]
        assert c1["n_turns"] == 3
        assert c1["assistant_frac"] == pytest.approx(1 / 3, abs=1e-6)
        assert c1["mean_assistant_chars"] == 11.0  # "hello there"
        assert c1["dup_text_frac"] == 0.0
        assert c1["keep"]
        c5 = out["c5"]
        assert c5["dup_text_frac"] == 0.75  # 4 rows, 1 distinct
        assert not c5["keep"]  # repetition + assistant_frac 1.0
        assert out["c3"]["mean_assistant_chars"] == 1.0  # "y"

    def test_no_assistant_mean_is_null(self, spark):
        rows = [
            ("u", 0, "user", "q1", "none", _t(0)),
            ("u", 1, "user", "q2", "none", _t(1)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        (r,) = convstats.conversation_quality_signals(df).collect()
        assert r["mean_assistant_chars"] is None
        assert not r["keep"]  # assistant_frac 0 < min band

    def test_turn_bounds(self, spark):
        rows = [("solo", 0, "assistant", "only", "none", _t(0))]
        df = spark.createDataFrame(rows, _SCHEMA)
        (r,) = convstats.conversation_quality_signals(df).collect()
        assert not r["keep"]  # n_turns < min_turns


class TestConversationGate:
    def test_agrees_with_component_operators(self, dirty):
        gate = {
            r["conv_id"]: r.asDict()
            for r in convstats.conversation_gate(dirty).collect()
        }
        audit = {
            r["conv_id"]: r.asDict()
            for r in convstats.turn_order_audit(dirty).collect()
        }
        quality = {
            r["conv_id"]: r.asDict()
            for r in convstats.conversation_quality_signals(dirty).collect()
        }
        xor = {
            r["conv_id"]: r.asDict()
            for r in convstats.conversation_fingerprint_xor(dirty).collect()
        }
        for c in gate:
            for col in ("n_dup_turns", "n_gaps", "n_ts_inversions", "base_ok"):
                assert gate[c][col] == audit[c][col], (c, col)
            assert gate[c]["is_clean"] == audit[c]["is_clean"]
            for col in ("n_turns", "assistant_frac", "dup_text_frac"):
                assert gate[c][col] == quality[c][col], (c, col)
            assert gate[c]["quality_ok"] == quality[c]["keep"]
            assert gate[c]["conv_digest_xor"] == xor[c]["conv_digest_xor"]
            assert gate[c]["dedup_keep"] == xor[c]["keep"]
            assert gate[c]["keep"] == (
                audit[c]["is_clean"] and quality[c]["keep"] and xor[c]["keep"]
            )

    def test_single_turns_exchange(self, dirty):
        # the whole point of the fusion: audit+quality+digest share ONE
        # conversation-keyed Exchange; only the dedup window adds a
        # second (conversations-sized) one
        plan = (
            convstats.conversation_gate(dirty)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
        assert "collect_list" not in plan


class TestTrainingExport:
    def test_exports_only_kept_conversations(self, dirty):
        gate = convstats.conversation_gate(dirty)
        kept = {r["conv_id"] for r in gate.where("keep").collect()}
        out = convstats.training_export(dirty).collect()
        assert {r["conv_id"] for r in out} == kept
        # every turn of each surviving conversation is exported
        n_by_conv = {
            r["conv_id"]: r["n_turns"] for r in gate.collect()
        }
        from collections import Counter

        got = Counter(r["conv_id"] for r in out)
        assert dict(got) == {c: n_by_conv[c] for c in kept}

    def test_redaction_and_token_count(self, spark):
        rows = [
            ("a", 0, "user", "call 5551234567 now", "none", _t(0)),
            ("a", 1, "assistant", "ok 123 done", "none", _t(1)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        out = {
            r["turn_idx"]: r.asDict()
            for r in convstats.training_export(
                df, min_turns=1, min_assistant_frac=0.0
            ).collect()
        }
        assert out[0]["text_redacted"] == "call <num> now"
        # "call", "<", "num", ">", "now" → 5 bpe-ish tokens
        assert out[0]["n_tokens"] == 5
        # short digit runs (<4) survive redaction
        assert out[1]["text_redacted"] == "ok 123 done"
        assert out[1]["n_tokens"] == 3  # "ok", "123" (one digit run), "done"


class TestToolUsageStats:
    def test_profile(self, dirty):
        out = {
            r["tool"]: r.asDict()
            for r in convstats.tool_usage_stats(dirty).collect()
        }
        assert "none" not in out
        s = out["search"]
        # c1 turn 1 of 0..2 → 0.5; c4 same → mean 0.5
        assert s["n_calls"] == 2 and s["n_convs"] == 2
        assert s["mean_rel_position"] == pytest.approx(0.5, abs=1e-6)
        c = out["code"]
        # c2: idx 1,1 of 0..3 → 1/3, 1/3; c5: 0,1/3,2/3,1
        assert c["n_calls"] == 6 and c["n_convs"] == 2
        exp = (1 / 3 + 1 / 3 + 0 + 1 / 3 + 2 / 3 + 1) / 6
        assert c["mean_rel_position"] == pytest.approx(exp, abs=1e-6)

    def test_single_turn_conversation_position_zero(self, spark):
        rows = [("solo", 5, "assistant", "x", "db", _t(0))]
        df = spark.createDataFrame(rows, _SCHEMA)
        (r,) = convstats.tool_usage_stats(df).collect()
        assert r["mean_rel_position"] == 0.0


class TestTurnRepetition:
    def test_loop_detection_hand_computed(self, spark):
        rows = [
            # conv a: exact repeat then a near-half rewrite
            ("a", 0, "assistant", "x y z", "none", _t(0)),
            ("a", 1, "assistant", "x y z", "none", _t(1)),
            ("a", 2, "assistant", "x y q", "none", _t(2)),
            # conv b: all-distinct turns
            ("b", 0, "user", "hello there", "none", _t(0)),
            ("b", 1, "assistant", "completely different words", "none", _t(1)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        out = {
            r["conv_id"]: r.asDict()
            for r in convstats.turn_repetition_signals(df).collect()
        }
        a = out["a"]
        assert a["n_exact_repeats"] == 1
        # jaccards: turn1 = 1.0; turn2 = |{x,y}| / |{x,y,z,q}| = 0.5
        assert a["n_near_repeats"] == 1
        assert a["mean_prev_jaccard"] == 0.75
        assert a["max_prev_jaccard"] == 1.0
        assert a["loop_suspect"]  # 1 near of 2 comparable turns
        b = out["b"]
        assert b["n_exact_repeats"] == 0 and b["n_near_repeats"] == 0
        assert b["mean_prev_jaccard"] == 0.0
        assert not b["loop_suspect"]

    def test_empty_turns_and_singletons(self, spark):
        rows = [
            ("a", 0, "assistant", "", "none", _t(0)),
            ("a", 1, "assistant", "", "none", _t(1)),  # empty==empty
            ("s", 0, "user", "solo", "none", _t(0)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        out = {
            r["conv_id"]: r.asDict()
            for r in convstats.turn_repetition_signals(df).collect()
        }
        assert out["a"]["n_exact_repeats"] == 1
        assert out["a"]["max_prev_jaccard"] == 1.0  # empty-vs-empty
        s = out["s"]
        assert s["mean_prev_jaccard"] is None  # no comparable turn
        assert not s["loop_suspect"]  # singletons are never suspects

    def test_null_text_pair_not_exact_repeat(self, spark):
        """r6 hashed-identity lag: NULL text keeps a NULL 64-bit
        identity, so NULL-vs-NULL is NOT an exact repeat (string
        `NULL == NULL` semantics), while both tokenize to the empty
        set and still count as a near repeat (Jaccard 1.0)."""
        rows = [
            ("n", 0, "assistant", None, "none", _t(0)),
            ("n", 1, "assistant", None, "none", _t(1)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        (r,) = convstats.turn_repetition_signals(df).collect()
        assert r["n_exact_repeats"] == 0
        assert r["n_near_repeats"] == 1
        assert r["max_prev_jaccard"] == 1.0

    def test_single_conv_exchange(self, dirty):
        plan = (
            convstats.turn_repetition_signals(dirty)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        # the lag window and the groupBy share one conv-keyed Exchange
        assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1
        assert "InPandas" not in plan


class TestPiiScan:
    def test_pattern_classes(self, spark):
        rows = [
            ("a", 0, "user", "mail me at bob@example.com or 10.0.0.1", "none", _t(0)),
            ("a", 1, "assistant", "card 4111111111111111 ok", "none", _t(1)),
            ("b", 0, "user", "nothing sensitive here", "none", _t(0)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        out = {
            r["conv_id"]: r.asDict()
            for r in convstats.pii_scan_stats(df).collect()
        }
        a = out["a"]
        assert a["n_email"] == 1 and a["n_ipv4"] == 1
        assert a["n_long_digit_run"] == 1  # the 16-digit run
        assert a["n_phone_ish"] == 1  # same span also phone-shaped
        assert a["n_pii_hits"] == 4 and a["n_turns_with_pii"] == 2
        b = out["b"]
        assert b["n_pii_hits"] == 0 and b["n_turns_with_pii"] == 0

    def test_narrow_plus_one_exchange(self, dirty):
        plan = (
            convstats.pii_scan_stats(dirty)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1
        assert "InPandas" not in plan


class TestJsonKeyDrift:
    def test_new_key_flagged_in_its_first_bucket(self, spark):
        rows = [
            ("a", 0, "user", '{"x": 1}', "none", _t(0)),
            ("a", 1, "user", '{"x": 2}', "none", dt.datetime(2024, 1, 2, 1)),
            ("a", 2, "user", '{"x": 3, "y": 4}', "none",
             dt.datetime(2024, 1, 2, 2)),  # y appears on day 2
            ("a", 3, "user", "not json", "none", dt.datetime(2024, 1, 2, 3)),
        ]
        df = spark.createDataFrame(rows, _SCHEMA)
        out = {
            (r["key"], str(r["bucket"])[:10]): r.asDict()
            for r in convstats.json_key_drift(df).collect()
        }
        assert out[("x", "2024-01-01")]["is_new"]
        assert not out[("x", "2024-01-02")]["is_new"]
        assert out[("y", "2024-01-02")]["is_new"]
        assert out[("y", "2024-01-02")]["n_rows"] == 1
        assert str(out[("x", "2024-01-02")]["first_seen"])[:10] == "2024-01-01"
        # invalid JSON row contributes nothing
        assert all(k in ("x", "y") for k, _ in out)
