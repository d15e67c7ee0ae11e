"""Split / explode / multiline-merge processors (SURVEY.md §2.1).

* field splits (``processor_split_char`` / ``processor_split_string``) —
  ``F.split`` + ``try_element_at``
* event splits (``processor_split_log_string`` / ``_regex``) — ``explode``:
  one event becomes many rows
* multiline merge (``processor_merge_multiline_log_native``) — the inverse:
  sessionize continuation lines into one event. Expressed with a window
  over (source, offset): a running count of start-markers assigns each
  line to its logical event, then ``collect_list`` within the group —
  no per-row Python, two narrow shuffles on the source key.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from loongcollector_spark.operators.base import Processor, register


def _split_char_quoted(value: str, sep: str, quote: str, keys: list[str],
                       preserve: bool):
    """Transcription of the QuoteFlag branch of splitValue
    (split_char.go:81-146): a quote is only honored at field start, a
    doubled quote escapes, and a closing quote must sit at EOL or before
    a separator — anything else is a parse failure. Returns
    (fields dict, preserve remainder | None, ok)."""
    out: dict[str, str] = {}
    key_idx, last, i, n = 0, 0, 0, len(value)
    while key_idx < len(keys) and i < n:
        c = value[i]
        if c == sep:
            out[keys[key_idx]] = ""
            last = i + 1
            i += 1
            key_idx += 1
        elif c == quote:
            i += 1
            buf: list[str] = []
            closed = False
            while i < n:
                if value[i] == quote:
                    if i == n - 1 or value[i + 1] == sep:
                        i += 1
                        out[keys[key_idx]] = "".join(buf)
                        last = i + 1
                        i += 1
                        closed = True
                        break
                    if value[i + 1] == quote:
                        i += 1
                        buf.append(value[i])
                    else:
                        return out, None, False  # no continue quote
                else:
                    buf.append(value[i])
                i += 1
            key_idx += 1
            if not closed and i >= n:
                # unterminated quote: Go's outer for still runs its
                # post-increment (applied above) before the i<len check
                # fails, so the raw rest (from the pre-quote offset)
                # falls to the NEXT key via the trailing rule below
                break
        else:
            nxt = value.find(sep, i)
            if nxt < 0:
                break
            out[keys[key_idx]] = value[i:nxt]
            last = nxt + 1
            i = last
            key_idx += 1
    rest = None
    if key_idx >= len(keys) and last < n:
        if preserve:
            rest = value[last:]
            last = n
    if key_idx < len(keys) and last < n:
        out[keys[key_idx]] = value[last:]
        key_idx += 1
    return out, rest, True


@register("processor_split_char")
class SplitChar(Processor):
    """Single-char split into SplitKeys, reference semantics
    (plugins/processor/split/char/split_char.go:70-191):

    * fields pairwise; interior empties are ``''`` but a TRAILING empty
      remainder leaves its key unset → NULL (go:149-152)
    * ``PreserveOthers`` (reference default true) keeps the raw unsplit
      remainder under ``_split_preserve_`` once keys are exhausted — not
      emitted when the final separator ends the value (go:134-146)
    * ``QuoteFlag``+``Quote``: the go:81-130 quote FSM (quote at field
      start, doubled-quote escape, close only at sep/EOL; malformed →
      parse failure) as an Arrow-batched pandas UDF — the quote path is
      inherently sequential, the plain path stays JVM-side
    * source column NULLed on success unless ``KeepSource``; kept on
      quote-parse failure when ``KeepSourceIfParseError`` (go:179-181)
    """

    def __init__(
        self,
        SourceKey: str,
        SplitSep: str = "\n",
        SplitKeys: list[str] | None = None,
        PreserveOthers: bool = True,
        QuoteFlag: bool = False,
        Quote: str = "",
        KeepSource: bool = False,
        KeepSourceIfParseError: bool = True,
    ) -> None:
        if len(SplitSep) != 1:
            raise ValueError("SplitSep must be a single char")
        if QuoteFlag and len(Quote) != 1:
            raise ValueError("Quote must be a single char when QuoteFlag set")
        self.source_key = SourceKey
        self.sep = SplitSep
        self.keys = list(SplitKeys or [])
        self.preserve_others = PreserveOthers
        self.quote = Quote if QuoteFlag else ""
        self.keep_source = KeepSource
        self.keep_source_if_err = KeepSourceIfParseError

    def _finish_source(self, df: DataFrame, ok) -> DataFrame:
        if self.keep_source:
            return df
        src = F.col(self.source_key)
        kept = F.when(~ok, src) if self.keep_source_if_err else F.lit(None)
        return df.withColumn(self.source_key, kept.cast("string"))

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        nk = len(self.keys)
        if self.quote:
            return self._call_quoted(df)
        if nk == 0:
            if self.preserve_others:
                df = df.withColumn("_split_preserve_", src)
            return self._finish_source(df, F.lit(True))
        arr = F.split(src, re.escape(self.sep), -1)
        n = F.size(arr)
        for i, k in enumerate(self.keys):
            fld = F.try_element_at(arr, F.lit(i + 1))
            # trailing empty remainder leaves the key unset (go:149-152)
            df = df.withColumn(
                k, F.when((F.lit(i + 1) < n) | (fld != ""), fld)
            )
        if self.preserve_others:
            rest = F.array_join(F.slice(arr, nk + 1, 1_000_000), self.sep)
            df = df.withColumn(
                "_split_preserve_",
                F.when((n > nk) & (rest != ""), rest),
            )
        return self._finish_source(df, F.lit(True))

    def _call_quoted(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        keys, sep, quote = self.keys, self.sep, self.quote
        preserve = self.preserve_others
        fields = [T.StructField(k, T.StringType()) for k in keys]
        fields.append(T.StructField("_split_preserve_", T.StringType()))
        fields.append(T.StructField("__ok__", T.BooleanType()))
        schema = T.StructType(fields)

        @F.pandas_udf(schema)
        def split_q(col):  # noqa: ANN001
            import pandas as pd

            rows = []
            for v in col:
                if v is None:
                    rows.append({f.name: None for f in fields})
                    continue
                out, rest, ok = _split_char_quoted(v, sep, quote, keys, preserve)
                rec = {k: out.get(k) for k in keys}
                rec["_split_preserve_"] = rest
                rec["__ok__"] = ok
                rows.append(rec)
            return pd.DataFrame(rows, columns=[f.name for f in fields])

        df = df.withColumn("__sq__", split_q(F.col(self.source_key)))
        for k in keys:
            df = df.withColumn(k, F.col("__sq__")[k])
        if preserve:
            df = df.withColumn(
                "_split_preserve_", F.col("__sq__")["_split_preserve_"]
            )
        ok = F.coalesce(F.col("__sq__")["__ok__"], F.lit(False))
        return self._finish_source(df, ok).drop("__sq__")


@register("processor_split_string")
class SplitString(SplitChar):
    """Multi-char delimiter variant
    (plugins/processor/split/string/split_string.go:34-46; plain split
    only — the string variant has no quote mode)."""

    def __init__(
        self,
        SourceKey: str,
        SplitSep: str = "\n",
        SplitKeys: list[str] | None = None,
        PreserveOthers: bool = True,
        KeepSource: bool = False,
        KeepSourceIfParseError: bool = True,
    ) -> None:
        self.source_key = SourceKey
        self.sep = SplitSep
        self.keys = list(SplitKeys or [])
        self.preserve_others = PreserveOthers
        self.quote = ""
        self.keep_source = KeepSource
        self.keep_source_if_err = KeepSourceIfParseError


@register("processor_split_log_string")
class SplitLogString(Processor):
    """Split ONE event into MANY by separator — ``explode``
    (plugins/processor/split/logstring/split_log_string.go; native twin
    core/plugin/processor/inner/ProcessorSplitLogStringNative.h:33-34).
    Preserves intra-event order via a ``part_idx`` column."""

    def __init__(
        self, SourceKey: str, SplitSep: str = "\n", PartIdxKey: str | None = "part_idx"
    ) -> None:
        self.source_key = SourceKey
        self.sep = SplitSep
        self.part_idx_key = PartIdxKey

    def __call__(self, df: DataFrame) -> DataFrame:
        arr = F.split(F.col(self.source_key), re.escape(self.sep), -1)
        if self.part_idx_key:
            return (
                df.select(
                    "*",
                    F.posexplode(arr).alias(self.part_idx_key, "__lc_part_val__"),
                )
                .withColumn(self.source_key, F.col("__lc_part_val__"))
                .drop("__lc_part_val__")
            )
        return df.withColumn(self.source_key, F.explode(arr))


@register("processor_split_log_regex")
class SplitLogRegex(Processor):
    """Split one event into many at line-start-regex boundaries (multiline
    split — plugins/processor/split/logregex/split_log_regex.go).

    Lines are grouped so each output part begins with a line matching
    ``SplitRegex``; leading non-matching lines form part 0 (the
    reference's NoMatchError/keep behavior). Pure array ops: split,
    running-flag via ``aggregate``, no UDF.
    """

    def __init__(self, SourceKey: str, SplitRegex: str, PartIdxKey: str = "part_idx"):
        self.source_key = SourceKey
        self.split_regex = SplitRegex
        self.part_idx_key = PartIdxKey

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        lines = F.split(src, r"\n", -1)
        rx = self.split_regex
        # per-line group id = running count of start-marker lines
        gid = F.transform(
            lines,
            lambda line, i: F.size(
                F.filter(
                    F.slice(lines, 1, i + 1),
                    lambda l: l.rlike(f"^(?:{rx})"),
                )
            ),
        )
        # zip lines with group ids, then collect per distinct gid
        zipped = F.zip_with(
            lines, gid, lambda line, g: F.struct(g.alias("g"), line.alias("line"))
        )
        groups = F.transform(
            F.array_distinct(F.transform(zipped, lambda s: s["g"])),
            lambda g: F.array_join(
                F.transform(
                    F.filter(zipped, lambda s: s["g"] == g),
                    lambda s: s["line"],
                ),
                "\n",
            ),
        )
        out = df.select(
            "*", F.posexplode(groups).alias(self.part_idx_key, "__lc_part_val__")
        )
        return out.withColumn(self.source_key, F.col("__lc_part_val__")).drop(
            "__lc_part_val__"
        )


def _scan_open_state(u, v, p0: bool):
    """Vectorized boolean scan of the recurrence p' = (p & u) | (~p & v).

    Every multiline mode's open/closed state is of this form, so the
    whole per-group FSM reduces to: each line is a SET (u==v, to value
    u), a TOGGLE (u=0, v=1), or IDENTITY (u=1, v=0); the state after
    line i is the value at the last SET xor the parity of TOGGLEs since
    it. cummax + cumsum — no per-row Python. Returns the state BEFORE
    each line."""
    import numpy as np

    n = len(u)
    if n == 0:
        return np.zeros(0, dtype=bool)
    is_set = u == v
    toggle = ~u & v
    idx = np.arange(n)
    last_set = np.maximum.accumulate(np.where(is_set, idx, -1))
    tog = np.cumsum(toggle)
    safe = np.clip(last_set, 0, None)
    base = np.where(last_set >= 0, u[safe], p0)
    parity = (tog - np.where(last_set >= 0, tog[safe], 0)) % 2
    p_after = base.astype(bool) ^ parity.astype(bool)
    out = np.empty(n, dtype=bool)
    out[0] = p0
    out[1:] = p_after[:-1]
    return out


# ChunkRows="auto": a group must exceed this many rows before the
# 3-shuffle chunk-parallel FSM beats the single-task plain path (the
# crossover measured in BENCH.md sits between a 400k-row and a 4M-row
# hot group; 1M is the conservative middle).
_AUTO_MIN_GROUP = 1_000_000


def _open_region_head_single(o, s, c, e, has_s, has_c, has_e,
                             merge_unmatched=False):
    """For ONE group sorted by order: the order value of the first line
    of the EOF-*open* region — the suffix whose merge outcome could
    still change if more lines arrived — or None when the group's whole
    output is final. Uses the same per-mode transition vectors as
    :func:`_merge_block_vectorized` (p' = (p & u) | (~p & v)); the open
    region is the event whose state is still open AFTER the last line.
    Powers the cross-trigger ``ForeachBatchMultilineMerge`` (streaming
    == batch equivalence; differential-tested across all modes and
    chunkings in tests/test_sinks_monitor.py)."""
    import numpy as np

    n = len(o)
    if n == 0:
        return None
    if has_e and not has_s and not has_c:
        # only-End: events split after each end line; the trailing
        # event (lines after the last 'e') is still collecting
        idx = np.flatnonzero(e)
        if len(idx) == 0:
            return o[0]
        return None if idx[-1] == n - 1 else o[idx[-1] + 1]
    if has_c and has_e and not has_s:
        # Continue+End: an open run exists iff the last line continues;
        # its head is the first line of the trailing continue-run
        if not c[n - 1]:
            return None
        j = n - 1
        while j > 0 and c[j - 1]:
            j -= 1
        return o[j]
    if has_s and has_e and not has_c:
        u, v = ~e, s
    elif has_s and has_c and not has_e:
        u, v = (c | s), s
    elif has_s and has_c and has_e:
        u, v = c, s
    else:  # start-only
        u, v = np.ones(n, dtype=bool), s
    p = _scan_open_state(u, v, False)
    p_after = (p[n - 1] & u[n - 1]) | (~p[n - 1] & v[n - 1])
    if not p_after:
        if merge_unmatched and not (has_c or has_e):
            # start-only 'merge' extension: p_after False ⟺ no start
            # marker yet, so the WHOLE group is one still-growing merged
            # leading event — fully open (ADVICE r4: without this,
            # streaming emitted the head per trigger while batch merges
            # it into one event)
            return o[0]
        return None
    if has_s and has_c and not has_e:
        boundary = s & (~p | ~c)
    elif has_c or has_e:
        boundary = ~p & s
    else:
        # start-only: a start line opens a new event even while open
        boundary = s
    idx = np.flatnonzero(boundary)
    # p can only open via a boundary line, so idx is non-empty; fall
    # back to the whole group (carry everything) if that ever breaks
    return o[idx[-1]] if len(idx) else o[0]


def _mode_uv(s, c, e, has_s, has_c, has_e):
    """Per-mode transition vectors for the FSM state recurrence
    p' = (p & u) | (~p & v), plus the state entering the FIRST line of a
    group. For the scan modes p is the open-event state; for only-End /
    Continue+End p is 'previous line was e / c' (a SET every line).
    Shared by the skew-chunked path; the block FSM keeps its original
    formulation and the two are pinned together by differential tests."""
    import numpy as np

    n = len(s)
    if has_e and not has_s and not has_c:
        return e, e, True          # p = prev-was-end; group start = boundary
    if has_c and has_e and not has_s:
        return c, c, False         # p = prev-was-continue
    if has_s and has_e and not has_c:
        return ~e, s, False
    if has_s and has_c and not has_e:
        return (c | s), s, False
    if has_s and has_c and has_e:
        return c, s, False
    return np.ones(n, dtype=bool), s, False   # start-only


def _mode_line_flags(p, s, c, e, has_s, has_c, has_e):
    """(member, boundary, close_ok | None, standalone) per line given the
    recurrence state ``p`` from :func:`_mode_uv`. Mirrors the mode
    dispatch in :func:`_merge_block_vectorized`."""
    import numpy as np

    zeros = np.zeros(len(p), dtype=bool)
    if has_e and not has_s and not has_c:
        return np.ones(len(p), dtype=bool), p, e, zeros
    if has_c and has_e and not has_s:
        return p | c, ~p & c, p & ~c & e, ~p & ~c & e
    if has_s and has_e and not has_c:
        return p | s, ~p & s, p & e, zeros
    if has_s and has_c and not has_e:
        return s | (p & c), s & (~p | ~c), None, zeros
    if has_s and has_c and has_e:
        return p | s, ~p & s, p & ~c & e, zeros
    return p | s, s, None, zeros   # start-only


def _merge_block_vectorized(g, o, v_series, s, c, e, has_s, has_c, has_e,
                            single_line):
    """Vectorized engine for the multiline merge FSM over a block of
    COMPLETE groups sorted by (group, order) — same semantics as
    :func:`_merge_rows_python` (the reference transcription of
    ProcessorMergeMultilineLogNative.cpp:161-345, kept for differential
    tests), but O(lines) numpy: open/closed state via
    :func:`_scan_open_state` (per-group reset by forcing the last line
    of each group to a SET-closed transition — its own state is already
    computed, only successors see the reset), event ids via cumsum of
    boundary flags, completeness via a per-event close mark, and one
    join call per EVENT (not per line). Processing whole sorted
    partitions instead of one pandas call per tiny group is what makes
    the pandas path cheap at 10^12-turn scale.

    Returns (groups, texts, orders, n_merged) lists."""
    import numpy as np
    import pandas as pd

    n = len(o)
    if n == 0:
        return [], [], [], []
    start = np.empty(n, dtype=bool)
    start[0] = True
    start[1:] = g[1:] != g[:-1]
    last = np.empty(n, dtype=bool)
    last[-1] = True
    last[:-1] = start[1:]
    standalone = np.zeros(n, dtype=bool)
    close_ok = None

    def scan(u, v):
        # force SET-closed on each group's final line so the next
        # group's first line reads the initial (closed) state
        u = u & ~last
        v = v & ~last
        return _scan_open_state(u, v, False)

    if has_e and not has_s and not has_c:
        # only-End: always inside; events split after each end line
        p = np.ones(n, dtype=bool)
        member = p
        boundary = start | np.concatenate(([False], e[:-1]))
        close_ok = e
    elif has_s and has_e and not has_c:
        # Start+End: open at start, close (after appending) at end
        p = scan(~e, s)
        member = p | s
        boundary = ~p & s
        close_ok = p & e
    elif has_s and has_c and not has_e:
        # Start+Continue: run of continues; a non-continue start line
        # both closes the run and opens a new event
        p = scan(c | s, s)
        member = s | (p & c)
        boundary = s & (~p | ~c)
    elif has_s and has_c and has_e:
        # Start+Continue+End: continues extend, any non-continue closes
        # (end decides matched/unmatched)
        p = scan(c, s)
        member = p | s
        boundary = ~p & s
        close_ok = p & ~c & e
    elif has_c and has_e:
        # Continue+End: open at continue; first non-continue line closes
        # (end decides); a lone end line outside is a complete event
        p = np.concatenate(([False], c[:-1])) & ~start
        member = p | c
        boundary = ~p & c
        close_ok = p & ~c & e
        standalone = ~p & ~c & e
    else:
        # Start-only (the JVM fast path normally handles this)
        p = scan(np.ones(n, dtype=bool), s)
        member = p | s
        boundary = s
    evt = np.cumsum(boundary)
    if close_ok is None:
        complete_line = member
    else:
        comp = np.zeros(int(evt[-1]) + 1, dtype=bool)
        comp[evt[close_ok]] = True
        complete_line = comp[evt]
    merged_mask = member & complete_line
    # dangling/broken events with an End pattern are unmatched per line
    unmatched = (~member & ~standalone) | (member & ~complete_line)
    v_obj = v_series.to_numpy(dtype=object)
    groups: list = []
    texts: list = []
    orders: list = []
    ns: list = []
    if merged_mask.any():
        # event runs are contiguous in the sorted block: one C-level
        # slice + join per EVENT (pandas groupby-agg here costs ~3x the
        # whole python FSM at 1M+ events)
        vm = v_obj[merged_mask]
        nulls = pd.isna(vm)
        if nulls.any():
            vm = vm.copy()
            vm[nulls] = ""
        em = evt[merged_mask]
        starts = np.flatnonzero(np.concatenate(([True], em[1:] != em[:-1])))
        ends = np.concatenate((starts[1:], [len(em)]))
        vl = vm.tolist()
        texts += [
            "\n".join(vl[a:b]) for a, b in zip(starts.tolist(), ends.tolist())
        ]
        groups += g[merged_mask][starts].tolist()
        orders += o[merged_mask][starts].tolist()
        ns += (ends - starts).tolist()
    keep = standalone | (unmatched if single_line else standalone)
    if keep.any():
        groups += list(g[keep])
        texts += list(v_obj[keep])
        orders += o[keep].tolist()
        ns += [1] * int(keep.sum())
    return groups, texts, orders, ns


def _merge_rows_vectorized(o, v_series, s, c, e, has_s, has_c, has_e,
                           single_line):
    """Single-group wrapper of :func:`_merge_block_vectorized` (used by
    the engine-parity tests); returns (texts, orders, n_merged)."""
    import numpy as np

    _, texts, orders, ns = _merge_block_vectorized(
        np.zeros(len(o), dtype=np.int64), o, v_series, s, c, e,
        has_s, has_c, has_e, single_line,
    )
    return texts, orders, ns


def _merge_rows_python(rows, has_s, has_c, has_e, single_line):
    """Reference per-row transcription of the two-state FSM
    (ProcessorMergeMultilineLogNative.cpp:161-345). Retained verbatim for
    differential testing of :func:`_merge_rows_vectorized`; production
    uses the vectorized engine. rows: (order, text, s, c, e) sorted."""
    out: list[tuple] = []
    events: list[tuple] = []  # (order, text)

    def emit_merge():
        if events:
            out.append(
                (
                    "\n".join("" if t is None else t for _, t in events),
                    events[0][0],
                    len(events),
                )
            )
            events.clear()

    def unmatch(batch):
        if single_line:
            for o, t in batch:
                out.append((t, o, 1))

    # only-End sticks to the partial state (.cpp:176-180)
    partial = not has_s and not has_c and has_e
    for o, t, s, c, e in rows:
        if not partial:
            primary = s if has_s else c
            if primary:
                events.append((o, t))
                partial = True
            elif has_e and not has_s and has_c and e:
                # continue+end: an end line outside a partial is a
                # complete single event (.cpp:230-238)
                out.append((t, o, 1))
            else:
                unmatch([(o, t)])
        else:
            if has_c and c:
                events.append((o, t))
                continue
            if has_e:
                events.append((o, t))
                if has_c:
                    # end pattern decides (.cpp:253-264)
                    if e:
                        emit_merge()
                    else:
                        unmatch(events)
                        events.clear()
                    partial = False
                else:
                    if e:
                        emit_merge()
                        if has_s:
                            partial = False
                        # only-end: stay partial, next log starts
                    # not end → wait for the next line
            else:
                if not has_c:
                    # start only (fast path handles this normally)
                    if not s:
                        events.append((o, t))
                    else:
                        emit_merge()
                        events.append((o, t))
                else:
                    # start+continue: current line broke the run
                    emit_merge()
                    if not s:
                        unmatch([(o, t)])
                        partial = False
                    else:
                        events.append((o, t))
    if partial and events:
        if not has_e:
            emit_merge()
        else:
            unmatch(events)  # dangling partial with End → unmatched
    return out


@register("processor_merge_multiline_log_native")
class MergeMultilineLog(Processor):
    """Merge continuation rows into one logical event
    (core/plugin/processor/inner/ProcessorMergeMultilineLogNative.cpp:161-345,
    ProcessorSplitMultilineLogStringNative.h:68-79).

    Rows ordered by (GroupKey, OrderKey). Supported pattern combinations
    mirror MergeLogsByRegex (.cpp:162-169): Start, Start+Continue,
    Start+End, Continue+End, End — Continue alone is invalid, exactly as
    in the reference. ``UnmatchedContentTreatment``: 'single_line' emits
    unmatched rows as their own events; 'discard' drops them.

    Physical plans:
    * Start-only fast path — a window over (GroupKey → OrderKey) computing
      a running sum of start flags (one shuffle on GroupKey), then groupBy
      the assigned event id with ``array_join(collect_list(...))``; no
      Python at all.
    * Continue/End combinations — two interchangeable engines, pinned
      equal by a mode×treatment differential:

      - ``Engine='pandas'`` (default): the reference's two-state FSM is
        inherently sequential per group, so it runs partition-level via
        Arrow with a vectorized numpy scan. The expensive part (regex
        matching) is still JVM-vectorized: Start/Continue/End flags are
        computed with ``rlike`` *before* the shuffle, so Python sees
        only booleans + strings — one shuffle on GroupKey.
      - ``Engine='sql'``: the merge recurrence solved in closed form
        with window functions (last-SET value xor toggle parity) —
        the same single shuffle with ZERO Python (no Arrow transfer,
        no Python workers). Measured: ties pandas on many-small-group
        inputs, ~30% slower on one huge serial group (5 window passes
        vs one numpy scan); pick it when the deployment should not
        carry Python workers for this operator.
    """

    def __init__(
        self,
        SourceKey: str,
        GroupKey: str,
        OrderKey: str,
        StartPattern: str | None = None,
        ContinuePattern: str | None = None,
        EndPattern: str | None = None,
        UnmatchedContentTreatment: str = "single_line",
        ChunkRows: int | None = None,
        Engine: str = "pandas",
    ) -> None:
        if not (StartPattern or ContinuePattern or EndPattern):
            raise ValueError("at least one of Start/Continue/EndPattern required")
        if ContinuePattern and not (StartPattern or EndPattern):
            raise ValueError(
                "ContinuePattern alone is unsupported (reference "
                "MergeLogsByRegex supports start, start+continue, "
                "start+end, continue+end, end)"
            )
        for p in (StartPattern, ContinuePattern, EndPattern):
            if p:
                re.compile(p)  # fail fast at config time, like Init()
        if UnmatchedContentTreatment == "merge" and (
            ContinuePattern or EndPattern
        ):
            # the 'merge' extension (leading rows before the first start
            # marker collapse into ONE event) is only defined for the
            # Start-only mode; in FSM modes unmatched lines are interior,
            # where 'merge' has no reference-grounded meaning
            raise ValueError(
                "UnmatchedContentTreatment='merge' requires a Start-only "
                "pattern (engine extension; reference treatments are "
                "single_line/discard)"
            )
        self.source_key = SourceKey
        self.start_pattern = StartPattern
        self.continue_pattern = ContinuePattern
        self.end_pattern = EndPattern
        self.group_key = GroupKey
        self.order_key = OrderKey
        self.unmatched = UnmatchedContentTreatment
        if ChunkRows is not None and ChunkRows != "auto" and ChunkRows < 2:
            raise ValueError("ChunkRows must be >= 2 (or 'auto')")
        self.chunk_rows = ChunkRows
        if Engine not in ("sql", "pandas"):
            raise ValueError("Engine must be 'sql' or 'pandas'")
        self.engine = Engine

    def __call__(self, df: DataFrame) -> DataFrame:
        if df.isStreaming:
            # The batch merge needs a total per-group order; a streaming
            # source's _offset_ is only ordered within a micro-batch, so
            # the window/FSM here would interleave one file's lines
            # across triggers (VERDICT r2 #4). Fail loud with the right
            # tool instead of Spark's generic unsupported-window error.
            raise ValueError(
                "MergeMultilineLog is a batch operator; for streams use "
                "loongcollector_spark.streaming.pipeline."
                "ForeachBatchMultilineMerge (cross-trigger, batch-equal, "
                "all modes) or stateful_multiline_merge (start-pattern, "
                "applyInPandasWithState)"
            )
        if self.chunk_rows is not None:
            return self._call_fsm_chunked(df)
        if self.continue_pattern or self.end_pattern:
            if self.engine == "sql":
                return self._call_fsm_sql(df)
            return self._call_fsm(df)
        return self._call_start_only(df)

    def open_region_heads(self, df: DataFrame) -> DataFrame:
        """(GroupKey, __open_head__) per group whose EOF tail is still
        OPEN — the order value from which the merge outcome could change
        if more lines arrived; groups whose output is entirely final are
        absent. Used by ``streaming.ForeachBatchMultilineMerge`` to
        decide exactly which trailing raw lines to carry to the next
        micro-batch (everything before the head is emitted as final).
        Not a 10^12-row hot path: per-trigger inputs only."""
        from pyspark.sql import types as T

        src = F.col(self.source_key)
        has_s = self.start_pattern is not None
        has_c = self.continue_pattern is not None
        has_e = self.end_pattern is not None

        def flag(pattern):
            if not pattern:
                return F.lit(False)
            return F.coalesce(src.rlike(pattern), F.lit(False))

        # start-only fast path anchors the start pattern (_call_start_only)
        start_expr = (
            F.coalesce(
                src.rlike(f"^(?:{self.start_pattern})"), F.lit(False)
            )
            if (has_s and not has_c and not has_e)
            else flag(self.start_pattern)
        )
        gk, ok = self.group_key, self.order_key
        flagged = df.select(
            gk,
            ok,
            start_expr.alias("__s__"),
            flag(self.continue_pattern).alias("__c__"),
            flag(self.end_pattern).alias("__e__"),
        )
        in_schema = dict(zip(df.schema.names, df.schema.fields))
        out_schema = T.StructType(
            [
                in_schema[gk],
                T.StructField("__open_head__", in_schema[ok].dataType),
            ]
        )

        merge_unmatched = self.unmatched == "merge"

        def fn(pdf):
            import pandas as pd

            pdf = pdf.sort_values(ok)
            h = _open_region_head_single(
                pdf[ok].to_numpy(),
                pdf["__s__"].to_numpy(dtype=bool),
                pdf["__c__"].to_numpy(dtype=bool),
                pdf["__e__"].to_numpy(dtype=bool),
                has_s, has_c, has_e,
                merge_unmatched=merge_unmatched,
            )
            if h is None:
                return pd.DataFrame({gk: [], "__open_head__": []})
            return pd.DataFrame(
                {gk: [pdf[gk].iloc[0]], "__open_head__": [h]}
            )

        return flagged.groupBy(gk).applyInPandas(fn, out_schema)

    def _call_fsm_sql(self, df: DataFrame) -> DataFrame:
        """Pure-SQL FSM engine (r5): the merge recurrence
        p' = (p & u) | (~p & v) is solved in closed form with window
        functions — every line is a SET (u==v, to value u), a TOGGLE
        (~u & v), or IDENTITY, so the state after line i is the u-value
        at the last SET xor the parity of TOGGLEs since it (the same
        closed form as the numpy `_scan_open_state`, expressed as
        last(...ignorenulls) + cumulative sums over ONE window spec).
        Per-mode member/boundary/close flags and the event-id cumsum are
        plain column expressions, and the final groupBy(group, event)
        re-uses the window's hash partitioning (subset key → no second
        exchange), so the whole operator is ONE shuffle with zero
        Python — no Arrow transfer, no pandas. Differentially pinned
        against the pandas engine and the reference FSM transcription.
        """
        src = F.col(self.source_key)
        has_s = self.start_pattern is not None
        has_c = self.continue_pattern is not None
        has_e = self.end_pattern is not None
        single_line = self.unmatched != "discard"
        gk, okey, sk = self.group_key, self.order_key, self.source_key

        def flag(pattern):
            return (
                F.coalesce(src.rlike(pattern), F.lit(False))
                if pattern
                else F.lit(False)
            )

        flagged = df.select(
            gk,
            okey,
            src.alias("__v__"),
            flag(self.start_pattern).alias("__s__"),
            flag(self.continue_pattern).alias("__c__"),
            flag(self.end_pattern).alias("__e__"),
        )
        s, c, e = F.col("__s__"), F.col("__c__"), F.col("__e__")
        # per-mode transition vectors (mirrors _mode_uv)
        if has_e and not has_s and not has_c:
            u, v, p0 = e, e, True
        elif has_c and has_e and not has_s:
            u, v, p0 = c, c, False
        elif has_s and has_e and not has_c:
            u, v, p0 = ~e, s, False
        elif has_s and has_c and not has_e:
            u, v, p0 = c | s, s, False
        else:  # start+continue+end
            u, v, p0 = c, s, False
        w = Window.partitionBy(gk).orderBy(okey)
        wincl = w.rowsBetween(Window.unboundedPreceding, 0)
        # only-End / Continue+End SET the state every line (u == v), so
        # p is just the lagged flag — skip the toggle-parity machinery
        set_every_line = (has_e and not has_s and not has_c) or (
            has_c and has_e and not has_s
        )
        if set_every_line:
            step3 = flagged.withColumn("__p__", F.lag(u, 1, p0).over(w))
        else:
            is_set = u == v
            toggle = ~u & v
            step1 = flagged.select(
                "*",
                F.sum(toggle.cast("long")).over(wincl).alias("__tog__"),
            ).withColumn("__setu__", F.when(is_set, u))
            # p_after(i) = u@lastSET(≤i) xor parity of toggles since it;
            # both last()s share one window spec → one Window node
            step2 = step1.select(
                "*",
                F.coalesce(
                    F.last("__setu__", ignorenulls=True).over(wincl),
                    F.lit(p0),
                ).alias("__base__"),
                F.coalesce(
                    F.last(
                        F.when(
                            F.col("__setu__").isNotNull(), F.col("__tog__")
                        ),
                        ignorenulls=True,
                    ).over(wincl),
                    F.lit(0),
                ).alias("__tset__"),
            )
            # boolean xor as != (both sides non-null by construction)
            p_after = F.col("__base__") != (
                ((F.col("__tog__") - F.col("__tset__")) % 2) == 1
            )
            step3 = step2.withColumn(
                "__p__", F.lag(p_after, 1, p0).over(w)
            )
        p = F.col("__p__")
        # per-mode line flags (mirrors _mode_line_flags)
        standalone = F.lit(False)
        if has_e and not has_s and not has_c:
            member, boundary, close_ok = F.lit(True), p, e
        elif has_c and has_e and not has_s:
            member, boundary, close_ok = p | c, ~p & c, p & ~c & e
            standalone = ~p & ~c & e
        elif has_s and has_e and not has_c:
            member, boundary, close_ok = p | s, ~p & s, p & e
        elif has_s and has_c and not has_e:
            member, boundary, close_ok = s | (p & c), s & (~p | ~c), F.lit(True)
        else:
            member, boundary, close_ok = p | s, ~p & s, p & ~c & e
        # one pass: event id + a per-line ordinal (unique negative ids
        # for single-emitted lines, so ONE groupBy covers merged events,
        # broken events, unmatched singles, and standalone completes —
        # no union, no recomputation of the window chain).
        # r6: completeness moved INTO the aggregation (max over the
        # event's member-close flags) — the per-row completeness window
        # needed an extra Sort(gk, evt) + Window pass; now the groupBy
        # decides merged-vs-singles per group and an array generate
        # emits either shape (same single-pass trick as
        # _assemble_events). Plan diff: 1 Sort + 1 Window removed.
        final_evt = F.when(member, F.sum(boundary.cast("long")).over(wincl)).otherwise(
            -F.row_number().over(w)
        )
        step4 = step3.select(
            gk,
            okey,
            "__v__",
            member.alias("__m__"),
            standalone.alias("__sa__"),
            (member & close_ok).alias("__mcl__"),
            final_evt.alias("__fe__"),
        )
        aggd = step4.groupBy(gk, "__fe__").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(okey).alias("o"), F.col("__v__").alias("v"))
                )
            ).alias("pieces"),
            F.max("__mcl__").alias("__complete__"),
            F.max("__m__").alias("__is_m__"),
            F.max("__sa__").alias("__has_sa__"),
        )
        # 1-piece events (incl. singles) keep the raw value — null
        # preserved, matching every other engine's contract
        merged_struct = F.struct(
            F.when(F.size("pieces") == 1, F.element_at("pieces", 1)["v"])
            .otherwise(
                F.array_join(
                    F.transform(
                        F.col("pieces"),
                        lambda x: F.coalesce(x["v"], F.lit("")),
                    ),
                    "\n",
                )
            )
            .alias("v"),
            F.element_at(F.col("pieces"), 1)["o"].alias("o"),
            F.size("pieces").cast("long").alias("n"),
        )
        singles = F.transform(
            F.col("pieces"),
            lambda x: F.struct(
                x["v"].alias("v"), x["o"].alias("o"),
                F.lit(1).cast("long").alias("n"),
            ),
        )
        empty = F.slice(singles, 1, 0)
        # member events: merged when complete, else per-line singles
        # under 'single_line' / dropped under 'discard'; non-member
        # singleton groups: standalone always emits, unmatched only
        # under 'single_line' — identical keep law to the previous
        # per-row filter (mc | sa | single_line & (um | broken-member))
        outs = (
            F.when(F.col("__is_m__") & F.col("__complete__"), F.array(merged_struct))
            .when(
                F.col("__is_m__"),
                singles if single_line else empty,
            )
            .otherwise(
                singles
                if single_line
                else F.when(F.col("__has_sa__"), singles).otherwise(empty)
            )
        )
        return (
            aggd.select(gk, F.explode(outs).alias("__x__"))
            .select(
                gk,
                F.col("__x__")["v"].alias(sk),
                F.col("__x__")["o"].alias(okey),
                F.col("__x__")["n"].alias("n_merged"),
            )
        )

    def _call_fsm(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        src = F.col(self.source_key)
        has_s = self.start_pattern is not None
        has_c = self.continue_pattern is not None
        has_e = self.end_pattern is not None
        single_line = self.unmatched != "discard"
        group_key, order_key, source_key = (
            self.group_key,
            self.order_key,
            self.source_key,
        )

        def flag(pattern):
            # BoostRegexSearch is a *search*, not a full match
            return F.coalesce(src.rlike(pattern), F.lit(False)) if pattern else F.lit(False)

        flagged = df.select(
            group_key,
            order_key,
            src.alias("__v__"),
            flag(self.start_pattern).alias("__s__"),
            flag(self.continue_pattern).alias("__c__"),
            flag(self.end_pattern).alias("__e__"),
        )
        in_schema = dict(zip(df.schema.names, df.schema.fields))
        out_schema = T.StructType(
            [
                in_schema[group_key],
                T.StructField(source_key, T.StringType()),
                in_schema[order_key],
                T.StructField("n_merged", T.LongType()),
            ]
        )

        # One shuffle on GroupKey (hash repartition + in-partition sort),
        # then mapInPandas over WHOLE partitions: the vectorized engine
        # handles every group in a partition in one numpy pass — one
        # Python call per Arrow batch, not one per group. Groups split
        # across Arrow batches are carried to the next batch; only a
        # single group's rows are ever buffered beyond one batch.
        parts = flagged.repartition(F.col(group_key)).sortWithinPartitions(
            group_key, order_key
        )

        def run(batches):
            import numpy as np
            import pandas as pd

            def process(pdf):
                groups, texts, orders, ns = _merge_block_vectorized(
                    pdf[group_key].to_numpy(),
                    pdf[order_key].to_numpy(),
                    pdf["__v__"],
                    pdf["__s__"].to_numpy(dtype=bool),
                    pdf["__c__"].to_numpy(dtype=bool),
                    pdf["__e__"].to_numpy(dtype=bool),
                    has_s, has_c, has_e, single_line,
                )
                return pd.DataFrame(
                    {
                        group_key: groups,
                        source_key: texts,
                        order_key: orders,
                        "n_merged": ns,
                    }
                )

            carry = None
            for pdf in batches:
                if carry is not None:
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                    carry = None
                if len(pdf) == 0:
                    continue
                gcol = pdf[group_key].to_numpy()
                # hold back the trailing group — it may continue in the
                # next Arrow batch of this sorted partition
                first_of_last = int(np.argmax(gcol == gcol[-1]))
                if first_of_last == 0:
                    carry = pdf
                else:
                    carry = pdf.iloc[first_of_last:]
                    yield process(pdf.iloc[:first_of_last])
            if carry is not None and len(carry) > 0:
                yield process(carry)

        return parts.mapInPandas(run, out_schema)

    def _call_fsm_chunked(self, df: DataFrame) -> DataFrame:
        """Skew-routed FSM: groups larger than ``ChunkRows`` take the
        chunk-parallel machinery (:meth:`_chunked_core`); everything else
        keeps the single-pass partition-level path. The same split AQE
        makes for skew joins — only skewed groups pay the extra shuffles,
        and a corpus of many small conversations costs one extra
        map-side-partial count. A group of exactly ChunkRows rows is one
        chunk, so routing small groups to the plain path is semantically
        free (pinned by the differential tests).

        ``ChunkRows="auto"``: one metadata-sized probe over the group
        counts (already computed for routing) picks the plan — if no
        group exceeds ``_AUTO_MIN_GROUP`` rows the whole input takes the
        plain path (the 3-shuffle chunked machinery only pays off once a
        single group dwarfs a task); otherwise ChunkRows is sized so the
        largest group splits into ~2 chunks per core, floored so chunks
        stay big enough to amortize the per-chunk scans.

        Chunk ids: when every big group's numeric OrderKey is provably
        DENSE (max - min + 1 == count, checked on the metadata-sized
        stats), chunk id is the shuffle-free ``floor((order - min) /
        ChunkRows)``; sparse or non-numeric order keys fall back to a
        per-group row_number window (ADVICE r4: raw sparse order values
        would fragment a hot group into near-per-row chunks)."""
        from pyspark.sql import types as T

        g, okey = self.group_key, self.order_key
        in_schema = dict(zip(df.schema.names, df.schema.fields))
        numeric_ok = isinstance(in_schema[okey].dataType, T.NumericType)
        aggs = [F.count(F.lit(1)).alias("__n__")]
        if numeric_ok:
            aggs += [F.min(okey).alias("__mn__"), F.max(okey).alias("__mx__")]
        chunk_rows = self.chunk_rows
        if chunk_rows == "auto":
            # auto needs TWO passes over the per-group stats (global max
            # to pick the plan, then the big-group filter), so the
            # group-sizes table is materialized once (localCheckpoint)
            sizes = df.groupBy(g).agg(*aggs).localCheckpoint(eager=True)
            row = sizes.agg(F.max("__n__").alias("m")).collect()[0]
            max_n = row["m"] or 0
            if max_n <= _AUTO_MIN_GROUP:
                chunk_rows = None
            else:
                par = df.sparkSession.sparkContext.defaultParallelism
                chunk_rows = max(
                    _AUTO_MIN_GROUP // 4, -(-max_n // (2 * max(par, 1)))
                )
            big_stats = sizes.filter(F.col("__n__") > chunk_rows) if chunk_rows else None
        else:
            # explicit ChunkRows: ONE metadata job — aggregate, keep only
            # the big groups (bounded by the skew count), collect. No
            # checkpoint write, and no re-scan to build the routing list.
            big_stats = df.groupBy(g).agg(*aggs).filter(
                F.col("__n__") > chunk_rows
            )
        if chunk_rows is None:
            if self.continue_pattern or self.end_pattern:
                # honor Engine='sql' here too (ADVICE r5: this branch
                # ignored it, breaking the no-Python-workers guarantee)
                return (
                    self._call_fsm_sql(df)
                    if self.engine == "sql"
                    else self._call_fsm(df)
                )
            return self._call_start_only(df)
        stat_rows = big_stats.limit(100_001).collect()
        if not stat_rows:
            # no group exceeds ChunkRows → the 3-shuffle machinery (and
            # the routing joins) buy nothing; run the plain path whole
            if self.continue_pattern or self.end_pattern:
                return (
                    self._call_fsm_sql(df)
                    if self.engine == "sql"
                    else self._call_fsm(df)
                )
            return self._call_start_only(df)
        group_mins = None
        if numeric_ok and len(stat_rows) <= 100_000 and all(
            r["__mx__"] - r["__mn__"] + 1 == r["__n__"] for r in stat_rows
        ):
            group_mins = {r[g]: r["__mn__"] for r in stat_rows}
        if len(stat_rows) <= 100_000:
            # routing list rebuilt driver-side: the joins broadcast a
            # literal frame instead of recomputing the aggregation
            big = F.broadcast(
                df.sparkSession.createDataFrame(
                    [[r[g]] for r in stat_rows],
                    T.StructType([in_schema[g]]),
                )
            )
        else:  # pathological ChunkRows: fall back to the dataframe route
            big = F.broadcast(big_stats.select(g))
        small_df = df.join(big, g, "left_anti")
        big_df = df.join(big, g, "left_semi")
        if self.continue_pattern or self.end_pattern:
            plain = (
                self._call_fsm_sql(small_df)
                if self.engine == "sql"
                else self._call_fsm(small_df)
            )
        else:
            plain = self._call_start_only(small_df)
        return plain.unionByName(
            self._chunked_core(big_df, chunk_rows, group_mins)
        )

    def _chunked_core(
        self, df: DataFrame, chunk_rows: int, group_mins: dict | None = None
    ) -> DataFrame:
        """Skew-parallel FSM: wall-clock bounded by ``ChunkRows`` and the
        largest single EVENT, not the largest GROUP.

        The plain paths shuffle each group to one partition, so one hot
        group (a conversation holding 20% of a 10^12-turn corpus, a
        multi-GB log file) serializes on a single task. But the merge
        recurrence p' = (p & u) | (~p & v) is a prefix scan: a chunk of a
        group is a FUNCTION {False,True} → {False,True} of its entry
        state. So:

        1. chunk by ``floor(order / ChunkRows)``; per (group, chunk)
           compute in parallel the transfer pair (state-after for entry
           False/True) + boundary counts for both entries — two
           vectorized scans, no data movement beyond the chunk shuffle;
        2. fold the per-chunk functions left-to-right per GROUP over the
           tiny metadata table (rows = #chunks, not #lines) to fix each
           chunk's true entry state and global event-id offset;
        3. re-scan each chunk in parallel with its entry state, emitting
           per-line records keyed by global event id;
        4. assemble events with one groupBy (group, event): pieces sort
           + join, completeness = any close line — so an event spanning
           chunks stitches correctly and incomplete events get the
           end-of-input treatment exactly once.

        Differential-tested against the single-pass paths for all modes;
        identical output contract. Costs 2 data shuffles + 1 event
        shuffle vs 1 shuffle for the plain path — use it when group skew
        is the binding constraint (bench: 20M rows with a 4M-row hot
        group run ~3x faster and stop scaling with the hot group).
        Reference semantics: ProcessorMergeMultilineLogNative.cpp:161-345.
        """
        from pyspark.sql import types as T

        C = int(chunk_rows)
        gk, okey, sk = self.group_key, self.order_key, self.source_key
        in_schema = dict(zip(df.schema.names, df.schema.fields))
        src = F.col(sk)
        has_s = self.start_pattern is not None
        has_c = self.continue_pattern is not None
        has_e = self.end_pattern is not None
        single_line = self.unmatched != "discard"
        merge_unmatched = self.unmatched == "merge"
        # only-End enters every group at a boundary
        p0_first = has_e and not has_s and not has_c
        start_only = has_s and not has_c and not has_e

        def flag(pattern, anchored=False):
            if not pattern:
                return F.lit(False)
            pat = f"^(?:{pattern})" if anchored else pattern
            return F.coalesce(src.rlike(pat), F.lit(False))

        # chunk id = floor(dense per-group ordinal / ChunkRows). With
        # proven-dense numeric OrderKeys (group_mins from the caller's
        # metadata probe) the ordinal is the shuffle-free arithmetic
        # (order - group_min); otherwise a per-group row_number window —
        # NEVER the raw order value: sparse OrderKeys (byte offsets,
        # timestamps) would fragment a hot group into near-per-row
        # chunks and explode the driver-collected metadata tables
        # (ADVICE r4). The window costs one extra hash exchange on
        # GroupKey; the big-group side is the skewed minority.
        if group_mins is not None:
            if len(group_mins) <= 64:
                mn_expr = F.coalesce(
                    F.try_element_at(
                        F.create_map(
                            *[
                                x
                                for k, v in group_mins.items()
                                for x in (F.lit(k), F.lit(v))
                            ]
                        ),
                        F.col(gk),
                    )
                    if group_mins
                    else F.lit(0),
                    F.lit(0),
                )
            else:
                mins_df = F.broadcast(
                    df.sparkSession.createDataFrame(
                        list(group_mins.items()), [gk, "__grp_mn__"]
                    )
                )
                df = df.join(mins_df, gk, "left")
                mn_expr = F.coalesce(F.col("__grp_mn__"), F.lit(0))
            ordinal = F.col(okey) - mn_expr
        else:
            w_ord = Window.partitionBy(gk).orderBy(okey)
            ordinal = F.row_number().over(w_ord) - 1
        flagged = df.select(
            gk,
            okey,
            src.alias("__v__"),
            # the start-only plain path anchors its pattern — match it
            flag(self.start_pattern, anchored=start_only).alias("__s__"),
            flag(self.continue_pattern).alias("__c__"),
            flag(self.end_pattern).alias("__e__"),
            F.floor(ordinal / C).cast("long").alias("__chunk__"),
        )
        # r6: the flagged projection feeds TWO chunk passes (meta +
        # records) and the DataFrame API has no common-subplan reuse, so
        # without help the scan + regex flags + big-group semi-join run
        # twice AND each groupBy().applyInPandas adds its own exchange.
        # One explicit (group, chunk) repartition fixes both: the two
        # consumers canonicalize to the SAME exchange (ReuseExchange —
        # scan+flags run once, the shuffle is written once and read
        # twice) and both applyInPandas calls see their required
        # clustering already satisfied (no further exchange). Plan diff
        # vs r5: 3 big-side exchanges → 1 reused.
        flagged = flagged.repartition(F.col(gk), F.col("__chunk__"))
        gfield = in_schema[gk]
        ofield = in_schema[okey]

        # -- pass 1: per-chunk transfer function + boundary counts -------
        meta_schema = T.StructType(
            [
                gfield,
                T.StructField("__chunk__", T.LongType()),
                T.StructField("f0", T.BooleanType()),
                T.StructField("f1", T.BooleanType()),
                T.StructField("b0", T.LongType()),
                T.StructField("b1", T.LongType()),
            ]
        )

        def meta_fn(key, pdf):
            import pandas as pd

            pdf = pdf.sort_values(okey)
            s = pdf["__s__"].to_numpy(dtype=bool)
            c = pdf["__c__"].to_numpy(dtype=bool)
            e = pdf["__e__"].to_numpy(dtype=bool)
            u, v, _ = _mode_uv(s, c, e, has_s, has_c, has_e)
            row = [key[0], key[1]]
            fs, bs = [], []
            for entry in (False, True):
                p = _scan_open_state(u, v, entry)
                after = bool((p[-1] & u[-1]) | (~p[-1] & v[-1]))
                _, boundary, _, _ = _mode_line_flags(
                    p, s, c, e, has_s, has_c, has_e
                )
                fs.append(after)
                bs.append(int(boundary.sum()))
            return pd.DataFrame(
                [row + fs + bs],
                columns=[gk, "__chunk__", "f0", "f1", "b0", "b1"],
            )

        # r6: the transfer-function pass reads only flags + order — keep
        # the text column out of its exchange and Arrow transfer (guide
        # §2.3 project-before-the-exchange; §4.1 pass only the columns
        # the function needs)
        meta = flagged.drop("__v__").groupBy(gk, "__chunk__").applyInPandas(
            meta_fn, meta_schema
        )

        # -- pass 2: fold transfer functions per group (metadata-sized) --
        entry_schema = T.StructType(
            [
                gfield,
                T.StructField("__chunk__", T.LongType()),
                T.StructField("__entry__", T.BooleanType()),
                T.StructField("__off__", T.LongType()),
            ]
        )

        def compose_fn(key, pdf):
            import pandas as pd

            pdf = pdf.sort_values("__chunk__")
            state, off = p0_first, 0
            ent, offs = [], []
            for f0, f1, b0, b1 in zip(
                pdf["f0"], pdf["f1"], pdf["b0"], pdf["b1"]
            ):
                ent.append(bool(state))
                offs.append(off)
                off += int(b1 if state else b0)
                state = bool(f1 if state else f0)
            return pd.DataFrame(
                {
                    gk: [key[0]] * len(ent),
                    "__chunk__": pdf["__chunk__"].to_numpy(),
                    "__entry__": ent,
                    "__off__": offs,
                }
            )

        entries = meta.groupBy(gk).applyInPandas(compose_fn, entry_schema)

        # -- pass 3: per-chunk line records with true entry state --------
        rec_schema = T.StructType(
            [
                gfield,
                T.StructField("__evt__", T.LongType()),
                ofield,
                T.StructField("__v__", T.StringType()),
                T.StructField("__ok__", T.BooleanType()),
                T.StructField("__direct__", T.BooleanType()),
            ]
        )

        def lines_fn(key, pdf):
            import numpy as np
            import pandas as pd

            pdf = pdf.sort_values(okey)
            s = pdf["__s__"].to_numpy(dtype=bool)
            c = pdf["__c__"].to_numpy(dtype=bool)
            e = pdf["__e__"].to_numpy(dtype=bool)
            u, v, _ = _mode_uv(s, c, e, has_s, has_c, has_e)
            p = _scan_open_state(u, v, bool(pdf["__entry__"].iloc[0]))
            member, boundary, close_ok, standalone = _mode_line_flags(
                p, s, c, e, has_s, has_c, has_e
            )
            evt = int(pdf["__off__"].iloc[0]) + np.cumsum(boundary)
            okarr = (
                np.ones(len(p), dtype=bool) if close_ok is None else close_ok
            )
            ordv = pdf[okey].to_numpy()
            text = pdf["__v__"].to_numpy(dtype=object)
            # unique NEGATIVE event id per direct (single-emitted) line:
            # -(global dense position + 1), so the assembly can fold
            # direct lines into the same (group, event) groupBy as
            # merged events (r6 — one pass instead of a 3-branch union;
            # member events have evt >= 0, so the id spaces never meet)
            gpos = int(key[1]) * C + np.arange(len(pdf), dtype=np.int64)
            unmatched = ~member & ~standalone
            if merge_unmatched:
                # start-only 'merge' extension: unmatched lines exist
                # only before the group's FIRST start marker, where
                # evt == 0 (off 0, no boundary yet) — absorbing them as
                # members stitches the leading merged event across
                # chunks through the ordinary (group, evt=0) assembly
                member = member | unmatched
                unmatched = np.zeros(len(member), dtype=bool)
            direct = standalone | (unmatched & single_line)
            frames = []
            if member.any():
                frames.append(
                    pd.DataFrame(
                        {
                            gk: key[0],
                            "__evt__": evt[member],
                            okey: ordv[member],
                            "__v__": text[member],
                            "__ok__": okarr[member],
                            "__direct__": False,
                        }
                    )
                )
            if direct.any():
                frames.append(
                    pd.DataFrame(
                        {
                            gk: key[0],
                            "__evt__": -(gpos[direct] + 1),
                            okey: ordv[direct],
                            "__v__": text[direct],
                            "__ok__": True,
                            "__direct__": True,
                        }
                    )
                )
            if not frames:
                # discard treatment can empty a chunk; typed empties keep
                # the Arrow conversion happy
                return pd.DataFrame(
                    {
                        gk: pd.Series(dtype=object),
                        "__evt__": pd.Series(dtype="int64"),
                        okey: pd.Series(dtype="int64"),
                        "__v__": pd.Series(dtype=object),
                        "__ok__": pd.Series(dtype=bool),
                        "__direct__": pd.Series(dtype=bool),
                    }
                )
            return pd.concat(frames, ignore_index=True)

        # entries is #chunks rows — broadcast keeps the data unshuffled
        # between the chunk passes
        records = (
            flagged.join(F.broadcast(entries), [gk, "__chunk__"])
            .groupBy(gk, "__chunk__")
            .applyInPandas(lines_fn, rec_schema)
        )

        # -- pass 4: assemble events (skew = event size, not group size) -
        return self._assemble_events(records)

    def _assemble_events(self, records: DataFrame) -> DataFrame:
        """Shared event assembly over a line-record frame
        (GroupKey, __evt__, OrderKey, __v__, __ok__, __direct__):
        member lines group by (group, event id) — pieces sort + join,
        completeness = any line with ``__ok__``; incomplete events fall
        back to the unmatched treatment per line; ``__direct__`` lines
        pass through as their own events. Used by the chunk-parallel
        path (events stitch across chunks through the same groupBy).
        The pure-SQL engine assembles inline instead: it folds singles
        into the same groupBy via unique negative event ids, so it
        needs no union and keeps the group-key partitioning."""
        gk, okey, sk = self.group_key, self.order_key, self.source_key
        single_line = self.unmatched != "discard"
        # r6: ONE groupBy + ONE generate cover merged events, broken
        # events and direct singles. The previous 3-branch union
        # (merged / broken / directs) re-executed everything above the
        # last Exchange per branch — the records applyInPandas chain ran
        # THREE times (the DataFrame API has no common-subplan reuse
        # above reused exchanges). Direct lines carry unique negative
        # event ids (lines_fn), so they fold into the same aggregation
        # as 1-piece complete events. Plan diff: 3× FlatMapGroupsInPandas
        # → 1×, Union removed; bench skew row 4.3 → 3.85 s (min-of-5).
        aggd = records.groupBy(gk, "__evt__").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(okey).alias("o"), F.col("__v__").alias("v")
                    )
                )
            ).alias("pieces"),
            F.max("__ok__").alias("__complete__"),
        )
        # 1-line events keep a null source verbatim (direct singles and
        # the 'merge' extension — pattern-matched 1-line members are
        # never null), matching _call_start_only's contract
        merged_struct = F.struct(
            F.when(F.size("pieces") == 1, F.element_at("pieces", 1)["v"])
            .otherwise(
                F.array_join(
                    F.transform(
                        F.col("pieces"),
                        lambda x: F.coalesce(x["v"], F.lit("")),
                    ),
                    "\n",
                )
            )
            .alias("v"),
            F.element_at(F.col("pieces"), 1)["o"].alias("o"),
            F.size("pieces").cast("long").alias("n"),
        )
        singles = F.transform(
            F.col("pieces"),
            lambda x: F.struct(
                x["v"].alias("v"), x["o"].alias("o"),
                F.lit(1).cast("long").alias("n"),
            ),
        )
        # incomplete events: per-line singles under 'single_line',
        # dropped under 'discard' (slice(…, 1, 0) = typed empty array)
        outs = F.when(F.col("__complete__"), F.array(merged_struct)).otherwise(
            singles if single_line else F.slice(singles, 1, 0)
        )
        return (
            aggd.select(gk, F.explode(outs).alias("__x__"))
            .select(
                gk,
                F.col("__x__")["v"].alias(sk),
                F.col("__x__")["o"].alias(okey),
                F.col("__x__")["n"].alias("n_merged"),
            )
        )

    def _call_start_only(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        # coalesce like the FSM paths' flag(): a NULL source line must
        # read as not-a-start, or the running sum yields NULL event ids
        # for leading null rows (splitting the 'merge' leading region /
        # merging consecutive leading nulls under 'single_line')
        is_start = F.coalesce(
            src.rlike(f"^(?:{self.start_pattern})"), F.lit(False)
        )
        w = (
            Window.partitionBy(self.group_key)
            .orderBy(self.order_key)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        df = df.withColumn("__lc_evt__", F.sum(is_start.cast("int")).over(w))
        if self.unmatched == "discard":
            df = df.filter(F.col("__lc_evt__") > 0)
        elif self.unmatched == "merge":
            # engine extension: leading unmatched rows merge into one
            # event (used e.g. to collapse a whole group when no start
            # marker exists) — not a reference treatment
            pass
        else:
            # 'single_line': leading unmatched rows (before any start
            # marker, __lc_evt__ == 0) are emitted as their OWN events —
            # give each a distinct negative event id keyed by order
            # (ProcessorMergeMultilineLogNative unmatched handling).
            df = df.withColumn(
                "__lc_evt__",
                F.when(
                    F.col("__lc_evt__") == 0,
                    -(F.col(self.order_key).cast("long") + F.lit(1)),
                ).otherwise(F.col("__lc_evt__")),
            )
        merged = (
            df.groupBy(self.group_key, "__lc_evt__")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(self.order_key).alias("o"), src.alias("v"))
                    )
                ).alias("__pieces__"),
                F.min(self.order_key).alias(self.order_key),
                F.count(F.lit(1)).alias("n_merged"),
            )
            .select(
                self.group_key,
                # null content inside a MERGE joins as "" (C++ strings are
                # never null; array_join would otherwise DROP the element
                # and its separator while n_merged still counts it), but a
                # 1-line event keeps its null — both matching the FSM
                # paths (pinned by the chunked-path differential)
                F.when(
                    F.size("__pieces__") == 1,
                    F.element_at("__pieces__", 1)["v"],
                )
                .otherwise(
                    F.array_join(
                        F.transform(
                            "__pieces__",
                            lambda s: F.coalesce(s["v"], F.lit("")),
                        ),
                        "\n",
                    )
                )
                .alias(self.source_key),
                self.order_key,
                "n_merged",
            )
        )
        return merged


@register("processor_merge_partial_logs")
class MergePartialLogs(Processor):
    """Flag-based partial-log merge — the MergeType='flags' branch of
    ProcessorMergeMultilineLogNative (.cpp:106-159): runs of rows carrying
    the partial flag (containerd ``P`` tag) merge with the first
    following unflagged row; pieces concatenate with NO separator
    (MergeEvents insertLineBreak=false). A trailing flagged run with no
    final piece still merges (.cpp:154-157).

    Pure window SQL, no FSM needed: a run [P,P,...,final] shares the
    exclusive running count of unflagged rows, so one shuffle on GroupKey
    + one groupBy — the same segment trick as the Continue+End oracle.
    """

    def __init__(
        self,
        SourceKey: str,
        GroupKey: str,
        OrderKey: str,
        PartFlagKey: str = "_part_",
    ) -> None:
        self.source_key = SourceKey
        self.group_key = GroupKey
        self.order_key = OrderKey
        self.part_key = PartFlagKey

    def __call__(self, df: DataFrame) -> DataFrame:
        part = F.coalesce(F.col(self.part_key), F.lit(False))
        w = (
            Window.partitionBy(self.group_key)
            .orderBy(self.order_key)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        seg = F.coalesce(
            F.sum(F.when(~part, 1).otherwise(0)).over(w), F.lit(0)
        )
        df = df.withColumn("__lc_seg__", seg)
        merged = (
            df.groupBy(self.group_key, "__lc_seg__")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col(self.order_key).alias("o"),
                                    F.col(self.source_key).alias("v"),
                                )
                            )
                        ),
                        lambda s: s["v"],
                    ),
                    "",
                ).alias(self.source_key),
                F.min(self.order_key).alias(self.order_key),
                F.count(F.lit(1)).alias("n_merged"),
            )
            .drop("__lc_seg__")
        )
        return merged
