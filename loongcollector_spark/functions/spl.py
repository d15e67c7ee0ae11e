"""SPL (SLS Processing Language) → Spark compiler.

The reference embeds SPL, a Presto-like ``|``-piped dataflow language
(executed by processor_spl — core/plugin/processor/ProcessorSPL.cpp:69-154;
query corpus core/unittest/spl/spl.txt, semantic cases SplUnittest.cpp).
Statement grammar (SplUnittest.cpp:559-571)::

    .let name = <pipeline>;     -- bind a pipeline result
    $name;                      -- emit a bound result as an output
    * | cmd | cmd               -- anonymous single-output program

Pipeline commands (SURVEY.md §2.8) map ~1:1 onto DataFrame ops:

    where <boolexpr>            → df.filter
    extend a = <expr>[, b=...]  → withColumn
    project a, b [as c]         → select
    project-away a, b           → drop
    project-rename new=old      → withColumnRenamed
    parse-regexp col, 'pat' as k1, k2   (incl. (?P<name>) groups)
    parse-json [-prefix=] [-path=$.x] col
    parse-csv [-quote=][-delim=][-strict] col as a, b
    parse-kv [-delims=][-kv-sep=][-prefix=] col

Scalar expressions ride Spark SQL's parser after a Presto→Spark
function/ syntax translation (TRANSLATIONS below). ~95% of the SPL scalar
library is a same-name Spark built-in; the rest are renames or small
rewrites (strpos→instr, cardinality→size, 2-arg regexp_extract group
default 0, ARRAY[..]→array(..), VARCHAR→STRING, ...).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# expression translation (Presto/SPL dialect → Spark SQL dialect)

_SIMPLE_RENAMES = {
    "codepoint": "ascii",
    "cardinality": "size",
    "json_extract_scalar": "get_json_object",
    "json_extract": "get_json_object",
    "to_unixtime": "unix_timestamp",
    "week_of_year": "weekofyear",
    "day_of_year": "dayofyear",
    "to_base64": "base64",
    "from_base64": "unbase64",
    "to_hex": "hex",
    "from_hex": "unhex",
    "all_match": "forall",
    "any_match": "exists",
    "contains": "array_contains",
    "zip": "arrays_zip",
    "is_nan": "isnan",
    "strpos": "instr",
    "json_array_length": "json_array_length",
    "day_of_month": "dayofmonth",
    "doy": "dayofyear",
    "week": "weekofyear",
    "format_datetime": "date_format",
    "bitwise_left_shift": "shiftleft",
    "bitwise_shift_left": "shiftleft",
    "bitwise_logical_shift_right": "shiftrightunsigned",
    "bitwise_right_shift": "shiftrightunsigned",
    "bitwise_arithmetic_shift_right": "shiftright",
    "bitwise_right_shift_arithmetic": "shiftright",
    # Presto xxhash64(varbinary) is seed-0 over the raw bytes returning
    # VARBINARY; Spark's builtin is seed-42 over typed values → a
    # registered UDF, not a rename onto the builtin
    "xxhash64": "presto_xxhash64",
}

_TYPE_RENAMES = {
    "varchar": "string",
    "varbinary": "binary",
}


def _sub_outside_literals(pattern: str, repl, s: str) -> str:
    """re.sub that never fires inside single-quoted SQL string literals
    ('' escapes handled)."""
    parts = re.split(r"('(?:[^']|'')*')", s)
    return "".join(
        p if i % 2 else re.sub(pattern, repl, p) for i, p in enumerate(parts)
    )


def translate_expr(expr: str) -> str:
    """Presto/SPL scalar expression → Spark SQL expression text."""
    out = expr

    # ARRAY[...] literals (non-nested, applied repeatedly for simple
    # nesting). Plain re.sub on purpose: the bracket CONTENTS usually
    # hold string literals, so the literal-splitting helper would break
    # the match (the keyword-only rewrites below use the helper).
    for _ in range(3):
        new = re.sub(r"(?i)\bARRAY\s*\[([^\[\]]*)\]", r"array(\1)", out)
        if new == out:
            break
        out = new

    # cast type names
    def type_fix(m):
        return f"as {_TYPE_RENAMES.get(m.group(1).lower(), m.group(1))}"

    out = re.sub(r"(?i)\bas\s+(varchar|varbinary)\b", type_fix, out)

    # sha256(x) → sha2(x, 256) etc (simple-arg only)
    out = re.sub(r"(?i)\bsha(256|512)\s*\(", lambda m: f"sha2__{m.group(1)}(", out)

    # 2-arg regexp_extract/_all: Presto group default is 0 (whole match),
    # Spark's is 1 → make it explicit. Only rewrite when the call clearly
    # has two comma-separated args at depth 0.
    out = _fix_regexp_group_default(out)

    # function renames (word boundary, not preceded by '.'; never inside
    # string literals)
    for a, b in _SIMPLE_RENAMES.items():
        out = _sub_outside_literals(rf"(?<![\w.]){a}\s*\(", b + "(", out)

    # deferred sha2 marker — Presto sha256/sha512 return VARBINARY
    # (Spark's sha2 renders hex text): unhex back to the raw digest
    out = re.sub(r"sha2__(\d+)\(([^()]*)\)", r"unhex(sha2(\2, \1))", out)

    # Presto md5/sha1(varbinary) → varbinary digest (Spark's return hex)
    out = _rewrite_calls(out, "md5", lambda a: f"unhex(md5({a[0]}))")
    out = _rewrite_calls(out, "sha1", lambda a: f"unhex(sha1({a[0]}))")

    # replace(a, b) (2-arg Presto remove) → replace(a, b, '')
    out = _fix_two_arg_replace(out)

    # date_add('unit', n, ts) → timestampadd(unit, n, ts); date_diff →
    # timestampdiff(unit, a, b)
    out = re.sub(
        r"(?i)\bdate_add\s*\(\s*'(\w+)'\s*,",
        lambda m: f"timestampadd({m.group(1)},",
        out,
    )
    out = re.sub(
        r"(?i)\bdate_diff\s*\(\s*'(\w+)'\s*,",
        lambda m: f"timestampdiff({m.group(1)},",
        out,
    )

    # date_parse(x, '%Y-%m-%d %H:%i:%S') → to_timestamp(x, 'yyyy-MM-dd HH:mm:ss')
    def dp_fix(m):
        fmt = m.group(1)
        for a, b in [
            ("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"), ("%H", "HH"),
            ("%i", "mm"), ("%S", "ss"), ("%s", "ss"), ("%f", "SSSSSS"),
            ("%T", "HH:mm:ss"),
        ]:
            fmt = fmt.replace(a, b)
        return f", '{fmt}')"

    if re.search(r"(?i)\bdate_parse\s*\(", out):
        out = re.sub(r"(?i)\bdate_parse\s*\(", "to_timestamp(", out)
        out = re.sub(r",\s*'([^']*)'\s*\)", dp_fix, out)
    # parse_datetime / date_format with MySQL %-patterns
    if re.search(r"(?i)\bparse_datetime\s*\(", out):
        out = re.sub(r"(?i)\bparse_datetime\s*\(", "to_timestamp(", out)
        out = re.sub(r",\s*'([^']*%[^']*)'\s*\)", dp_fix, out)
    if re.search(r"(?i)\b(date_format|format_datetime)\s*\(.*%", out):
        out = re.sub(r",\s*'([^']*%[^']*)'\s*\)", dp_fix, out)

    # structural rewrites needing arg-aware handling
    out = _rewrite_calls(out, "map", lambda a: (
        f"map_from_arrays({', '.join(a)})" if len(a) == 2 else f"map({', '.join(a)})"
    ))
    # Presto json_parse CANONICALIZES (whitespace dropped); the JSON value
    # stays a canonical STRING here so every downstream json_* keeps
    # working on it (json_format is then the identity). Spark 4's variant
    # round-trip does the canonicalization JVM-side.
    out = _rewrite_calls(
        out, "json_parse", lambda a: f"to_json(try_parse_json({a[0]}))"
    )
    out = _rewrite_calls(out, "json_format", lambda a: f"({a[0]})")
    out = _rewrite_calls(out, "to_utf8", lambda a: f"cast({a[0]} as binary)")
    out = _rewrite_calls(out, "from_utf8", lambda a: f"cast({a[0]} as string)")
    # Presto repeat(element, count) returns an ARRAY (Spark's repeat is
    # string repetition — different function entirely). _rewrite_calls is
    # literal-aware, so 'repeat(' inside a string stays untouched.
    out = _rewrite_calls(
        out, "repeat", lambda a: f"array_repeat({', '.join(a)})"
    )
    # Presto 2-arg from_unixtime(unixtime, zone): timestamp rendered in
    # that zone (Spark's 2nd arg is a FORMAT string — not the same!)
    out = _rewrite_calls(out, "from_unixtime", lambda a: (
        f"convert_timezone('UTC', {a[1]}, "
        f"cast(from_unixtime({a[0]}) as timestamp_ntz))"
        if len(a) == 2
        # 1-arg: Presto returns a TIMESTAMP (Spark renders a string)
        else f"cast(from_unixtime({a[0]}) as timestamp)"
    ))
    # Presto ROW constructor as a lambda body: -> (y, x) → -> struct(y, x)
    # (literal-aware scanner; handles nested parens like -> (f(x), y))
    out = _rewrite_row_ctor(out)
    # Presto day_of_week/dow are ISO-8601 (1=Monday..7=Sunday); Spark's
    # dayofweek is 1=Sunday..7=Saturday — remap (parity fix, r4)
    for _dowfn in ("day_of_week", "dow"):
        out = _rewrite_calls(
            out, _dowfn,
            lambda a: f"(((dayofweek({a[0]}) + 5) % 7) + 1)",
        )
    # Presto truncate(x[, n]): drop digits beyond n decimal places,
    # toward zero (cast double→bigint truncates toward zero in Spark)
    out = _rewrite_calls(out, "truncate", lambda a: (
        f"cast(cast({a[0]} as bigint) as double)" if len(a) == 1 else
        f"(cast(cast(cast({a[0]} as double) * pow(10, {a[1]}) as bigint) "
        f"as double) / pow(10, {a[1]}))"
    ))
    out = _rewrite_calls(out, "bitwise_and", lambda a: f"({a[0]} & {a[1]})")
    out = _rewrite_calls(out, "bitwise_or", lambda a: f"({a[0]} | {a[1]})")
    out = _rewrite_calls(out, "bitwise_xor", lambda a: f"({a[0]} ^ {a[1]})")
    out = _rewrite_calls(out, "bitwise_not", lambda a: f"(~{a[0]})")
    out = _rewrite_calls(out, "bit_count", lambda a: f"bit_count({a[0]})")
    # 3-arg Presto shifts: (value, shift, bits) — the value is "treated
    # as a bits-bit value" (BitwiseFunctions.java): LEFT shift masks the
    # result (high bits can't re-enter the window, so mask-before ==
    # mask-after); LOGICAL RIGHT shift masks the VALUE first — 1342>>9
    # within 8 bits is (1342 & 255) >> 9 = 0, not (1342 >> 9) & 255.
    # Mask built with shiftleft (no pow() double → ANSI-unsafe casts).
    # bits=64 needs a special case: the JVM masks shift amounts mod 64,
    # so shiftleft(1, 64) is 1 and the mask formula would yield 0 — the
    # full 64-bit window's mask is simply -1 (all ones).
    def _mask(bits):
        return (
            f"(if(({bits}) = 64, cast(-1 as bigint), "
            f"shiftleft(cast(1 as bigint), {bits}) - 1))"
        )

    def _shift3_left(a):
        if len(a) == 3:
            return f"(shiftleft({a[0]}, {a[1]}) & {_mask(a[2])})"
        return f"shiftleft({', '.join(a)})"

    def _shift3_right(a):
        if len(a) == 3:
            return (
                f"shiftrightunsigned(({a[0]} & {_mask(a[2])}), {a[1]})"
            )
        return f"shiftrightunsigned({', '.join(a)})"

    out = _rewrite_calls(out, "shiftleft", _shift3_left)
    out = _rewrite_calls(out, "shiftrightunsigned", _shift3_right)
    out = _rewrite_calls(out, "instr", lambda a: (
        f"instr({a[0]}, {a[1]})" if len(a) == 3 and a[2] == "1"
        else f"instr({', '.join(a)})"
    ))
    def _strrpos(a):
        if len(a) == 2:
            return (
                f"if(instr({a[0]}, {a[1]}) = 0, 0, length({a[0]}) - "
                f"instr(reverse({a[0]}), reverse({a[1]})) - length({a[1]}) + 2)"
            )
        # 3-arg Presto: position of the instance-th occurrence counting
        # from the END (all occurrence positions, indexed from the back)
        return (
            f"coalesce(try_element_at(filter(sequence(1, "
            f"greatest(length({a[0]}) - length({a[1]}) + 1, 1)), "
            f"i -> substring({a[0]}, i, length({a[1]})) = {a[1]}), "
            f"-({a[2]})), 0)"
        )

    out = _rewrite_calls(out, "strrpos", _strrpos)
    # 3-arg Presto array_position: instance-th occurrence of the element
    # (negative instance counts from the end — try_element_at's native
    # negative indexing)
    out = _rewrite_calls(out, "array_position", lambda a: (
        f"coalesce(try_element_at(filter(sequence(1, size({a[0]})), "
        f"i -> try_element_at({a[0]}, i) = {a[1]}), {a[2]}), 0)"
        if len(a) == 3 else f"array_position({', '.join(a)})"
    ))

    # combinations(arr, n): n-element subsequences in index order
    # (Presto caps n <= 5; the expression form covers the n used in
    # practice, 1..3)
    def _combinations(a):
        arr, n = a[0], a[1].strip()
        seq = f"sequence(1, greatest(size({arr}), 1))"
        el = lambda i: f"try_element_at({arr}, {i})"  # noqa: E731
        if n == "1":
            return f"transform({arr}, x -> array(x))"
        if n == "2":
            return (
                f"flatten(transform({seq}, i -> "
                f"transform(filter({seq}, j -> j > i), "
                f"j -> array({el('i')}, {el('j')}))))"
            )
        if n == "3":
            return (
                f"flatten(transform({seq}, i -> "
                f"flatten(transform(filter({seq}, j -> j > i), j -> "
                f"transform(filter({seq}, k -> k > j), k -> "
                f"array({el('i')}, {el('j')}, {el('k')}))))))"
            )
        raise SplError(f"combinations(arr, {n}): only n in 1..3 supported")

    out = _rewrite_calls(out, "combinations", _combinations)
    # Velox slice: start = 0 returns an EMPTY array (documented Velox
    # deviation from Presto's index error); Spark's slice throws on 0
    out = _rewrite_calls(out, "slice", lambda a: (
        f"slice({a[0]}, 1, 0)" if len(a) == 3 and a[1].strip() == "0"
        else (
            f"slice({a[0]}, if(({a[1]}) = 0, 1, {a[1]}), "
            f"if(({a[1]}) = 0, 0, {a[2]}))"
            if len(a) == 3 else f"slice({', '.join(a)})"
        )
    ))
    # 2-arg Presto width_bucket(x, bins): index = count of bins <= x
    out = _rewrite_calls(out, "width_bucket", lambda a: (
        f"size(filter({a[1]}, b -> b <= {a[0]}))"
        if len(a) == 2 else f"width_bucket({', '.join(a)})"
    ))
    out = _rewrite_calls(
        out, "millisecond",
        lambda a: f"cast(date_format({a[0]}, 'SSS') as int)",
    )
    out = _rewrite_calls(
        out, "year_of_week", lambda a: f"extract(YEAROFWEEK FROM {a[0]})"
    )
    out = _rewrite_calls(out, "yow", lambda a: f"extract(YEAROFWEEK FROM {a[0]})")
    out = _rewrite_calls(
        out, "array_sum",
        lambda a: (
            f"aggregate({a[0]}, cast(0 as double), (acc, v) -> acc + v)"
        ),
    )
    out = _rewrite_calls(
        out, "array_average",
        lambda a: (
            f"(aggregate({a[0]}, cast(0 as double), (acc, v) -> acc + v)"
            f" / size({a[0]}))"
        ),
    )
    out = _rewrite_calls(
        out, "array_normalize",
        lambda a: (
            # 1.0/p must divide as DOUBLE — decimal literals would give a
            # scale-truncated exponent (0.322581 for p=3.1, a 1e-6 skew)
            f"transform({a[0]}, x -> x / power(aggregate(transform({a[0]},"
            f" y -> pow(abs(y), {a[1]})), cast(0 as double),"
            f" (acc, v) -> acc + v), cast(1.0 as double)/cast({a[1]} as double)))"
        ) if len(a) == 2 else f"array_normalize({', '.join(a)})",
    )
    out = _rewrite_calls(
        out, "from_base", lambda a: f"cast(conv({a[0]}, {a[1]}, 10) as bigint)"
    )
    out = _rewrite_calls(
        out, "to_base", lambda a: f"lower(conv(cast({a[0]} as string), 10, {a[1]}))"
    )
    out = _rewrite_calls(out, "infinity", lambda a: "cast('Infinity' as double)")
    out = _rewrite_calls(out, "nan", lambda a: "cast('NaN' as double)")
    out = _rewrite_calls(
        out, "is_finite",
        lambda a: (
            f"(NOT isnan(cast({a[0]} as double)) AND"
            f" abs(cast({a[0]} as double)) <> cast('Infinity' as double))"
        ),
    )
    out = _rewrite_calls(
        out, "is_infinite",
        lambda a: f"(abs(cast({a[0]} as double)) = cast('Infinity' as double))",
    )
    out = _rewrite_calls(
        out, "is_json_scalar",
        lambda a: (
            f"({a[0]} IS NOT NULL AND json_object_keys({a[0]}) IS NULL"
            f" AND json_array_length({a[0]}) IS NULL)"
        ),
    )
    out = _rewrite_calls(
        out, "json_array_contains",
        lambda a: (
            f"array_contains(from_json({a[0]}, 'array<string>'),"
            f" cast({a[1]} as string))"
        ),
    )
    out = _rewrite_calls(
        out, "json_size",
        lambda a: (
            # Presto: object → #keys, array → #elements, scalar → 0.
            # size() yields -1 (legacy sizeOfNull) for non-maps — nullif
            # it away so scalars fall through to the 0 default.
            f"coalesce(json_array_length(get_json_object({a[0]}, {a[1]})),"
            f" nullif(size(from_json(get_json_object({a[0]}, {a[1]}),"
            f" 'map<string,string>')), -1), 0)"
        ) if len(a) == 2 else f"json_size({', '.join(a)})",
    )
    out = _rewrite_calls(
        out, "regexp_replace",
        lambda a: (
            f"regexp_replace({a[0]}, {a[1]}, '')" if len(a) == 2
            else f"regexp_replace({', '.join(a)})"
        ),
    )
    out = _rewrite_calls(out, "url_extract_host", lambda a: f"parse_url({a[0]}, 'HOST')")
    out = _rewrite_calls(out, "url_extract_path", lambda a: f"parse_url({a[0]}, 'PATH')")
    out = _rewrite_calls(out, "url_extract_query", lambda a: f"parse_url({a[0]}, 'QUERY')")
    out = _rewrite_calls(out, "url_extract_fragment", lambda a: f"parse_url({a[0]}, 'REF')")
    out = _rewrite_calls(out, "url_extract_protocol", lambda a: f"parse_url({a[0]}, 'PROTOCOL')")
    out = _rewrite_calls(
        out, "url_extract_parameter",
        lambda a: f"parse_url({a[0]}, 'QUERY', {a[1]})",
    )
    out = _rewrite_calls(
        out, "url_extract_port",
        lambda a: f"cast(regexp_extract({a[0]}, '://[^/]*?:(\\d+)', 1) as bigint)",
    )

    # Presto string literals are standard (backslash is literal); Spark's
    # SQL parser processes backslash escapes ('value_\d' → 'value_d').
    # Double backslashes inside single-quoted literals to preserve bytes.
    out = _escape_literal_backslashes(out)

    return out


def _escape_literal_backslashes(s: str) -> str:
    in_str, cur = False, []
    for c in s:
        if c == "'":
            in_str = not in_str
            cur.append(c)
        elif c == "\\" and in_str:
            cur.append("\\\\")
        else:
            cur.append(c)
    return "".join(cur)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    parts, depth, cur, in_str = [], 0, [], False
    i = 0
    while i < len(s):
        c = s[i]
        if c == "'" :
            in_str = not in_str
            cur.append(c)
        elif not in_str and c in "([":
            depth += 1
            cur.append(c)
        elif not in_str and c in ")]":
            depth -= 1
            cur.append(c)
        elif not in_str and depth == 0 and c == sep:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def _in_string_literal(expr: str, pos: int) -> bool:
    """Is ``pos`` inside a single-quoted SQL string literal? Quote parity
    over the prefix (Presto escapes a quote as '' — two quotes — so
    parity stays correct across escaped quotes)."""
    return expr.count("'", 0, pos) % 2 == 1


def _rewrite_calls(expr: str, fname: str, rewriter) -> str:
    """Find fname( ... ) calls, split top-level args, apply rewriter(args).
    Matches inside single-quoted string literals are left untouched."""
    out, i = [], 0
    pat = re.compile(rf"(?<![\w.]){fname}\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(expr, i)
        if not m:
            out.append(expr[i:])
            return "".join(out)
        if _in_string_literal(expr, m.start()):
            out.append(expr[i : m.end()])
            i = m.end()
            continue
        out.append(expr[i : m.start()])
        # find matching close paren
        depth, j, in_str = 1, m.end(), False
        while j < len(expr) and depth:
            c = expr[j]
            if c == "'":
                in_str = not in_str
            elif not in_str and c == "(":
                depth += 1
            elif not in_str and c == ")":
                depth -= 1
            j += 1
        inner = expr[m.end() : j - 1]
        args = [a.strip() for a in _split_top_level(inner)]
        out.append(rewriter(args))
        i = j


def _rewrite_row_ctor(expr: str) -> str:
    """Presto ROW constructor in a lambda body: ``-> (a, b)`` →
    ``-> struct(a, b)``. A scanner, not a regex: skips ``->`` inside
    string literals, finds the MATCHING close paren (so nested calls like
    ``-> (f(x), y)`` rewrite correctly), and only fires when the
    parenthesized body has a top-level comma (a bare ``-> (expr)`` is
    ordinary grouping, not a ROW)."""
    out, i = [], 0
    while True:
        k = expr.find("->", i)
        if k < 0:
            out.append(expr[i:])
            return "".join(out)
        if _in_string_literal(expr, k):
            out.append(expr[i : k + 2])
            i = k + 2
            continue
        j = k + 2
        while j < len(expr) and expr[j].isspace():
            j += 1
        if j >= len(expr) or expr[j] != "(":
            out.append(expr[i : j])
            i = j
            continue
        # matching close paren, literal-aware
        depth, p, in_str = 1, j + 1, False
        while p < len(expr) and depth:
            c = expr[p]
            if c == "'":
                in_str = not in_str
            elif not in_str and c == "(":
                depth += 1
            elif not in_str and c == ")":
                depth -= 1
            p += 1
        inner = expr[j + 1 : p - 1]
        if len(_split_top_level(inner)) > 1:
            out.append(expr[i:k] + "-> struct(" + _rewrite_row_ctor(inner) + ")")
        else:
            out.append(expr[i:k] + "-> (" + _rewrite_row_ctor(inner) + ")")
        i = p


def _fix_regexp_group_default(expr: str) -> str:
    def rw(name):
        def fix(args):
            if len(args) == 2:
                args = args + ["0"]
            return f"{name}({', '.join(args)})"

        return fix

    expr = _rewrite_calls(expr, "regexp_extract_all", rw("regexp_extract_all"))
    # careful not to re-match regexp_extract_all
    return _rewrite_calls(expr, "regexp_extract(?!_all)", rw("regexp_extract"))


def _fix_two_arg_replace(expr: str) -> str:
    def fix(args):
        if len(args) == 2:
            args = args + ["''"]
        return f"replace({', '.join(args)})"

    return _rewrite_calls(expr, "replace", fix)


# ---------------------------------------------------------------------------
# pipeline commands

_NAMED_GROUP = re.compile(r"\(\?P?<(\w+)>")


class SplError(ValueError):
    pass


def _cmd_where(df: DataFrame, body: str) -> DataFrame:
    return df.filter(F.expr(translate_expr(body)))


def _cmd_extend(df: DataFrame, body: str) -> DataFrame:
    for assign in _split_top_level(body):
        name, expr = assign.split("=", 1)
        df = df.withColumn(name.strip(), F.expr(translate_expr(expr.strip())))
    return df


def _cmd_project(df: DataFrame, body: str) -> DataFrame:
    cols = []
    for item in _split_top_level(body):
        item = item.strip()
        m = re.match(r"(?i)^(.*?)\s+as\s+(\w+)$", item)
        if m:
            cols.append(F.expr(translate_expr(m.group(1))).alias(m.group(2)))
        else:
            cols.append(F.col(item.strip('"')))
    return df.select(*cols)


def _cmd_project_away(df: DataFrame, body: str) -> DataFrame:
    return df.drop(*[c.strip().strip('"') for c in body.split(",")])


def _cmd_project_rename(df: DataFrame, body: str) -> DataFrame:
    # new=old pairs; names may be quoted ("__tag__:x"=a1 — SplUnittest.cpp:490)
    for pair in _split_top_level(body):
        new, old = pair.split("=", 1)
        df = df.withColumnRenamed(old.strip().strip('"'), new.strip().strip('"'))
    return df


def _parse_flags(body: str) -> tuple[dict[str, str], str]:
    flags = {}
    rest = body.strip()
    while rest.startswith("-"):
        m = re.match(r"^-([\w-]+)(?:=('[^']*'|\S+))?\s*", rest)
        if not m:
            break
        val = m.group(2)
        if val is None:
            val = "true"
        elif val.startswith("'") and val.endswith("'"):
            val = val[1:-1]
        flags[m.group(1)] = val
        rest = rest[m.end() :]
    return flags, rest


def _unescape(s: str) -> str:
    return (
        s.replace(r"\x09", "\t").replace(r"\t", "\t").replace(r"\11", "\t")
        .replace(r"\n", "\n")
    )


def _cmd_parse_regexp(df: DataFrame, body: str) -> DataFrame:
    m = re.match(r"^\s*(\w+)\s*,\s*'([^']*)'\s*(?:as\s+(.*))?$", body, re.DOTALL)
    if not m:
        raise SplError(f"bad parse-regexp: {body!r}")
    col, pattern, aliases = m.group(1), m.group(2), m.group(3)
    names = _NAMED_GROUP.findall(pattern)
    if names:
        keys = names
        pattern = _NAMED_GROUP.sub("(", pattern)
    elif aliases:
        keys = [a.strip() for a in aliases.split(",")]
    else:
        raise SplError("parse-regexp needs 'as' aliases or named groups")
    for i, k in enumerate(keys):
        df = df.withColumn(k, F.regexp_extract(F.col(col), pattern, i + 1))
    return df


def _cmd_parse_json(df: DataFrame, body: str) -> DataFrame:
    flags, col = _parse_flags(body)
    col = col.strip()
    prefix = flags.get("prefix", "")
    path = flags.get("path")
    src = F.col(col)
    if path:
        src = F.get_json_object(src, path)
    parsed = F.from_json(src, T.MapType(T.StringType(), T.StringType()))
    if prefix:
        parsed = F.transform_keys(parsed, lambda k, _: F.concat(F.lit(prefix), k))
    return df.withColumn(f"{prefix}parsed" if prefix else "parsed", parsed)


def _cmd_parse_csv(df: DataFrame, body: str) -> DataFrame:
    flags, rest = _parse_flags(body)
    m = re.match(r"^\s*(\w+)\s+as\s+(.*)$", rest)
    if not m:
        raise SplError(f"bad parse-csv: {rest!r}")
    col, aliases = m.group(1), [a.strip() for a in m.group(2).split(",")]
    delim = _unescape(flags.get("delim", ","))
    # SPL parse-csv default is UNQUOTED (the corpus passes -quote='"'
    # explicitly when quoting applies).
    quote = _unescape(flags["quote"]) if "quote" in flags else None
    strict = "strict" in flags
    if quote:
        schema = ", ".join(f"`{k}` string" for k in aliases)
        opts = {"sep": delim, "quote": quote, "mode": "PERMISSIVE"}
        parsed = F.from_csv(F.col(col), F.lit(schema), opts)
        for k in aliases:
            df = df.withColumn(k, parsed[k])
    else:
        # unquoted: plain split — also sidesteps Jackson's delimiter
        # restrictions (e.g. a backslash separator)
        arr = F.split(F.col(col), re.escape(delim), -1)
        for i, k in enumerate(aliases):
            df = df.withColumn(k, F.try_element_at(arr, F.lit(i + 1)))
    if strict:
        # strict: field count must equal alias count, else all-null
        arr = F.split(F.col(col), re.escape(delim), -1)
        ok = F.size(arr) == len(aliases)
        for k in aliases:
            df = df.withColumn(k, F.when(ok, F.col(k)))
    return df


def _cmd_parse_kv(df: DataFrame, body: str) -> DataFrame:
    flags, col = _parse_flags(body)
    if "regexp" in flags:
        # parse-kv -regexp col, '(key)(value)' — pairs are the regex's
        # two capture groups over every match (SplUnittest.cpp:415-500:
        # 'k1=v1&k2=v2?k3=v3' with '(\w+)=(\w+)' → k1..k3). Pattern via
        # lit() so its backslashes bypass SQL-literal escaping.
        m = re.match(r"^\s*(\w+)\s*,\s*'([^']*)'\s*$", col)
        if not m:
            raise SplError(f"bad parse-kv -regexp: {col!r}")
        src, pattern = m.group(1), m.group(2)
        prefix = flags.get("prefix", "")
        keys = F.regexp_extract_all(F.col(src), F.lit(pattern), F.lit(1))
        vals = F.regexp_extract_all(F.col(src), F.lit(pattern), F.lit(2))
        parsed = F.map_from_arrays(keys, vals)
        if prefix:
            parsed = F.transform_keys(
                parsed, lambda k, _: F.concat(F.lit(prefix), k)
            )
        return df.withColumn(f"{prefix}kv" if prefix else "kv", parsed)
    col = col.strip()
    delims = flags.get("delims", "&")
    sep = flags.get("kv-sep", "=")
    prefix = flags.get("prefix", "")
    delim_rx = "[" + re.escape(delims) + "]"
    parsed = F.str_to_map(F.col(col), F.lit(delim_rx), F.lit(re.escape(sep)))
    if prefix:
        parsed = F.transform_keys(parsed, lambda k, _: F.concat(F.lit(prefix), k))
    return df.withColumn(f"{prefix}kv" if prefix else "kv", parsed)


_COMMANDS = {
    "where": _cmd_where,
    "extend": _cmd_extend,
    "project-away": _cmd_project_away,
    "project-rename": _cmd_project_rename,
    "project": _cmd_project,
    "parse-regexp": _cmd_parse_regexp,
    "parse-json": _cmd_parse_json,
    "parse-csv": _cmd_parse_csv,
    "parse-kv": _cmd_parse_kv,
}


# ---------------------------------------------------------------------------
# program

class SplProgram:
    """Compiled SPL program: ``run(df)`` → list of output DataFrames.

    Single anonymous pipeline → one output. ``.let``/``$ref`` statements →
    one output per bare ``$name;`` emission (the multi-output branching
    shape of ProcessorSPL.cpp:113-134)."""

    def __init__(self, script: str):
        self.script = script.strip()

    @staticmethod
    def _ensure_udfs(spark) -> None:
        """Register the SPL scalar functions that have no Spark builtin
        (hmac_*) as Arrow-batched pandas UDFs, once per session."""
        if getattr(spark, "_lc_spl_udfs_registered", False):
            return
        import hashlib
        import hmac as hmac_mod

        def make(alg):
            @F.pandas_udf("binary")
            def f(data, key):
                import pandas as pd

                return pd.Series(
                    [
                        None
                        if d is None or k is None
                        else hmac_mod.new(
                            bytes(k), bytes(d), getattr(hashlib, alg)
                        ).digest()
                        for d, k in zip(data, key)
                    ]
                )

            return f

        for alg in ("md5", "sha1", "sha256", "sha512"):
            spark.udf.register(f"hmac_{alg}", make(alg))

        # SpookyHash V2 (corpus spl.txt:77-78) — pure-Python transcription
        # of the published public-domain algorithm (functions/spooky.py),
        # cross-checked against an independent unrolled transcription
        # (tests/spooky_ref.py) across all tail cases + the 192-byte
        # short/long boundary. Offline container: no external KATs, so
        # absolute values remain unanchored to a Presto instance.
        from loongcollector_spark.functions import spooky as spooky_mod

        def make_spooky(width):
            fn = (
                spooky_mod.spooky_hash_v2_32
                if width == 32
                else spooky_mod.spooky_hash_v2_64
            )

            @F.pandas_udf("binary")
            def f(data):
                import pandas as pd

                return pd.Series(
                    [None if d is None else fn(bytes(d)) for d in data]
                )

            return f

        spark.udf.register("spooky_hash_v2_32", make_spooky(32))
        spark.udf.register("spooky_hash_v2_64", make_spooky(64))

        # Presto xxhash64: seed-0 XXH64 of the raw bytes, returned as the
        # 8-byte little-endian varbinary (Presto stores the long via
        # Slice.setLong — LE on every production platform). Anchored to
        # published XXH64 known-answer vectors in tests/test_hash_golden.py.
        from loongcollector_spark.functions.xxh64 import xxh64 as _xxh64

        @F.pandas_udf("binary")
        def _presto_xxhash64(data):
            import pandas as pd

            return pd.Series(
                [
                    None
                    if d is None
                    else _xxh64(bytes(d)).to_bytes(8, "little")
                    for d in data
                ]
            )

        spark.udf.register("presto_xxhash64", _presto_xxhash64)

        # HLL sketch family: Spark's native approx family covers the
        # semantics (hll_sketch_agg / hll_union / approx_count_distinct);
        # empty_approx_set() maps to the NULL sketch, the identity under
        # union (corpus spl.txt:163). SQL UDF, not a Python UDF: it folds
        # to a literal NULL inside codegen — no Python round-trip.
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION empty_approx_set() "
            "RETURNS BINARY RETURN CAST(NULL AS BINARY)"
        )
        spark._lc_spl_udfs_registered = True

    def run(self, df: DataFrame) -> list[DataFrame]:
        self._ensure_udfs(df.sparkSession)
        bindings: dict[str, DataFrame] = {}
        outputs: list[DataFrame] = []
        statements = [
            st.strip() for st in _split_top_level(self.script, ";") if st.strip()
        ]
        if len(statements) == 1 and not statements[0].startswith((".let", "$")):
            return [self._pipeline(df, statements[0], bindings)]
        for st in statements:
            if st.startswith(".let"):
                m = re.match(r"^\.let\s+(\w+)\s*=\s*(.*)$", st, re.DOTALL)
                if not m:
                    raise SplError(f"bad .let: {st!r}")
                bindings[m.group(1)] = self._pipeline(df, m.group(2), bindings)
            elif re.fullmatch(r"\$\w+", st):
                outputs.append(bindings[st[1:]])
            else:
                outputs.append(self._pipeline(df, st, bindings))
        return outputs

    def _pipeline(self, df: DataFrame, text: str, bindings: dict) -> DataFrame:
        stages = [s.strip() for s in _split_top_level(text, "|")]
        src = stages[0]
        if src.startswith("$"):
            cur = bindings[src[1:]]
        elif src in ("*", ""):
            cur = df
        else:
            raise SplError(f"bad pipeline source: {src!r}")
        for stage in stages[1:]:
            if not stage:
                continue
            name_match = re.match(r"^([\w-]+)\s*(.*)$", stage, re.DOTALL)
            cmd = name_match.group(1)
            body = name_match.group(2)
            fn = _COMMANDS.get(cmd)
            if fn is None:
                raise SplError(f"unsupported SPL command: {cmd!r}")
            cur = fn(cur, body)
        return cur


def run_spl(df: DataFrame, script: str) -> list[DataFrame]:
    return SplProgram(script).run(df)
