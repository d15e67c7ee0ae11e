"""Enrichment / mutation processors (SURVEY.md §2.3).

Headline: ``processor_dict_map`` — the reference's only lookup join
(plugins/processor/dictmap/processor_dict_map.go) — becomes an explicit
**broadcast hash join** against a tiny dimension DataFrame: no shuffle of
the fact side, the idiomatic Spark enrichment at 100 TB scale.
"""

from __future__ import annotations

import csv
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from loongcollector_spark.operators.base import Processor, register


@register("processor_dict_map")
class DictMap(Processor):
    """Map ``SourceKey`` values through a dict into ``DestKey``.

    Exact reference semantics (processor_dict_map.go:96-187):

    * dict sources: inline ``MapDict`` or 2-column CSV ``DictFilePath``
      (exactly 2 fields per row; duplicate keys are an error; at most
      ``MaxDictSize`` entries, default 1000)
    * value found, DestKey == SourceKey → value replaced in place
    * value found, separate DestKey absent (NULL here) → dest = mapped
    * value found, DestKey present → ``Mode='fill'`` keeps the existing
      dest, ``Mode='overwrite'`` replaces it
    * value NOT in dict → row unchanged
    * source key missing (NULL value here) + ``HandleMissing`` →
      dest = ``Missing`` (default "Unknown"), same fill/overwrite rules

    Physical plan, size-dispatched: a dict of ≤ ``InlineThreshold``
    entries becomes a LITERAL map expression (``try_element_at`` on a
    ``create_map`` of constants) — a pure projection, zero exchanges,
    inside whole-stage codegen; larger dicts use an ``F.broadcast`` left
    join (map-side hash probe, still zero shuffle). Both shapes are
    value-equivalent; the inline path just removes the broadcast
    exchange + join node for the common tiny-enum case.
    """

    def __init__(
        self,
        SourceKey: str,
        DestKey: str | None = None,
        MapDict: dict[str, str] | None = None,
        DictFilePath: str | None = None,
        HandleMissing: bool = False,
        Missing: str = "Unknown",
        Mode: str = "overwrite",
        MaxDictSize: int = 1000,
        InlineThreshold: int = 64,
    ) -> None:
        if not MapDict and not DictFilePath:
            raise ValueError("at least one of MapDict / DictFilePath required")
        if Mode not in ("overwrite", "fill"):
            raise ValueError("Mode must be 'overwrite' or 'fill'")
        self.source_key = SourceKey
        self.dest_key = DestKey if DestKey and DestKey != SourceKey else SourceKey
        self.in_place = self.dest_key == SourceKey
        self.handle_missing = HandleMissing
        self.missing = Missing
        self.mode = Mode
        self.map_dict = dict(MapDict or {})
        self.inline_threshold = InlineThreshold
        if DictFilePath:
            self._load_csv(DictFilePath, MaxDictSize)
        if len(self.map_dict) > MaxDictSize:
            raise ValueError(f"dict exceeds MaxDictSize={MaxDictSize}")

    def _load_csv(self, path: str, max_size: int) -> None:
        with open(path, newline="") as f:
            for i, row in enumerate(csv.reader(f)):
                if len(row) != 2:
                    raise ValueError(f"dict CSV row {i} must have exactly 2 fields")
                if row[0] in self.map_dict:
                    raise ValueError(f"duplicate dict key {row[0]!r}")
                if len(self.map_dict) >= max_size:
                    raise ValueError(f"dict exceeds MaxDictSize={max_size}")
                self.map_dict[row[0]] = row[1]

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        inline = len(self.map_dict) <= self.inline_threshold
        if inline:
            # literal map projection — no join node, no exchange;
            # try_element_at (not element_at / map[key]) so a dict miss
            # is NULL under ANSI mode too
            if self.map_dict:
                entries: list = []
                for k, v in self.map_dict.items():
                    entries += [F.lit(k), F.lit(v)]
                mapped = F.try_element_at(
                    F.create_map(*entries), src.cast("string")
                )
            else:
                mapped = F.lit(None).cast("string")
            joined = df
        else:
            dict_df = df.sparkSession.createDataFrame(
                list(self.map_dict.items()), ["__lc_dict_k__", "__lc_dict_v__"]
            )
            # string-typed comparison like the inline path — a raw
            # src == key on a non-string source would ANSI-cast the
            # string keys to the source type and can throw at runtime
            joined = df.join(
                F.broadcast(dict_df),
                src.cast("string") == F.col("__lc_dict_k__"),
                "left",
            )
            mapped = F.col("__lc_dict_v__")

        if self.in_place:
            value = F.coalesce(mapped, src)  # dict miss → unchanged
            if self.handle_missing:
                value = F.when(src.isNull(), F.lit(self.missing)).otherwise(value)
            out = joined.withColumn(self.source_key, value)
        else:
            dest_exists = self.dest_key in df.columns
            existing = F.col(self.dest_key) if dest_exists else F.lit(None).cast("string")
            if self.mode == "fill":
                # fill: only write when dest is absent/NULL
                on_hit = F.coalesce(existing, mapped)
                on_missing_src = F.coalesce(existing, F.lit(self.missing))
            else:
                on_hit = mapped
                on_missing_src = F.lit(self.missing)
            value = F.when(src.isNull(),
                           on_missing_src if self.handle_missing else existing)
            value = value.when(mapped.isNotNull(), on_hit).otherwise(existing)
            out = joined.withColumn(self.dest_key, value)
        return out.drop("__lc_dict_k__", "__lc_dict_v__")


@register("processor_add_fields")
class AddFields(Processor):
    """Add constant fields; ``IgnoreIfExist`` keeps an existing non-null
    value (plugins/processor/addfields/processor_add_fields.go:26-30)."""

    def __init__(self, Fields: dict[str, str], IgnoreIfExist: bool = False):
        self.fields = Fields
        self.ignore_if_exist = IgnoreIfExist

    def __call__(self, df: DataFrame) -> DataFrame:
        for k, v in self.fields.items():
            if k in df.columns and self.ignore_if_exist:
                df = df.withColumn(k, F.coalesce(F.col(k), F.lit(v)))
            else:
                df = df.withColumn(k, F.lit(v))
        return df


@register("processor_rename")
class Rename(Processor):
    """Rename keys pairwise (plugins/processor/rename/processor_rename.go:27-35)."""

    def __init__(self, SourceKeys: list[str], DestKeys: list[str], NoKeyError: bool = False):
        if len(SourceKeys) != len(DestKeys):
            raise ValueError("SourceKeys and DestKeys must have equal length")
        self.pairs = list(zip(SourceKeys, DestKeys))
        self.no_key_error = NoKeyError

    def __call__(self, df: DataFrame) -> DataFrame:
        for s, d in self.pairs:
            if s not in df.columns:
                if self.no_key_error:
                    raise KeyError(f"rename source column {s!r} not found")
                continue
            df = df.withColumnRenamed(s, d)
        return df


@register("processor_appender")
class Appender(Processor):
    """Append ``Value`` to ``Key``, reference semantics
    (plugins/processor/appender/processor_appender.go:76-140):

    * ``{{var}}`` templates expand driver-side with ParseVariableValue
      rules — ``{{$NAME}}`` = env var, ``{{__ip__}}`` = local address,
      ``{{__host__}}`` = hostname, anything else stays as-is (go:122-140;
      ``{{env.X}}``/``{{meta.hostname}}`` kept as engine aliases)
    * a missing / NULL ``Key`` is created empty then appended (go:76-84)
    * ``SortLabels`` re-sorts the resulting ``|``-joined ``k#$#v`` label
      string by key (MetricLabels.String twin, go:93-104)
    * ``Delimiter`` is an engine extension (the reference appends
      directly: ``c.Value += r``); default '' matches the reference.
    """

    def __init__(self, Key: str, Value: str, Delimiter: str = "",
                 SortLabels: bool = False):
        import os
        import re as _re
        import socket

        def expand(m):
            inner = m.group(1)
            if inner.startswith("$"):
                return os.environ.get(inner[1:], "")
            if inner == "__ip__":
                try:
                    return socket.gethostbyname(socket.gethostname())
                except OSError:
                    return ""
            if inner in ("__host__", "meta.hostname"):
                return socket.gethostname()
            if inner.startswith("env."):
                return os.environ.get(inner[4:], "")
            return inner  # unknown variables pass through (go:140)

        self.key = Key
        self.value = _re.sub(r"\{\{([^}]+)\}\}", expand, Value)
        self.delim = Delimiter
        self.sort_labels = SortLabels

    def __call__(self, df: DataFrame) -> DataFrame:
        base = F.col(self.key) if self.key in df.columns else F.lit(None)
        appended = F.concat_ws(self.delim, base, F.lit(self.value))
        if self.sort_labels:
            from loongcollector_spark.operators.convert import _labels_string

            # SplitN(label, '#$#', 2): entries without the separator are
            # dropped; empty values survive (go:95-100)
            entries = F.transform(
                F.filter(
                    F.split(appended, r"\|"),
                    lambda s: F.instr(s, "#$#") > 0,
                ),
                lambda s: F.struct(
                    F.substring(s, F.lit(1), F.instr(s, "#$#") - 1).alias("k"),
                    F.substring(
                        s, F.instr(s, "#$#") + 3, F.length(s)
                    ).alias("v"),
                ),
            )
            appended = F.when(
                F.size(entries) > 0, _labels_string(entries)
            ).otherwise(appended)
        return df.withColumn(self.key, appended)


def _go_unquote_value(s: str) -> str:
    """Twin of the reference's unquote branch
    (processor_string_replace.go:116-121): a fully ``"``-quoted value
    goes through ``strconv.Unquote`` verbatim (quotes stripped, escapes
    decoded, bare interior quotes / raw newlines are errors); any other
    value is wrapped with its quotes pre-escaped as ``\\x22`` — escapes
    decode, literal quotes survive. Raises ValueError exactly where Go
    errors (caller keeps the original value, go:124-128). One divergence:
    ``\\xhh``/``\\ooo`` ≥ 0x80 decode to the codepoint, not a raw byte —
    Spark strings cannot hold invalid UTF-8."""
    quoted = len(s) >= 2 and s.startswith('"') and s.endswith('"')
    body = s[1:-1] if quoted else s.replace('"', "\\x22")
    simple = {"a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r",
              "t": "\t", "v": "\v", "\\": "\\", '"': '"'}
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == "\n":
            raise ValueError("raw newline in quoted string")
        if c == '"':
            raise ValueError("unescaped quote")
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("trailing backslash")
        e = body[i + 1]
        i += 2
        def hexval(width: int) -> int:
            # Go UnquoteChar errors on truncated escapes — int() alone
            # would silently accept a short slice
            chunk = body[i : i + width]
            if len(chunk) != width or not all(
                c in "0123456789abcdefABCDEF" for c in chunk
            ):
                raise ValueError("truncated/invalid hex escape")
            return int(chunk, 16)

        if e in simple:
            out.append(simple[e])
        elif e == "x":
            out.append(chr(hexval(2)))
            i += 2
        elif e == "u":
            v = hexval(4)
            if 0xD800 <= v <= 0xDFFF:
                raise ValueError("surrogate")
            out.append(chr(v))
            i += 4
        elif e == "U":
            v = hexval(8)
            if v > 0x10FFFF or 0xD800 <= v <= 0xDFFF:
                raise ValueError("bad rune")
            out.append(chr(v))
            i += 8
        elif e in "01234567":
            chunk = body[i - 1 : i + 2]
            if len(chunk) != 3 or not all(c in "01234567" for c in chunk):
                raise ValueError("bad octal")
            v = int(chunk, 8)
            if v > 255:
                raise ValueError("bad octal")
            out.append(chr(v))
            i += 2
        else:
            raise ValueError(f"invalid escape \\{e}")
    return "".join(out)


@register("processor_string_replace")
class StringReplace(Processor):
    """Regex / const substring / unquote replacement
    (plugins/processor/stringreplace/processor_string_replace.go:41-54,
    :100-138). regex/const stay JVM-side (all occurrences, go:111-114);
    unquote decodes Go escape sequences via an Arrow-batched pandas UDF
    (``strconv.Unquote`` twin — a regexp can't express it), keeping the
    original value where Go errors. ``DestKey`` appends, else in-place."""

    def __init__(
        self,
        SourceKey: str,
        Method: str,  # 'regex' | 'const' | 'unquote'
        Match: str | None = None,
        ReplaceString: str = "",
        DestKey: str | None = None,
    ) -> None:
        self.source_key = SourceKey
        self.method = Method
        self.match = Match
        self.replace = ReplaceString
        self.dest_key = DestKey or SourceKey

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        if self.method == "regex":
            val = F.regexp_replace(src, self.match, self.replace)
        elif self.method == "const":
            val = F.replace(src, F.lit(self.match), F.lit(self.replace))
        elif self.method == "unquote":
            @F.pandas_udf("string")
            def unq(col):  # noqa: ANN001
                import pandas as pd

                def one(v):
                    if v is None:
                        return None
                    try:
                        return _go_unquote_value(v)
                    except ValueError:
                        return v  # Go keeps the original on error

                return pd.Series([one(v) for v in col])

            val = unq(src)
        else:
            raise ValueError(f"unknown Method {self.method!r}")
        return df.withColumn(self.dest_key, val)


@register("processor_desensitize")
class Desensitize(Processor):
    """Mask sensitive values (plugins/processor/desensitize/processor_desensitize.go:35-49
    and the native twin core/plugin/processor/ProcessorDesensitizeNative.h:29-44).

    ``Method='const'`` replaces with ``ReplaceString``; ``Method='md5'``
    replaces with the md5 of the matched content. ``Match='full'`` masks
    the whole value (missing/NULL source stays NULL — the reference only
    touches present keys, processor_desensitize.go:132-140);
    ``Match='regex'`` keeps the ``RegexBegin`` anchor and replaces
    ``RegexContent``, rewritten lookbehind-free as
    ``(begin)(content)`` → ``$1<mask>``. ``ReplacingAll`` mirrors the
    native param (ProcessorDesensitizeNative.h:48, default true): the Go
    loop / RE2::GlobalReplace replace EVERY occurrence; False = first
    occurrence only (RE2::Replace). md5+ReplacingAll hashes each
    occurrence's own content (distinct (begin, content) pairs folded via
    ``aggregate``; literal-splice equivalent except for adversarial
    overlaps where a begin+content byte sequence occurs unmatched).
    """

    def __init__(
        self,
        SourceKey: str,
        Method: str = "const",
        Match: str = "full",
        ReplaceString: str = "********",
        RegexBegin: str = "",
        RegexContent: str = "",
        ReplacingAll: bool = True,
    ) -> None:
        self.source_key = SourceKey
        self.method = Method
        self.match = Match
        self.replace = ReplaceString
        self.regex_begin = RegexBegin
        self.regex_content = RegexContent
        self.replacing_all = ReplacingAll

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        if self.match == "full":
            val = (
                F.md5(src.cast("binary"))
                if self.method == "md5"
                else F.when(src.isNotNull(), F.lit(self.replace))
            )
            return df.withColumn(self.source_key, val)
        pat = f"({self.regex_begin})({self.regex_content})"
        if self.method == "md5":
            if self.replacing_all:
                # hash EVERY occurrence (reference loop,
                # ProcessorDesensitizeNative.cpp:214-238): fold the
                # distinct (begin, content) pairs, splicing b+md5(c)
                begins = F.regexp_extract_all(src, F.lit(pat), F.lit(1))
                contents = F.regexp_extract_all(src, F.lit(pat), F.lit(2))
                pairs = F.array_distinct(
                    F.zip_with(
                        begins, contents,
                        lambda b, c: F.struct(b.alias("b"), c.alias("c")),
                    )
                )
                val = F.aggregate(
                    pairs,
                    src,
                    lambda acc, p: F.replace(
                        acc,
                        F.concat(p["b"], p["c"]),
                        F.concat(p["b"], F.md5(p["c"].cast("binary"))),
                    ),
                )
            else:
                begin = F.regexp_extract(src, pat, 1)
                content = F.regexp_extract(src, pat, 2)
                val = F.when(
                    src.rlike(pat),
                    self._splice_first(
                        src, pat, F.concat(begin, F.md5(content.cast("binary")))
                    ),
                ).otherwise(src)
            return df.withColumn(self.source_key, val)
        if self.replacing_all:
            return df.withColumn(
                self.source_key,
                F.regexp_replace(
                    src, pat, "$1" + self.replace.replace("$", r"\$")
                ),
            )
        begin = F.regexp_extract(src, pat, 1)
        val = F.when(
            src.rlike(pat),
            self._splice_first(src, pat, F.concat(begin, F.lit(self.replace))),
        ).otherwise(src)
        return df.withColumn(self.source_key, val)

    @staticmethod
    def _splice_first(src, pat: str, replacement):
        """Replace only the FIRST regex match (RE2::Replace twin):
        position via regexp_instr, splice prefix + replacement + suffix."""
        pos = F.regexp_instr(src, F.lit(pat))  # 1-based match start
        whole = F.regexp_extract(src, pat, 0)
        return F.concat(
            F.substring(src, F.lit(1), pos - 1),
            replacement,
            F.substring(
                src, pos + F.length(whole), F.length(src)
            ),
        )


@register("processor_fields_with_condition")
class FieldsWithCondition(Processor):
    """CASE WHEN over field conditions: the first matching case applies its
    add/drop field actions
    (plugins/processor/fieldswithcondition/processor_fields_with_condition.go:31-99).

    ``Switch`` entries: ``{"Case": {"RelationOperator": op,
    "FieldConditions": {key: value}}, "AddFields": {...}, "DropKeys": [...]}``
    with op ∈ {equals, regexp, contains, startwith}; conditions AND within
    a case. Compiles to chained ``F.when`` — one codegen'd projection.
    """

    _OPS = {
        "equals": lambda c, v: c == F.lit(v),
        # Go regexp.MatchString is an UNANCHORED search (go:125-127),
        # exactly rlike — not a full match
        "regexp": lambda c, v: c.rlike(v),
        "contains": lambda c, v: c.contains(v),
        "startwith": lambda c, v: c.startswith(v),
    }

    def __init__(self, Switch: list[dict]):
        self.switch = Switch

    def _case_pred(self, case: dict):
        op = self._OPS[case.get("RelationOperator", "equals")]
        cond = F.lit(True)
        for k, v in case["FieldConditions"].items():
            cond = cond & op(F.col(k), v)
        return cond

    def __call__(self, df: DataFrame) -> DataFrame:
        preds = [self._case_pred(s["Case"]) for s in self.switch]
        # first-match-wins: predicate i AND none of the earlier ones
        firsts = []
        seen = F.lit(False)
        for p in preds:
            firsts.append(p & ~seen)
            seen = seen | p
        add_keys = sorted({k for s in self.switch for k in s.get("AddFields", {})})
        for k in add_keys:
            expr = F.col(k) if k in df.columns else F.lit(None).cast("string")
            for s, first in zip(reversed(self.switch), reversed(firsts)):
                if k in s.get("AddFields", {}):
                    expr = F.when(first, F.lit(s["AddFields"][k])).otherwise(expr)
            df = df.withColumn(k, expr)
        drop_keys = sorted({k for s in self.switch for k in s.get("DropKeys", [])})
        for k in drop_keys:
            if k not in df.columns:
                continue
            expr = F.col(k)
            for s, first in zip(reversed(self.switch), reversed(firsts)):
                if k in s.get("DropKeys", []):
                    expr = F.when(first, F.lit(None)).otherwise(expr)
            df = df.withColumn(k, expr)
        return df


@register("processor_packjson")
class PackJson(Processor):
    """Pack multiple keys into one JSON object field
    (plugins/processor/packjson/processor_packjson.go:65-92). Keys are
    emitted in SORTED order — Go's ``json.Marshal`` of a map sorts keys —
    and NULL (missing) sources are omitted from the object, like keys
    absent from packMap."""

    def __init__(self, SourceKeys: list[str], DestKey: str, KeepSource: bool = True,
                 AlarmIfIncomplete: bool = True):
        self.source_keys = SourceKeys
        self.dest_key = DestKey
        self.keep_source = KeepSource

    def __call__(self, df: DataFrame) -> DataFrame:
        df = df.withColumn(
            self.dest_key,
            F.to_json(F.struct(*[F.col(k) for k in sorted(self.source_keys)])),
        )
        if not self.keep_source:
            df = df.drop(*self.source_keys)
        return df


@register("processor_base64_encoding")
class Base64Encode(Processor):
    """(plugins/processor/base64/encoding). Go's
    ``base64.StdEncoding.EncodeToString`` emits ONE unwrapped line;
    Spark's ``base64`` MIME-wraps at 76 chars — strip the ``\\r\\n``
    continuations for byte-identical output."""

    def __init__(self, SourceKey: str, NewKey: str | None = None):
        self.source_key = SourceKey
        self.dest = NewKey or SourceKey

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.dest,
            F.regexp_replace(
                F.base64(F.col(self.source_key).cast("binary")), "\r\n", ""
            ),
        )


@register("processor_base64_decoding")
class Base64Decode(Processor):
    """(plugins/processor/base64/decoding/processor_base64_decoding.go:
    44-68). Go's ``base64.StdEncoding`` is STRICT — invalid charset or
    padding is an error and no decoded key is emitted (→ NULL here).
    Spark's ``unbase64`` is lenient (and ANSI-throwing on garbage), so
    the decode is gated on a standard-alphabet validity regex."""

    _VALID = (
        r"^(?:[A-Za-z0-9+/]{4})*"
        r"(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
    )

    def __init__(self, SourceKey: str, NewKey: str | None = None):
        self.source_key = SourceKey
        self.dest = NewKey or SourceKey

    def __call__(self, df: DataFrame) -> DataFrame:
        src = F.col(self.source_key)
        return df.withColumn(
            self.dest,
            F.when(src.rlike(self._VALID), F.unbase64(src).cast("string")),
        )


@register("processor_md5")
class Md5(Processor):
    """md5 of a field (plugins/processor/md5/processor_md5.go)."""

    def __init__(self, SourceKey: str, NewKey: str | None = None):
        self.source_key = SourceKey
        self.dest = NewKey or SourceKey

    def __call__(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.dest, F.md5(F.col(self.source_key).cast("binary")))


@register("processor_tag_native")
class TagNative(Processor):
    """Attach host tags as constant columns
    (core/plugin/processor/inner/ProcessorTagNative.cpp:64-109). On a
    cluster these become literals resolved at job start — free."""

    def __init__(self, Tags: dict[str, str] | None = None):
        import socket

        self.tags = Tags or {
            "__hostname__": socket.gethostname(),
            "__cloud_provider__": "none",
        }

    def __call__(self, df: DataFrame) -> DataFrame:
        for k, v in self.tags.items():
            df = df.withColumn(k, F.lit(v))
        return df


@register("processor_cloud_meta")
class CloudMeta(Processor):
    """Attach cloud-platform metadata columns
    (plugins/processor/cloudmeta/cloud_meta.go:34-120; key flags
    pkg/helper/platformmeta/interface.go:18-28). ``Platform`` providers:
    ``mock`` = the reference's MockManager constants (mock.go:28-71,
    used by its own tests — the only provider meaningful offline) and
    ``host`` = local hostname/IP; real IMDS providers need the cloud
    endpoint and are out of scope. ``Metadata`` selects flag keys,
    ``RenameMetadata`` renames them, ``JSONPath`` packs the whole meta
    dict as a JSON value under one key instead of flat columns."""

    _MOCK = {
        "__cloud_instance_id__": "id_xxx",
        "__cloud_instance_name__": "name_xxx",
        "__cloud_region__": "region_xxx",
        "__cloud_zone__": "zone_xxx",
        "__cloud_vpc_id__": "vpc_xxx",
        "__cloud_vswitch_id__": "vswitch_xxx",
        "__cloud_instance_type__": "type_xxx",
        "__cloud_image_id__": "image_xxx",
        "__cloud_instance_tags__": '{"tag_key":"tag_val"}',
        "__cloud_max_ingress__": "0",
        "__cloud_max_egress__": "0",
    }

    def __init__(
        self,
        Platform: str = "mock",
        Metadata: list[str] | None = None,
        RenameMetadata: dict[str, str] | None = None,
        JSONPath: str = "",
    ) -> None:
        import socket

        if Platform == "host":
            try:
                ip = socket.gethostbyname(socket.gethostname())
            except OSError:
                ip = ""
            provider = {
                "__cloud_instance_id__": socket.gethostname(),
                "__cloud_instance_name__": socket.gethostname(),
                "__cloud_region__": ip,
            }
        else:
            provider = dict(self._MOCK)
        wanted = Metadata or list(provider)
        rename = RenameMetadata or {}
        self.meta = {
            rename.get(k, k): provider[k] for k in wanted if k in provider
        }
        self.json_path = JSONPath

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.json_path:
            payload = json.dumps(self.meta, separators=(",", ":"), sort_keys=True)
            key = self.json_path.split(".")[0]
            return df.withColumn(key, F.lit(payload))
        for k, v in self.meta.items():
            df = df.withColumn(k, F.lit(v))
        return df


@register("processor_geoip")
class RangeLookup(Processor):
    """Range-lookup enrichment — the generalized form of processor_geoip
    (plugins/processor/geoip: ip → location via range database).

    The lookup table has (range_start, range_end, *attr) rows; each event
    value maps to the row whose [start, end] contains it. Physical plan:
    **broadcast range join** — the dim table is small (a geo DB is ~10^5
    rows), so Catalyst turns the non-equi join into BroadcastNestedLoop
    with the range predicate; for larger dims, pre-bucket both sides on
    ``floor(value / bucket)`` to get an equi-join key first (the classic
    range-join optimization), which this implements when ``Bucket`` is set.
    """

    def __init__(
        self,
        SourceKey: str,
        Ranges: list[tuple],  # (start, end, value)
        DestKey: str = "range_class",
        Bucket: int | None = None,
    ) -> None:
        self.source_key = SourceKey
        self.ranges = Ranges
        self.dest_key = DestKey
        self.bucket = Bucket

    def __call__(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        src = F.col(self.source_key)
        if self.bucket:
            # 1:1 equi-join on bucket id: each bucket row carries the
            # ARRAY of ranges touching it (built driver-side — the dim is
            # small), resolved per-row with a higher-order filter. No
            # row duplication even when a bucket holds several ranges.
            b = self.bucket
            buckets: dict[int, list[tuple]] = {}
            for lo, hi, val in self.ranges:
                for bkt in range(int(lo // b), int(hi // b) + 1):
                    buckets.setdefault(bkt, []).append((lo, hi, val))
            dim = spark.createDataFrame(
                [(k, v) for k, v in buckets.items()],
                "__bkt__ long, __ranges__ array<struct<lo:long,hi:long,val:string>>",
            )
            joined = df.withColumn("__bkt__", F.floor(src / b)).join(
                F.broadcast(dim), "__bkt__", "left"
            )
            hit = F.filter(
                F.col("__ranges__"),
                lambda r: (src >= r["lo"]) & (src <= r["hi"]),
            )
            out = joined.withColumn(
                self.dest_key, F.try_element_at(hit, F.lit(1))["val"]
            )
            return out.drop("__bkt__", "__ranges__")
        dim = spark.createDataFrame(self.ranges, ["__lo__", "__hi__", "__val__"])
        joined = df.join(
            F.broadcast(dim),
            (src >= F.col("__lo__")) & (src <= F.col("__hi__")),
            "left",
        )
        out = joined.withColumn(self.dest_key, F.col("__val__"))
        return out.drop("__lo__", "__hi__", "__val__")


@register("processor_default")
class Default(Processor):
    """No-op passthrough (plugins/processor/defaultone)."""

    def __init__(self, **_):
        pass

    def __call__(self, df: DataFrame) -> DataFrame:
        return df
