"""processor_parse_from_pb_native — SLS protobuf LogGroup decode.

Reference: core/plugin/processor/inner/ProcessorParseFromPBNative.cpp
(supported protocol "sls_logs"), schema core/protobuf/sls/sls_logs.proto:

    Log      { required uint32 Time = 1; repeated Content Contents = 2;
               repeated string values = 3; optional fixed32 Time_ns = 4; }
    Content  { required string Key = 1; required string Value = 2; }
    LogTag   { required string Key = 1; required string Value = 2; }
    LogGroup { repeated Log Logs = 1; optional string Category = 2;
               optional string Topic = 3; optional string Source = 4;
               optional string MachineUUID = 5; repeated LogTag LogTags = 6; }

This container has no protobuf runtime, so the proto2 *wire format* is
decoded directly (varint tags, length-delimited submessages — the format
itself is public and trivially small for these four messages). Decode
runs in ``mapInPandas`` (Arrow batches in, one output row per Log), so a
100 TB scan fans out with no driver involvement and no shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from loongcollector_spark.operators.base import Processor, register


class PbDecodeError(ValueError):
    pass


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if i >= len(buf):
            raise PbDecodeError("truncated varint")
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7
        if shift > 63:
            raise PbDecodeError("varint too long")


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message's bytes."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _read_varint(buf, i)
        elif wt == 1:  # 64-bit
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            if i + ln > len(buf):
                raise PbDecodeError("truncated length-delimited field")
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise PbDecodeError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _decode_kv(buf: bytes) -> tuple[str, str]:
    k = v = ""
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            k = val.decode("utf-8", "replace")
        elif fnum == 2:
            v = val.decode("utf-8", "replace")
    return k, v


def _decode_log(buf: bytes) -> dict:
    out = {"time": 0, "time_ns": None, "contents": {}, "values": []}
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            out["time"] = val
        elif fnum == 2:
            k, v = _decode_kv(val)
            out["contents"][k] = v
        elif fnum == 3:
            out["values"].append(val.decode("utf-8", "replace"))
        elif fnum == 4:
            out["time_ns"] = val
    return out


def decode_log_group(buf: bytes) -> dict:
    g = {
        "logs": [], "category": None, "topic": None, "source": None,
        "machine_uuid": None, "tags": {},
    }
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            g["logs"].append(_decode_log(val))
        elif fnum == 2:
            g["category"] = val.decode("utf-8", "replace")
        elif fnum == 3:
            g["topic"] = val.decode("utf-8", "replace")
        elif fnum == 4:
            g["source"] = val.decode("utf-8", "replace")
        elif fnum == 5:
            g["machine_uuid"] = val.decode("utf-8", "replace")
        elif fnum == 6:
            k, v = _decode_kv(val)
            g["tags"][k] = v
    return g


@register("processor_parse_from_pb_native")
class ParseFromPbNative(Processor):
    """Binary ``SourceKey`` column of serialized LogGroups → one row per
    Log: group fields (topic/source/category/machine_uuid/tags) + the
    log's time, time_ns and contents map. Undecodable payloads are
    dropped (the reference discards and alarms)."""

    OUT_FIELDS = [
        T.StructField("topic", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("machine_uuid", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("log_time", T.LongType()),
        T.StructField("log_time_ns", T.LongType()),
        T.StructField("contents", T.MapType(T.StringType(), T.StringType())),
    ]

    def __init__(self, SourceKey: str = "raw", Protocol: str = "sls_logs") -> None:
        if Protocol != "sls_logs":
            raise ValueError(
                "only 'sls_logs' is supported "
                "(ProcessorParseFromPBNative.cpp:40)"
            )
        self.source_key = SourceKey

    def __call__(self, df: DataFrame) -> DataFrame:
        src = self.source_key
        passthrough = [f for f in df.schema.fields if f.name != src]
        out_schema = T.StructType(passthrough + self.OUT_FIELDS)
        pass_names = [f.name for f in passthrough]

        def decode(batches):
            import pandas as pd

            for pdf in batches:
                rows = []
                for _, row in pdf.iterrows():
                    raw = row[src]
                    if raw is None:
                        continue
                    try:
                        g = decode_log_group(bytes(raw))
                    except PbDecodeError:
                        continue
                    base = {n: row[n] for n in pass_names}
                    for log in g["logs"]:
                        rows.append(
                            {
                                **base,
                                "topic": g["topic"],
                                "source": g["source"],
                                "category": g["category"],
                                "machine_uuid": g["machine_uuid"],
                                "tags": g["tags"],
                                "log_time": log["time"],
                                "log_time_ns": log["time_ns"],
                                "contents": log["contents"],
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=pass_names + [f.name for f in self.OUT_FIELDS]
                )

        return df.mapInPandas(decode, schema=out_schema)


# ---------------------------------------------------------------------------
# encoder — the flusher-side wire format (flusher_sls serializes LogGroups;
# pkg/protocol/converter + core/plugin/flusher/sls). Same four messages,
# written back out.

def _w_varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _w_len(fnum: int, payload: bytes) -> bytes:
    return _w_varint((fnum << 3) | 2) + _w_varint(len(payload)) + payload


def _w_kv(k: str, v: str) -> bytes:
    return _w_len(1, k.encode()) + _w_len(2, (v or "").encode())


def encode_log(time_s: int, contents: dict, time_ns: int | None = None) -> bytes:
    body = _w_varint(1 << 3) + _w_varint(int(time_s))
    for k, v in contents.items():
        body += _w_len(2, _w_kv(str(k), v))
    if time_ns is not None:
        body += _w_varint((4 << 3) | 5) + int(time_ns).to_bytes(4, "little")
    return body


def encode_log_group(
    logs: list[bytes],
    topic: str = "",
    source: str = "",
    category: str = "",
    tags: dict | None = None,
) -> bytes:
    out = b"".join(_w_len(1, lg) for lg in logs)
    if category:
        out += _w_len(2, category.encode())
    if topic:
        out += _w_len(3, topic.encode())
    if source:
        out += _w_len(4, source.encode())
    for k, v in (tags or {}).items():
        out += _w_len(6, _w_kv(str(k), v))
    return out


def serialize_log_groups(
    df: DataFrame,
    group_key: str,
    time_col: str,
    content_cols: list[str],
    topic_col: str | None = None,
    source: str = "",
    max_log_count: int = 1024,
) -> DataFrame:
    """Rows → one serialized LogGroup per (group_key, chunk) — the
    flusher_sls batch shape (aggregator packs ≤ MaxLogCount logs per
    group). Returns (group_key, n_logs, payload binary). applyInPandas
    per group: the encode is row-local, the only shuffle is the group
    key — identical to the Batcher's tag-hash batching."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[group_key],
            T.StructField("n_logs", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def enc(pdf):
        import pandas as pd

        gval = pdf[group_key].iloc[0]
        topic = str(pdf[topic_col].iloc[0]) if topic_col else ""
        pdf = pdf.sort_values(time_col)
        logs = [
            encode_log(
                int(row[time_col]),
                {c: None if row[c] is None else str(row[c]) for c in content_cols},
            )
            for _, row in pdf.iterrows()
        ]
        chunks = [
            logs[i : i + max_log_count] for i in range(0, len(logs), max_log_count)
        ] or [[]]
        return pd.DataFrame(
            [
                (gval, len(ch), encode_log_group(ch, topic=topic, source=source))
                for ch in chunks
            ],
            columns=[group_key, "n_logs", "payload"],
        )

    return df.groupBy(group_key).applyInPandas(enc, schema=out_schema)
