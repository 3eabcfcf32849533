"""Columnar / data-lake explode tier: parquet, ORC, Arrow IPC, Avro.

Reference bar: the CSV child-document contract of enhance_csv.py:
205-253 (typed shadows, #rownum ids) extended to data-lake row files,
the way the sqlite/dbf tiers already extend it to databases.  The
Avro reader (operators/avroio.py) is native — pinned here on a
hand-assembled spec-literal container, not just its own fixture
encoder (a shared encode/decode bug would cancel out).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import pyarrow as pa
import pytest

from open_semantic_etl_spark.operators.avroio import build_avro, read_avro
from open_semantic_etl_spark.sources.columnar import (
    _columnar_rows,
    columnar_kind,
)


def _pq(t: pa.Table) -> bytes:
    import pyarrow.parquet as pq

    b = io.BytesIO()
    pq.write_table(t, b)
    return b.getvalue()


def _orc(t: pa.Table) -> bytes:
    from pyarrow import orc

    b = io.BytesIO()
    orc.write_table(t, b)
    return b.getvalue()


def _fe(t: pa.Table) -> bytes:
    import pyarrow.feather as fe

    b = io.BytesIO()
    fe.write_feather(t, b)
    return b.getvalue()


TAB = pa.table({"name": ["item3", "thing3"], "value": ["3.5", "x3"]})

AVRO_TAB_SCHEMA = {
    "type": "record",
    "name": "Row",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "value", "type": "string"},
    ],
}
AVRO_TAB_ROWS = [
    {"name": "item3", "value": "3.5"},
    {"name": "thing3", "value": "x3"},
]


@pytest.mark.parametrize(
    "blob,kind",
    [
        (_pq(TAB), "parquet"),
        (_orc(TAB), "orc"),
        (_fe(TAB), "feather"),
        (build_avro(AVRO_TAB_ROWS, AVRO_TAB_SCHEMA), "avro"),
    ],
)
def test_csv_contract_all_kinds(blob: bytes, kind: str):
    assert columnar_kind(blob) == kind
    got = _columnar_rows(blob, f"u.{kind}")
    assert [r["child_id"] for r in got] == [
        f"u.{kind}#{kind}#1",
        f"u.{kind}#{kind}#2",
    ]
    assert got[0]["fields"] == {"name_t": "item3", "value_t": "3.5"}
    assert got[0]["numbers"] == {"value_f": 3.5}
    assert got[1]["fields"] == {"name_t": "thing3", "value_t": "x3"}
    assert got[1]["numbers"] == {}
    assert got[0]["table_s"] == kind and got[0]["page_i"] == 1


def test_ascii_head_magics_need_tail_magic():
    """3-byte/4-byte ASCII head magics alone must not label prose."""
    assert columnar_kind(b"ORCHESTRA plays tonight at eight") is None
    assert columnar_kind(b"PAR1 is the designated parking zone") is None
    assert columnar_kind(_orc(TAB)) == "orc"
    assert columnar_kind(_pq(TAB)) == "parquet"
    from open_semantic_etl_spark.operators.htmlx import sniff_content_type

    assert sniff_content_type(b"PAR1 is the designated parking zone") is None
    assert sniff_content_type(b"ORCHESTRA plays tonight at eight") is None


def test_typed_shadows_and_nested_json():
    t = pa.table(
        {
            "n": pa.array([7], pa.int64()),
            "x": pa.array([2.5], pa.float64()),
            "b": pa.array([True], pa.bool_()),
            "raw": pa.array([b"\x01\x02"], pa.binary()),
            "lst": pa.array([[1, 2]], pa.list_(pa.int64())),
            "miss": pa.array([None], pa.string()),
        }
    )
    (row,) = _columnar_rows(_pq(t), "u")
    assert row["fields"]["n_t"] == "7" and row["numbers"]["n_f"] == 7.0
    assert row["numbers"]["x_f"] == 2.5
    assert row["fields"]["b_t"] == "True" and row["numbers"]["b_f"] == 1.0
    assert row["fields"]["raw_t"] == "0102" and "raw_f" not in row["numbers"]
    assert row["fields"]["lst_t"] == "[1,2]" and "lst_f" not in row["numbers"]
    assert "miss_t" not in row["fields"]  # nulls skipped, CSV parity


def test_corrupt_and_truncated_raise_for_wrapper_degrade():
    """_columnar_rows raises on malformation (like _sqlite_rows's
    sqlite3.Error path) and explode_columnar maps that to zero
    children — the DataFrame-level test below pins the degrade."""
    with pytest.raises(Exception):
        _columnar_rows(b"PAR1 corrupt middle but both magics PAR1", "u")
    blob = build_avro(AVRO_TAB_ROWS, AVRO_TAB_SCHEMA, "deflate")
    with pytest.raises(ValueError):
        read_avro(blob[: len(blob) - 4])  # truncated sync
    # non-columnar bytes are a clean no-match, not an error
    assert _columnar_rows(b"just some text", "u") == []


def test_row_cap(monkeypatch):
    import open_semantic_etl_spark.sources.columnar as C

    monkeypatch.setattr(C, "COLUMNAR_MAX_ROWS", 3)
    t = pa.table({"v": [str(i) for i in range(10)]})
    assert len(_columnar_rows(_pq(t), "u")) == 3
    assert len(_columnar_rows(_fe(t), "u")) == 3
    assert len(_columnar_rows(_orc(t), "u")) == 3


# ---------------------------------------------------------------------------
# avro binary-encoding pins
# ---------------------------------------------------------------------------


def _varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(n: int) -> bytes:
    return _varint((n << 1) ^ (n >> 63) if n < 0 else n << 1)


def test_avro_spec_literal_container():
    """hand-assembled object container (Avro spec §Object Container
    Files): record {id: long, tag: string, score: double} — no
    encoder from avroio.py involved."""
    schema = {
        "type": "record",
        "name": "T",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "tag", "type": "string"},
            {"name": "score", "type": "double"},
        ],
    }
    sjson = json.dumps(schema).encode()
    meta = (
        _zz(1)  # one metadata entry in this block
        + _zz(11)
        + b"avro.schema"
        + _zz(len(sjson))
        + sjson
        + _zz(0)  # map end
    )
    sync = b"0123456789abcdef"
    # two records: (-3, "hi", 1.5) and (300, "", -0.25)
    rec1 = _zz(-3) + _zz(2) + b"hi" + struct.pack("<d", 1.5)
    rec2 = _zz(300) + _zz(0) + struct.pack("<d", -0.25)
    body = rec1 + rec2
    blob = (
        b"Obj\x01" + meta + sync + _zz(2) + _zz(len(body)) + body + sync
    )
    got_schema, rows = read_avro(blob)
    assert got_schema["name"] == "T"
    assert rows == [
        {"id": -3, "tag": "hi", "score": 1.5},
        {"id": 300, "tag": "", "score": -0.25},
    ]
    # zigzag pins straight from the spec's examples: 1→2, -1→1, 2→4
    assert _zz(1) == b"\x02" and _zz(-1) == b"\x01" and _zz(2) == b"\x04"
    assert _zz(64) == b"\x80\x01"  # varint continuation


def test_avro_complex_types_round_trip():
    schema = {
        "type": "record",
        "name": "C",
        "fields": [
            {"name": "u", "type": ["null", "long"]},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["A", "B", "C"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "F", "size": 3}},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "ok", "type": "boolean"},
            {"name": "f32", "type": "float"},
        ],
    }
    rows = [
        {"u": None, "e": "B", "fx": b"\x00\x01\x02", "arr": [1, -2, 3],
         "m": {"k": "v"}, "ok": True, "f32": 0.5},
        {"u": 42, "e": "A", "fx": b"xyz", "arr": [],
         "m": {}, "ok": False, "f32": -2.0},
    ]
    for codec in ("null", "deflate", "snappy"):
        _, got = read_avro(build_avro(rows, schema, codec))
        assert got == rows, codec


def test_avro_snappy_crc_verified():
    blob = bytearray(build_avro(AVRO_TAB_ROWS, AVRO_TAB_SCHEMA, "snappy"))
    blob[-18] ^= 0x01  # flip a bit inside the block's CRC suffix
    with pytest.raises(ValueError):
        read_avro(bytes(blob))


def test_avro_count_bomb_rejected_before_allocation():
    """a block header claiming 2^40 rows must fail cheaply (cap), not
    allocate."""
    schema = {"type": "record", "name": "B",
              "fields": [{"name": "x", "type": "long"}]}
    sjson = json.dumps(schema).encode()
    meta = _zz(1) + _zz(11) + b"avro.schema" + _zz(len(sjson)) + sjson + _zz(0)
    sync = b"0123456789abcdef"
    blob = b"Obj\x01" + meta + sync + _zz(1 << 40) + _zz(1) + b"\x02" + sync
    with pytest.raises(ValueError):
        read_avro(blob)


def test_avro_deflate_bomb_capped_before_allocation():
    """a deflate block expanding past _MAX_STR must raise at the cap,
    not materialize the full expansion (decompressobj max_length path)."""
    from open_semantic_etl_spark.operators.avroio import _MAX_STR

    schema = {"type": "record", "name": "B",
              "fields": [{"name": "x", "type": "long"}]}
    sjson = json.dumps(schema).encode()
    meta = (
        _zz(2) + _zz(11) + b"avro.schema" + _zz(len(sjson)) + sjson
        + _zz(10) + b"avro.codec" + _zz(7) + b"deflate" + _zz(0)
    )
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = comp.compress(b"\x00" * (_MAX_STR + (1 << 20))) + comp.flush()
    sync = b"0123456789abcdef"
    blob = (b"Obj\x01" + meta + sync
            + _zz(1) + _zz(len(body)) + body + sync)
    with pytest.raises(ValueError, match="over cap"):
        read_avro(blob)


def test_unknown_codec_fails_loudly():
    blob = build_avro(AVRO_TAB_ROWS, AVRO_TAB_SCHEMA)
    bad = blob.replace(b"null", b"lzo!", 1)  # avro.codec value, same length
    with pytest.raises(ValueError):
        read_avro(bad)


def test_extract_html_degrades_to_columnar_labels():
    from open_semantic_etl_spark.operators.htmlx import extract_html

    for blob, label in [
        (_pq(TAB), "application/vnd.apache.parquet"),
        (_orc(TAB), "application/x-orc"),
        (_fe(TAB), "application/vnd.apache.arrow.file"),
        (build_avro(AVRO_TAB_ROWS, AVRO_TAB_SCHEMA), "application/avro"),
    ]:
        r = extract_html(blob)
        assert r["content_type"] == label and r["content"] == ""


def test_explode_columnar_dataframe(spark):
    from pyspark.sql import Row

    from open_semantic_etl_spark.sources.columnar import explode_columnar

    df = spark.createDataFrame(
        [
            Row(url="file:///d/1.parquet", html=_pq(TAB)),
            Row(url="file:///d/2.avro",
                html=build_avro(AVRO_TAB_ROWS, AVRO_TAB_SCHEMA, "snappy")),
            Row(url="file:///d/3.bin", html=b"not columnar"),
        ]
    )
    got = {
        (r.url, r.fields["name_t"], r.numbers.get("value_f"))
        for r in explode_columnar(df).collect()
    }
    assert got == {
        ("file:///d/1.parquet#parquet#1", "item3", 3.5),
        ("file:///d/1.parquet#parquet#2", "thing3", None),
        ("file:///d/2.avro#avro#1", "item3", 3.5),
        ("file:///d/2.avro#avro#2", "thing3", None),
    }
