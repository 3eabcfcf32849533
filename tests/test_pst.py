"""Native [MS-PST] parser (operators/pst.py).

Reference bar: enhance_pst.py:20-128 shells to readpst and re-ingests
the dumped member tree; here the same tree comes out of an in-engine
Unicode NDB/LTP walk. Tests pin the full round-trip (build_pst →
parse_pst → parse_eml), the multi-page BTree and XBLOCK/subnode-value
paths, the rename-rule integration, and the total-function contract
over corrupted bytes.
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_semantic_etl_spark.operators.eml import parse_eml
from open_semantic_etl_spark.operators.pst import build_pst, parse_pst


def _two_folder_pst(d: int = 3) -> bytes:
    return build_pst(
        [
            (
                "Inbox",
                [
                    {
                        "nid_index": 1000 + d,
                        "subject": f"Bericht Nr {d}",
                        "sender": f"user{d}@example.org",
                        "to": f"team{d}@example.org, rcpt{d}@example.net",
                        "cc": f"cc{d}@example.org",
                        "body": f"Mail body {d}.\nGrüße, User {d}",
                        "date": datetime(2024, 3, 1, 7, 30, d, tzinfo=timezone.utc),
                        "attachments": [("report.txt", f"attachment {d}".encode())],
                    }
                ],
            ),
            (
                "Sent",
                [
                    {
                        "nid_index": 2000 + d,
                        "subject": f"Sent {d}",
                        "sender": f"sender{d}@example.org",
                        "to": f"dest{d}@example.org",
                        "body": f"Grüße {d}",
                        "date": datetime(2024, 3, 1, 10, 0, d, tzinfo=timezone.utc),
                    }
                ],
            ),
        ]
    )


def test_roundtrip_messages_and_attachment():
    members = dict(parse_pst(_two_folder_pst(3)))
    assert set(members) == {"Inbox/1003", "Inbox/1003-report.txt", "Sent/2003"}
    assert members["Inbox/1003-report.txt"] == b"attachment 3"
    r = parse_eml(members["Inbox/1003"])
    assert r["ok"] and r["message_from_ss"] == ["user3@example.org"]
    assert r["message_to_ss"] == [
        "team3@example.org", "rcpt3@example.net", "cc3@example.org",
    ]
    assert r["subject_txt"] == "Bericht Nr 3"
    assert r["message_dt"] == "2024-03-01T07:30:03Z"
    assert r["content_txt"] == "Mail body 3.\nGrüße, User 3"
    s = parse_eml(members["Sent/2003"])
    assert s["content_txt"] == "Grüße 3" and s["message_dt"] == "2024-03-01T10:00:03Z"


def test_multipage_btrees():
    """40 messages overflow one NBT leaf (15 entries) and one BBT leaf
    (20) — intermediate BTree pages on both trees."""
    msgs = [
        {
            "nid_index": 100 + i,
            "subject": f"m{i}",
            "sender": f"u{i}@x.y",
            "body": f"body {i}",
            "date": datetime(2024, 1, 1, tzinfo=timezone.utc),
        }
        for i in range(40)
    ]
    members = parse_pst(build_pst([("Big", msgs)]))
    assert [p for p, _ in members] == [f"Big/{100 + i}" for i in range(40)]
    assert parse_eml(members[17][1])["content_txt"] == "body 17"


def test_xblock_and_subnode_values():
    """>8176-byte values split into XBLOCK data trees; >3580-byte PC
    values move to the node's subnode BTree (§2.3.3.2) — both paths
    round-trip byte-exact."""
    blob = bytes(range(256)) * 48  # 12 KiB attachment
    pst = build_pst(
        [
            (
                "F",
                [
                    {
                        "nid_index": 7,
                        "subject": "s",
                        "sender": "a@b.c",
                        "body": "x" * 5000,
                        "date": datetime(2024, 1, 1, tzinfo=timezone.utc),
                        "attachments": [("blob.bin", blob)],
                    }
                ],
            )
        ]
    )
    members = dict(parse_pst(pst))
    assert members["F/7-blob.bin"] == blob
    assert parse_eml(members["F/7"])["content_txt"] == "x" * 5000


def test_explode_rename_rule_applies_to_real_pst():
    """sources/explode.parse_pst_members routes !BDN payloads through
    the real parser and applies the readpst bare-number → .eml rule
    (enhance_pst.py:100-108)."""
    from open_semantic_etl_spark.sources.explode import parse_pst_members

    out = parse_pst_members(_two_folder_pst(5), "file:///m/5.pst", "c5")
    ids = sorted(m["child_id"] for m in out)
    assert ids == [
        "file:///m/5.pst/Inbox/1005-report.txt",
        "file:///m/5.pst/Inbox/1005.eml",
        "file:///m/5.pst/Sent/2005.eml",
    ]
    assert all(m["container_s"] == "c5" for m in out)


def test_crypt_and_ansi_rejected_loudly():
    """PERMUTE/CYCLIC obfuscation and ANSI files fail with ValueError —
    never a wrong decode (the spec's permutation tables are not
    shipped; ANSI layout differs throughout)."""
    pst = bytearray(_two_folder_pst(1))
    pst[0x201] = 0x01  # NDB_CRYPT_PERMUTE
    with pytest.raises(ValueError, match="PERMUTE"):
        parse_pst(bytes(pst))
    pst[0x201] = 0x00
    struct.pack_into("<H", pst, 0x0A, 15)  # wVer: ANSI
    with pytest.raises(ValueError, match="ANSI"):
        parse_pst(bytes(pst))


def test_self_referencing_xblock_raises_cleanly():
    """a crafted XXBLOCK whose child bid is itself must hit the depth
    guard (ValueError), never unbounded recursion."""
    from open_semantic_etl_spark.operators.pst import _Ndb, _U16, _U32, _U64

    blk = bytes((0x01, 0x02)) + _U16.pack(1) + _U32.pack(100) + _U64.pack(6)
    ndb = object.__new__(_Ndb)
    ndb.data = blk
    ndb.blocks = {6: (0, len(blk))}
    ndb.nodes = {}
    with pytest.raises(ValueError, match="deep"):
        ndb.node_data(6)


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_fuzz_total_function(data):
    """mutated/truncated PSTs either parse or raise a clean error —
    no hangs, no unexpected exception types (the explode UDF catches
    these per row; one poison PST must not kill a task)."""
    base = _two_folder_pst(2)
    b = bytearray(base)
    for _ in range(data.draw(st.integers(0, 8))):
        b[data.draw(st.integers(0, len(b) - 1))] = data.draw(st.integers(0, 255))
    cut = data.draw(st.integers(0, len(b)))
    payload = bytes(b[:cut]) if data.draw(st.booleans()) else bytes(b)
    try:
        members = parse_pst(payload)
        for path, blob in members:
            assert isinstance(path, str) and isinstance(blob, bytes)
            path.encode("utf-8")  # member paths stay Arrow-safe
    except (ValueError, struct.error, IndexError, OverflowError):
        pass


def test_pst_header_injection_sanitized():
    """CR/LF in PST-controlled strings must not inject extra RFC-822
    headers into the synthesized .eml (spoofed From:/Content-Type:)."""
    pst = build_pst(
        [
            (
                "Inbox",
                [
                    {
                        "nid_index": 1001,
                        "subject": "Hi\r\nFrom: spoof@evil.example",
                        "sender": "real@example.org",
                        "to": "team@example.org",
                        "body": "Body.",
                        "date": datetime(2024, 3, 1, tzinfo=timezone.utc),
                    }
                ],
            )
        ]
    )
    members = parse_pst(pst)
    eml = next(payload for name, payload in members if name.endswith("1001") or "/" in name)
    r = parse_eml(eml)
    assert r["ok"], r["err"]
    assert r["message_from_ss"] == ["real@example.org"]
    assert "spoof@evil.example" not in " ".join(r["message_from_ss"])
    assert r["subject_txt"] == "HiFrom: spoof@evil.example"
