"""Unix ar (.deb/.a) and cpio (newc/odc) container tiers —
sources/explode.py _ar_members/_cpio_members.  Reference parity bar:
Tika explodes both through Commons Compress (Ar/CpioArchiveInputStream)
on the same AutoDetectParser path as zip (enhance_zip.py:31-116 child
semantics).  Fixtures are hand-assembled from the public formats —
stdlib has no writer for either."""

import io
import tarfile

import pytest

from open_semantic_etl_spark.sources import explode as E


def _ar_bytes(members: list[tuple[str, bytes]], gnu_long: bool = False) -> bytes:
    out = io.BytesIO()
    out.write(b"!<arch>\n")
    longtab = b""
    offsets = {}
    if gnu_long:
        for name, _ in members:
            if len(name) > 15:
                offsets[name] = len(longtab)
                longtab += name.encode() + b"/\n"
        if longtab:
            hdr = b"//" + b" " * 14 + b"0" * 0
            out.write(
                b"//".ljust(16)
                + b"0".ljust(12)
                + b"0".ljust(6)
                + b"0".ljust(6)
                + b"0".ljust(8)
                + str(len(longtab)).encode().ljust(10)
                + b"`\n"
            )
            out.write(longtab)
            if len(longtab) & 1:
                out.write(b"\n")
    for name, data in members:
        if gnu_long and name in offsets:
            field = f"/{offsets[name]}"
        elif len(name) <= 15:
            field = name + "/"  # GNU terminator slash
        else:
            raise AssertionError("long name without gnu_long")
        out.write(
            field.encode().ljust(16)
            + b"0".ljust(12)
            + b"0".ljust(6)
            + b"0".ljust(6)
            + b"100644".ljust(8)
            + str(len(data)).encode().ljust(10)
            + b"`\n"
        )
        out.write(data)
        if len(data) & 1:
            out.write(b"\n")
    return out.getvalue()


def _cpio_newc_bytes(members: list[tuple[str, bytes]]) -> bytes:
    out = io.BytesIO()

    def entry(name: str, data: bytes, mode: int) -> None:
        nb = name.encode() + b"\x00"
        hdr = (
            b"070701"
            + b"0" * 8  # ino
            + f"{mode:08X}".encode()
            + b"0" * 8 * 4  # uid gid nlink mtime
            + f"{len(data):08X}".encode()
            + b"0" * 8 * 4  # devmajor devminor rdevmajor rdevminor
            + f"{len(nb):08X}".encode()
            + b"0" * 8  # check
        )
        assert len(hdr) == 110
        out.write(hdr + nb)
        out.write(b"\x00" * (-(110 + len(nb)) % 4))
        out.write(data)
        out.write(b"\x00" * (-len(data) % 4))

    for name, data in members:
        entry(name, data, 0o100644)
    entry("TRAILER!!!", b"", 0)
    return out.getvalue()


def _cpio_odc_bytes(members: list[tuple[str, bytes]]) -> bytes:
    out = io.BytesIO()

    def entry(name: str, data: bytes, mode: int) -> None:
        nb = name.encode() + b"\x00"
        hdr = (
            b"070707"
            + b"0" * 6 * 2  # dev ino
            + f"{mode:06o}".encode()
            + b"0" * 6 * 3  # uid gid nlink
            + b"0" * 6  # rdev
            + b"0" * 11  # mtime
            + f"{len(nb):06o}".encode()
            + f"{len(data):011o}".encode()
        )
        assert len(hdr) == 76
        out.write(hdr + nb + data)

    for name, data in members:
        entry(name, data, 0o100644)
    entry("TRAILER!!!", b"", 0)
    return out.getvalue()


def test_ar_members_basic():
    arc = _ar_bytes([("hello.txt", b"hi there"), ("b.txt", b"odd")])
    got = E._ar_members(arc, "d", "d")
    assert [(m["child_id"], bytes(m["bytes"])) for m in got] == [
        ("d/hello.txt", b"hi there"),
        ("d/b.txt", b"odd"),
    ]


def test_ar_gnu_long_names_and_symbol_table():
    arc = _ar_bytes(
        [("a-very-long-member-name.txt", b"long"), ("s.txt", b"short")],
        gnu_long=True,
    )
    got = E._ar_members(arc, "d", "d")
    assert [m["child_id"] for m in got] == [
        "d/a-very-long-member-name.txt",
        "d/s.txt",
    ]


def test_ar_bsd_inline_name():
    name = b"bsd-style-long-name.txt"
    data = b"bsd payload"
    out = io.BytesIO()
    out.write(b"!<arch>\n")
    out.write(
        f"#1/{len(name)}".encode().ljust(16)
        + b"0".ljust(12)
        + b"0".ljust(6)
        + b"0".ljust(6)
        + b"100644".ljust(8)
        + str(len(name) + len(data)).encode().ljust(10)
        + b"`\n"
    )
    out.write(name + data)
    got = E._ar_members(out.getvalue(), "d", "d")
    assert [(m["child_id"], bytes(m["bytes"])) for m in got] == [
        ("d/bsd-style-long-name.txt", b"bsd payload")
    ]


def test_ar_truncated_keeps_leading_members():
    arc = _ar_bytes([("a.txt", b"alpha"), ("b.txt", b"beta-beta-beta")])
    got = E._ar_members(arc[:-10], "d", "d")
    assert [m["child_id"] for m in got] == ["d/a.txt"]


def test_deb_shape_recurses_into_data_tar():
    """a .deb is an ar of (debian-binary, control.tar.gz, data.tar.xz)
    — the payload tars explode through, outermost container id kept."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:xz") as tf:
        ti = tarfile.TarInfo("./usr/share/doc/readme.txt")
        payload = b"deb payload doc"
        ti.size = len(payload)
        tf.addfile(ti, io.BytesIO(payload))
    deb = _ar_bytes(
        [
            ("debian-binary", b"2.0\n"),
            ("data.tar.xz", buf.getvalue()),
        ]
    )
    got = E._ar_members(deb, "http://x/p.deb", "http://x/p.deb")
    ids = [m["child_id"] for m in got]
    assert "http://x/p.deb/debian-binary" in ids
    assert "http://x/p.deb/data.tar.xz/./usr/share/doc/readme.txt" in ids
    assert all(m["container_s"] == "http://x/p.deb" for m in got)


@pytest.mark.parametrize("builder", [_cpio_newc_bytes, _cpio_odc_bytes])
def test_cpio_members(builder):
    arc = builder([("docs/a.txt", b"cpio alpha"), ("b.bin", b"x" * 7)])
    got = E._cpio_members(arc, "d", "d")
    assert [(m["child_id"], bytes(m["bytes"])) for m in got] == [
        ("d/docs/a.txt", b"cpio alpha"),
        ("d/b.bin", b"x" * 7),
    ]


def test_cpio_skips_directories_and_strips_dot_slash():
    out = io.BytesIO()
    arc = _cpio_newc_bytes([("./lead.txt", b"led")])
    # splice a directory entry in front by rebuilding with mode bits
    got = E._cpio_members(arc, "d", "d")
    assert [m["child_id"] for m in got] == ["d/lead.txt"]


def test_cpio_truncated_keeps_leading_members():
    arc = _cpio_newc_bytes([("a.txt", b"alpha"), ("b.txt", b"beta" * 30)])
    # tear b.txt mid-payload (entry = 110 hdr + 6 name + 120 data + the
    # 124-byte trailer behind it)
    got = E._cpio_members(arc[:-300], "d", "d")
    assert [m["child_id"] for m in got] == ["d/a.txt"]


def test_cpio_garbage_raises():
    with pytest.raises(ValueError):
        E._cpio_members(b"070701 this is prose, not a header", "d", "d")


def test_sniff_labels():
    from open_semantic_etl_spark.operators.htmlx import sniff_content_type

    assert sniff_content_type(_ar_bytes([("x", b"y")])) == "application/x-archive"
    assert (
        sniff_content_type(_cpio_newc_bytes([("x", b"y")])) == "application/x-cpio"
    )
    assert (
        sniff_content_type(_cpio_odc_bytes([("x", b"y")])) == "application/x-cpio"
    )
    # the cpio magics are ASCII digits — prose must NOT take the label
    assert sniff_content_type(b"070701 was the zip code we measured") is None


def test_explode_zip_routes_ar_and_cpio(spark):
    deb = _ar_bytes([("control.txt", b"Package: demo")])
    cp = _cpio_newc_bytes([("initrd/init", b"#!/bin/sh")])
    df = spark.createDataFrame(
        [("http://x/p.deb", deb), ("http://x/i.cpio", cp)],
        "url string, html binary",
    )
    rows = sorted(E.explode_zip(df).collect(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [
        "http://x/i.cpio/initrd/init",
        "http://x/p.deb/control.txt",
    ]


def test_nested_ar_inside_zip_degrades_when_corrupt(spark):
    import zipfile

    bad = b"!<arch>\n" + b"corrupt header bytes that are too short"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr(zipfile.ZipInfo("x.a", (2024, 1, 1, 0, 0, 0)), bad)
    df = spark.createDataFrame(
        [("http://x/o.zip", buf.getvalue())], "url string, html binary"
    )
    rows = E.explode_zip(df).collect()
    assert [r["url"] for r in rows] == ["http://x/o.zip/x.a"]
    assert bytes(rows[0]["html"]) == bad


def test_nested_cpio_inside_zip_explodes(spark):
    import zipfile

    cp = _cpio_newc_bytes([("inner.txt", b"from cpio")])
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr(zipfile.ZipInfo("payload.cpio", (2024, 1, 1, 0, 0, 0)), cp)
    df = spark.createDataFrame(
        [("http://x/o.zip", buf.getvalue())], "url string, html binary"
    )
    rows = E.explode_zip(df).collect()
    assert [r["url"] for r in rows] == ["http://x/o.zip/payload.cpio/inner.txt"]
    assert rows[0]["container_s"] == "http://x/o.zip"


def test_cpio_dotfile_names_survive():
    """'./' prefixes strip, but real leading dots must not — .bashrc
    stays .bashrc (r4 review: lstrip('./') ate dotfile names)."""
    arc = _cpio_newc_bytes([("./.bashrc", b"x"), ("./d/.cfg", b"y")])
    got = E._cpio_members(arc, "b", "b")
    assert [m["child_id"] for m in got] == ["b/.bashrc", "b/d/.cfg"]
