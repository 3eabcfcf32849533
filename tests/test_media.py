"""Media metadata tier (operators/media.py).

The reference reaches media files through Tika (enhance_extract_text_
tika_server.py:33-262; its test pins ``content_type_ss ==
'image/jpeg'`` on an image payload).  Builder round-trips alone would
be tautological — the parsers here are additionally pinned on
HAND-ASSEMBLED spec-literal byte strings (big-endian TIFF, ID3v2.2/
2.4/unsync, WEBP VP8/VP8L, AVI, 64-bit mvhd, Opus) that no builder in
the module can emit.
"""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from open_semantic_etl_spark.operators.media import (
    build_bmp,
    build_flac,
    build_gif,
    build_heic,
    build_ico,
    build_jpeg,
    build_mkv,
    build_mp3,
    build_mp4,
    build_ogg_vorbis,
    build_png,
    build_tiff,
    build_wav,
    extract_media,
    sniff_media,
)


# ---------------------------------------------------------------------------
# builder round-trips (one per format, value-parameterized)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("d", [0, 7, 63])
def test_jpeg_roundtrip(d):
    r = extract_media(
        build_jpeg(d + 10, d + 5, description=f"Bild {d}",
                   artist=f"Fotograf {d}", dt=f"2024:03:01 07:30:{d % 60:02d}",
                   comment=f"Kommentar {d}")
    )
    assert r["ok"] and r["content_type"] == "image/jpeg"
    assert (r["width"], r["height"]) == (d + 10, d + 5)
    assert r["author"] == f"Fotograf {d}"
    assert r["description"] == f"Bild {d}"
    assert r["datetime"] == f"2024-03-01T07:30:{d % 60:02d}Z"
    assert r["content"].splitlines()[0] == f"description: Bild {d}"
    assert f"comment: Kommentar {d}" in r["content"]


def test_png_text_chunks():
    r = extract_media(build_png(64, 32, {
        "Title": "PNG 3", "Author": "Autor 3", "Description": "Grüße 3",
    }))
    assert r["ok"] and (r["width"], r["height"]) == (64, 32)
    assert r["title"] == "PNG 3" and r["author"] == "Autor 3"
    # non-latin1 values ride iTXt (utf-8)
    assert r["description"] == "Grüße 3"


def test_gif_comment():
    r = extract_media(build_gif(20, 10, "GIF Kommentar 5"))
    assert r["ok"] and (r["width"], r["height"]) == (20, 10)
    assert r["content"] == "comment: GIF Kommentar 5\nwidth: 20\nheight: 10"


def test_tiff_ifd():
    r = extract_media(build_tiff(30, 40, description="TIFF Bild 2",
                                 artist="Autor 2", dt="2023:12:31 23:59:58"))
    assert r["ok"] and (r["width"], r["height"]) == (30, 40)
    assert r["author"] == "Autor 2"
    assert r["datetime"] == "2023-12-31T23:59:58Z"


def test_bmp_dims():
    r = extract_media(build_bmp(17, 9))
    assert r["ok"] and (r["width"], r["height"]) == (17, 9)
    assert r["content"] == "width: 17\nheight: 9"


def test_mp3_id3v23():
    r = extract_media(build_mp3("Song 4", "Band 4", album="Album 4",
                                year="2019", audio_ms=700))
    assert r["ok"] and r["content_type"] == "audio/mpeg"
    assert r["title"] == "Song 4" and r["author"] == "Band 4"
    assert r["duration_ms"] == 700  # CBR 128 kbps estimate
    assert r["sample_rate"] == 44100 and r["channels"] == 2
    assert "album: Album 4" in r["content"] and "year: 2019" in r["content"]


def test_wav_info_duration():
    r = extract_media(build_wav(2400, rate=8000, channels=2,
                                info={"INAM": "Wave 6", "IART": "Artist 6",
                                      "ICRD": "2024-03-01"}))
    assert r["ok"] and r["title"] == "Wave 6" and r["author"] == "Artist 6"
    assert r["duration_ms"] == 300  # 2400 samples / 8 kHz
    assert r["channels"] == 2 and r["sample_rate"] == 8000
    assert r["datetime"] == "2024-03-01T00:00:00Z"


def test_flac_streaminfo_comments():
    r = extract_media(build_flac(3200, rate=16000, channels=1,
                                 comments={"TITLE": "Flac 8", "ARTIST": "A 8"}))
    assert r["ok"] and r["title"] == "Flac 8" and r["author"] == "A 8"
    assert r["duration_ms"] == 200 and r["sample_rate"] == 16000


def test_mp4_boxes():
    r = extract_media(build_mp4(2500, w=64, h=32,
                                tags={"title": "Clip 9", "author": "Studio 9"}))
    assert r["ok"] and r["content_type"] == "video/mp4"
    assert r["title"] == "Clip 9" and r["author"] == "Studio 9"
    assert r["duration_ms"] == 2500 and (r["width"], r["height"]) == (64, 32)


def test_m4a_brand_is_audio():
    r = extract_media(build_mp4(100, brand=b"M4A "))
    assert r["content_type"] == "audio/mp4"


def test_ogg_vorbis():
    r = extract_media(build_ogg_vorbis(3200, rate=8000, channels=2,
                                       comments={"TITLE": "Ogg 1",
                                                 "ARTIST": "Artist 1"}))
    assert r["ok"] and r["title"] == "Ogg 1" and r["author"] == "Artist 1"
    assert r["duration_ms"] == 400 and r["channels"] == 2


# ---------------------------------------------------------------------------
# hand-assembled spec-literal pins — shapes no builder here can emit
# ---------------------------------------------------------------------------


def test_tiff_big_endian_hand_assembled():
    """MM byte order straight from TIFF 6.0 §2 (builders emit II only)."""
    desc = b"Handgebaut\x00"
    #     header        IFD @8: 3 entries
    ifd = struct.pack(">H", 3)
    ifd += struct.pack(">HHI", 0x0100, 3, 1) + struct.pack(">HH", 321, 0)
    ifd += struct.pack(">HHI", 0x0101, 4, 1) + struct.pack(">I", 123)
    ifd += struct.pack(">HHI", 0x010E, 2, len(desc)) + struct.pack(">I", 8 + 2 + 36 + 4)
    ifd += struct.pack(">I", 0)
    data = b"MM\x00*" + struct.pack(">I", 8) + ifd + desc
    r = extract_media(data)
    assert r["ok"] and (r["width"], r["height"]) == (321, 123)
    assert r["description"] == "Handgebaut"


def test_id3v22_three_byte_frames():
    body = b""
    for fid, text in ((b"TT2", b"Alt Titel"), (b"TP1", b"Alte Band")):
        payload = b"\x00" + text
        body += fid + struct.pack(">I", len(payload))[1:] + payload
    size = len(body)
    tag = b"ID3\x02\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    ) + body
    r = extract_media(tag + b"\xff\xfb\x90\x00" + b"\x00" * 1596)
    assert r["ok"] and r["title"] == "Alt Titel" and r["author"] == "Alte Band"
    assert r["duration_ms"] == 100  # 1600 bytes at 128 kbps


def test_id3v24_syncsafe_and_utf8():
    payload = b"\x03" + "Größe".encode("utf-8")  # enc 3 = utf-8
    frame = b"TIT2" + bytes([0, 0, 0, len(payload)]) + b"\x00\x00" + payload
    size = len(frame)
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, size >> 7, size & 0x7F]) + frame
    r = extract_media(tag)
    assert r["title"] == "Größe"


def test_id3v2_unsynchronized_frame():
    """unsync flag: every 0xFF 0x00 in the tag body collapses to 0xFF."""
    text = b"\x01\xff\xfe" + "Tïtel".encode("utf-16-le")  # utf-16 BOM w/ 0xFF
    stuffed = text.replace(b"\xff", b"\xff\x00")
    frame = b"TIT2" + struct.pack(">I", len(text)) + b"\x00\x00" + stuffed
    size = len(frame)
    tag = b"ID3\x03\x00\x80" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    ) + frame
    r = extract_media(tag)
    assert r["title"] == "Tïtel"


def test_id3v1_tail_only():
    tail = (
        b"TAG" + b"Nur V1".ljust(30, b"\x00") + b"V1 Band".ljust(30, b"\x00")
        + b"V1 Album".ljust(30, b"\x00") + b"1999"
        + b"\x00" * 30 + b"\x00"
    )
    data = b"ID3\x03\x00\x00\x00\x00\x00\x00" + b"\xff\xfb\x90\x00" + b"\x00" * 1596 + tail
    r = extract_media(data)
    assert r["title"] == "Nur V1" and r["author"] == "V1 Band"
    assert r["duration_ms"] == 100  # the 128-byte v1 tail is not audio


def test_webp_vp8_lossy_hand_assembled():
    vp8 = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 99, 77) + b"\x00" * 6
    body = b"WEBP" + b"VP8 " + struct.pack("<I", len(vp8)) + vp8
    r = extract_media(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert r["ok"] and (r["width"], r["height"]) == (99, 77)
    assert r["content_type"] == "image/webp"


def test_webp_vp8l_lossless_hand_assembled():
    bits = (99 - 1) | ((77 - 1) << 14)  # 14-bit w-1, h-1
    vp8l = bytes([0x2F]) + struct.pack("<I", bits)
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l + b"\x00"
    r = extract_media(b"RIFF" + struct.pack("<I", len(body) - 1) + body)
    assert (r["width"], r["height"]) == (99, 77)


def test_avi_hand_assembled():
    avih = struct.pack("<IIII", 40000, 0, 0, 0) + struct.pack("<IIII", 250, 0, 1, 0)
    avih += struct.pack("<II", 320, 240) + b"\x00" * 16
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    r = extract_media(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert r["ok"] and (r["width"], r["height"]) == (320, 240)
    assert r["duration_ms"] == 10000  # 250 frames × 40 ms
    assert r["content_type"] == "video/x-msvideo"


def test_mp4_version1_mvhd():
    mvhd = b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(">I", 600)
    mvhd += struct.pack(">Q", 1800) + b"\x00" * 80
    box = struct.pack(">I", len(mvhd) + 8) + b"mvhd" + mvhd
    moov = struct.pack(">I", len(box) + 8) + b"moov" + box
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom\x00\x00\x00\x00"
    r = extract_media(ftyp + moov)
    assert r["ok"] and r["duration_ms"] == 3000  # 1800 units / 600 Hz


def test_ogg_opus_hand_assembled():
    from open_semantic_etl_spark.operators.media import _ogg_page

    head = b"OpusHead\x01\x02\x00\x00" + struct.pack("<I", 48000) + b"\x00\x00\x00"
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 1)
    tags += struct.pack("<I", 12) + b"TITLE=Opus 1"
    data = (
        _ogg_page(7, 0, 0, [head], htype=2)
        + _ogg_page(7, 1, 0, [tags])
        + _ogg_page(7, 2, 96000, [b"\x00"], htype=4)
    )
    r = extract_media(data)
    assert r["ok"] and r["title"] == "Opus 1"
    assert r["duration_ms"] == 2000  # granule 96000 at the fixed 48 kHz
    assert r["channels"] == 2 and r["sample_rate"] == 48000


def test_png_ztxt_and_compressed_itxt():
    from open_semantic_etl_spark.operators.media import _png_chunk

    ztxt = _png_chunk(b"zTXt", b"Description\x00\x00" + zlib.compress(b"Lang text"))
    itxt = _png_chunk(
        b"iTXt", b"Title\x00\x01\x00de\x00Titel\x00" + zlib.compress("Grüße".encode())
    )
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0))
        + ztxt + itxt
        + _png_chunk(b"IEND", b"")
    )
    r = extract_media(data)
    assert r["description"] == "Lang text" and r["title"] == "Grüße"


def test_png_text_bomb_capped():
    """a zTXt chunk expanding to 10 MiB must come back truncated at
    _TEXT_CAP, never materializing the full expansion."""
    from open_semantic_etl_spark.operators.media import _TEXT_CAP, _png_chunk

    bomb = _png_chunk(
        b"zTXt", b"Description\x00\x00" + zlib.compress(b"x" * (10 << 20))
    )
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0))
        + bomb
        + _png_chunk(b"IEND", b"")
    )
    r = extract_media(data)
    assert r["ok"] and 0 < len(r["description"]) <= _TEXT_CAP


def test_flac_36bit_total_samples():
    data = bytearray(build_flac(100, rate=16000))
    # STREAMINFO body starts at 8; patch total-samples to 2^33 (> u32)
    body = 8
    data[body + 13] = (data[body + 13] & 0xF0) | 0x02
    data[body + 14 : body + 18] = b"\x00\x00\x00\x00"
    r = extract_media(bytes(data))
    assert r["duration_ms"] == (1 << 33) * 1000 // 16000


def test_gif87a_with_image_before_comment():
    data = bytearray(b"GIF87a" + struct.pack("<HH", 3, 4) + b"\x00\x00\x00")
    data += b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
    data += b"\x02\x02\x44\x01\x00"
    data += b"\x21\xfe\x05nachI\x00"
    data += b"\x3b"
    r = extract_media(bytes(data))
    assert r["ok"] and r["content"] == "comment: nachI\nwidth: 3\nheight: 4"


# ---------------------------------------------------------------------------
# sniff gates — printable magics must not claim prose
# ---------------------------------------------------------------------------


def test_heic_avif_ispe_dims():
    r = extract_media(build_heic(640, 480))
    assert r["ok"] and r["content_type"] == "image/heic"
    assert (r["width"], r["height"]) == (640, 480)
    r = extract_media(build_heic(100, 50, brand=b"avif"))
    assert r["ok"] and r["content_type"] == "image/avif"
    assert (r["width"], r["height"]) == (100, 50)


def test_heic_largest_ispe_wins():
    # primary 1024x768 + a 160x120 thumbnail property — largest governs
    import struct as st

    def box(t, b):
        return st.pack(">I", len(b) + 8) + t + b

    ispe_big = box(b"ispe", b"\x00" * 4 + st.pack(">II", 1024, 768))
    ispe_thumb = box(b"ispe", b"\x00" * 4 + st.pack(">II", 160, 120))
    meta = box(b"meta", b"\x00" * 4 + box(b"iprp", box(b"ipco", ispe_thumb + ispe_big)))
    blob = box(b"ftyp", b"heic\x00\x00\x00\x00heicmif1") + meta
    r = extract_media(blob)
    assert (r["width"], r["height"]) == (1024, 768)


def test_ico_largest_entry():
    r = extract_media(build_ico([(16, 16), (48, 48), (32, 32)]))
    assert r["ok"] and r["content_type"] == "image/vnd.microsoft.icon"
    assert (r["width"], r["height"]) == (48, 48)
    # width byte 0 encodes 256
    r = extract_media(build_ico([(256, 256), (16, 16)]))
    assert (r["width"], r["height"]) == (256, 256)


def test_mkv_roundtrip_webm_and_matroska():
    r = extract_media(build_mkv(90_000, w=1920, h=1080, title="Clip",
                                sample_rate=48000, channels=2))
    assert r["ok"] and r["content_type"] == "video/webm"
    assert (r["width"], r["height"]) == (1920, 1080)
    assert r["duration_ms"] == 90_000 and r["title"] == "Clip"
    assert r["sample_rate"] == 48000 and r["channels"] == 2
    r = extract_media(build_mkv(1000, doctype="matroska"))
    assert r["content_type"] == "video/x-matroska"


def test_mkv_hand_assembled_unknown_size_segment():
    """spec-literal webm with an UNKNOWN-size Segment (live-muxed shape,
    RFC 9559 §4.3): 01 FF×7 size extends to end of stream."""
    blob = bytes.fromhex(
        "1a45dfa3" "87"               # EBML header, size 7
        "4282" "84" + b"webm".hex()   # DocType "webm"
        + "18538067" "01ffffffffffffff"  # Segment, UNKNOWN size
        + "1549a966" "8e"             # Info, size 14
        + "2ad7b1" "83" "0f4240"      # TimestampScale 1e6 ns
        + "4489" "84" + struct.pack(">f", 2500.0).hex()  # Duration 2500 ticks
        + "1654ae6b" "8b"             # Tracks, size 11
        + "ae" "89"                   # TrackEntry, size 9
        + "e0" "87"                   # Video, size 7
        + "b0" "82" "01e0"            # PixelWidth 480
        + "ba" "81" "f0"              # PixelHeight 240
    )
    r = extract_media(blob)
    assert r["ok"] and r["content_type"] == "video/webm"
    assert (r["width"], r["height"]) == (480, 240)
    assert r["duration_ms"] == 2500


def test_aiff_comm_and_text_chunks():
    from open_semantic_etl_spark.operators.media import build_aiff

    r = extract_media(build_aiff(16000, rate=16000, channels=2,
                                 name="Tune", author="Someone"))
    assert r["ok"] and r["content_type"] == "audio/aiff"
    assert r["sample_rate"] == 16000 and r["channels"] == 2
    assert r["duration_ms"] == 1000
    assert r["title"] == "Tune" and r["author"] == "Someone"


def test_aiff_hand_assembled_odd_chunk_padding():
    """spec-literal AIFF with an odd-length NAME chunk — the IFF even-
    pad rule must keep the walk aligned (44.1 kHz 80-bit float)."""
    comm = struct.pack(">HIH", 1, 44100, 16) + bytes.fromhex("400E") + \
        struct.pack(">Q", 44100 << (63 - 15))
    name = b"Odd"  # 3 bytes -> 1 pad byte
    blob = (
        b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + 4) + b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"NAME" + struct.pack(">I", 3) + name + b"\x00"
    )
    r = extract_media(blob)
    assert r["ok"] and r["sample_rate"] == 44100 and r["channels"] == 1
    assert r["duration_ms"] == 1000 and r["title"] == "Odd"


def test_asf_wmv_and_wma():
    from open_semantic_etl_spark.operators.media import build_asf

    r = extract_media(build_asf(30_000, w=640, h=360, title="Film",
                                author="Studio", rate=44100, channels=2))
    assert r["ok"] and r["content_type"] == "video/x-ms-asf"
    assert (r["width"], r["height"]) == (640, 360)
    assert r["duration_ms"] == 30_000
    assert r["title"] == "Film" and r["author"] == "Studio"
    assert r["sample_rate"] == 44100 and r["channels"] == 2
    # audio-only refines the label (what .wma files are)
    r = extract_media(build_asf(5000, rate=8000, channels=1, title="Song"))
    assert r["content_type"] == "audio/x-ms-wma"
    assert r["duration_ms"] == 5000 and r["title"] == "Song"


@pytest.mark.parametrize("payload", [
    b"ID3 is a tagging format used by MP3 players everywhere.",
    b"FORM follows function, as architects of AIFF-era software knew.",
    b"fLaC files are lossless; this sentence is not one of them.",
    b"OggSound is a made-up word that should stay text.",
    b"BMW is a car maker, BM alone does not make this a bitmap.",
    b"RIFF through the pages of this book.",
    b"II* wildcard prose\x00 almost a TIFF but not quite",
    b"\x00\x00\x01\x00 looks like an ICO count gate rejects\x00" * 2,
])
def test_sniff_rejects_prose(payload):
    assert sniff_media(payload) is None


def test_sniff_accepts_all_builders():
    cases = [
        (build_jpeg(2, 2), "image/jpeg"), (build_png(2, 2), "image/png"),
        (build_gif(2, 2), "image/gif"), (build_tiff(2, 2), "image/tiff"),
        (build_bmp(2, 2), "image/bmp"), (build_mp3("t", "a"), "audio/mpeg"),
        (build_wav(8), "audio/x-wav"), (build_flac(8), "audio/flac"),
        (build_mp4(10), "video/mp4"), (build_ogg_vorbis(8), "audio/ogg"),
        (build_heic(2, 2), "image/heic"),
        (build_heic(2, 2, brand=b"avif"), "image/avif"),
        (build_ico([(4, 4)]), "image/vnd.microsoft.icon"),
        (build_mkv(10), "video/webm"),
    ]
    from open_semantic_etl_spark.operators.media import build_aiff, build_asf

    cases.append((build_aiff(80), "audio/aiff"))
    cases.append((build_asf(100, w=4, h=4), "video/x-ms-asf"))
    for data, want in cases:
        assert sniff_media(data) == want, want


# ---------------------------------------------------------------------------
# total-function contract — corrupt media never raises
# ---------------------------------------------------------------------------


def test_fuzz_total_function():
    rng = random.Random(0xC0DEC)
    bases = [
        build_jpeg(9, 9, description="d", artist="a", dt="2024:01:01 00:00:00"),
        build_png(9, 9, {"Title": "t"}), build_gif(9, 9, "c"),
        build_tiff(9, 9, "d", "a"), build_bmp(9, 9),
        build_mp3("t", "a", album="b", year="2000"),
        build_wav(80, info={"INAM": "t"}), build_flac(80, comments={"TITLE": "t"}),
        build_mp4(100, w=4, h=4, tags={"title": "t"}),
        build_ogg_vorbis(80, comments={"TITLE": "t"}),
        build_heic(9, 9), build_ico([(16, 16), (256, 256)]),
        build_mkv(500, w=9, h=9, title="t", sample_rate=8000, channels=1),
    ]
    from open_semantic_etl_spark.operators.media import build_aiff, build_asf

    bases.append(build_aiff(80, name="t", author="a"))
    bases.append(build_asf(900, w=9, h=9, title="t", rate=8000, channels=1))
    for i in range(4000):
        base = bases[i % len(bases)]
        buf = bytearray(base[: rng.randrange(1, len(base) + 1)] if i % 2 else base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        r = extract_media(bytes(buf))
        assert r is None or isinstance(r["ok"], bool)
        if r is not None and not r["ok"]:
            assert r["err"]


def test_random_bytes_never_media_ok_false_or_none():
    rng = random.Random(1234)
    for _ in range(500):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
        r = extract_media(blob)
        assert r is None or isinstance(r["ok"], bool)


# ---------------------------------------------------------------------------
# extract_html routing — media payloads resolve through the tier
# ---------------------------------------------------------------------------


def test_extract_html_routes_media():
    from open_semantic_etl_spark.operators.htmlx import extract_html

    r = extract_html(build_jpeg(8, 4, description="Bild X",
                                dt="2024:03:01 07:30:00"))
    assert r["content_type"] == "image/jpeg"
    assert r["description"] == "Bild X"
    assert r["needs_ocr"] is True and r["n_images"] == 1  # enhance_ocr parity
    assert r["meta_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == "2024-03-01T07:30:00Z"
    assert "width: 8" in r["content"]

    r = extract_html(build_mp3("Song", "Band"))
    assert r["content_type"] == "audio/mpeg"
    assert r["title"] == "Song" and r["needs_ocr"] is False

    # corrupt media keeps the sniffed label, per-row error contract
    r = extract_html(b"\xff\xd8\xff\xee" + b"\x00" * 8)
    assert r["content_type"] == "image/jpeg" and r["ok"] is False and r["err"]

    # a media file inside a gzip member resolves transparently
    import gzip as _gzip

    r = extract_html(_gzip.compress(build_png(5, 6, {"Title": "Z"})))
    assert r["content_type"] == "image/png" and r["title"] == "Z"


def test_asf_hand_assembled_spec_literal():
    """[MS-ASF] literal bytes assembled field-by-field from the spec
    tables, NOT via build_asf — a shared writer/reader offset mistake
    cannot hide here (the .Z hand-packed-stream rule)."""
    import struct

    hdr_guid = bytes.fromhex("3026b2758e66cf11a6d900aa0062ce6c")
    fp_guid = bytes.fromhex("a1dcab8c47a9cf118ee400c00c205365")
    cd_guid = bytes.fromhex("3326b2758e66cf11a6d900aa0062ce6c")

    # File Properties: 80-byte body laid out per 2.3.2
    fp_body = (
        b"\x11" * 16                                   # File ID
        + struct.pack("<Q", 4096)                      # File Size
        + struct.pack("<Q", 0)                         # Creation Date
        + struct.pack("<Q", 7)                         # Data Packets Count
        + struct.pack("<Q", 125_000_000)               # Play Duration: 12.5 s
        + struct.pack("<Q", 120_000_000)               # Send Duration
        + struct.pack("<Q", 2_500)                     # Preroll: 2500 ms
        + struct.pack("<I", 0x02)                      # Flags: seekable
        + struct.pack("<I", 100) + struct.pack("<I", 100)
        + struct.pack("<I", 64_000)                    # Maximum Bitrate
    )
    fp = fp_guid + struct.pack("<Q", 24 + len(fp_body)) + fp_body
    title = "Spec Literal".encode("utf-16-le") + b"\x00\x00"
    author = "Author X".encode("utf-16-le") + b"\x00\x00"
    cd_body = struct.pack("<HHHHH", len(title), len(author), 0, 0, 0) + title + author
    cd = cd_guid + struct.pack("<Q", 24 + len(cd_body)) + cd_body
    objs = fp + cd
    data = (hdr_guid + struct.pack("<Q", 30 + len(objs))
            + struct.pack("<I", 2) + b"\x01\x02" + objs)
    r = extract_media(data)
    assert r["ok"]
    # 12.5 s play duration minus 2.5 s preroll = 10 s exactly
    assert r["duration_ms"] == 10_000
    assert r["title"] == "Spec Literal"
    assert r["author"] == "Author X"


def test_asf_broadcast_flag_ignores_duration():
    """[MS-ASF] 2.3.2: Broadcast Flag set -> Play Duration is garbage
    and shall be ignored (r4 review: all-FF parsed to ~58,000 years)."""
    import struct

    from open_semantic_etl_spark.operators.media import build_asf

    data = bytearray(build_asf(30_000, w=320, h=240))
    fp_guid = bytes.fromhex("a1dcab8c47a9cf118ee400c00c205365")
    at = bytes(data).index(fp_guid)
    body = at + 24
    data[body + 40 : body + 48] = b"\xff" * 8  # garbage play duration
    data[body + 64 : body + 68] = struct.pack("<I", 0x03)  # broadcast|seekable
    r = extract_media(bytes(data))
    assert r["ok"]  # video stream still parses
    assert r["width"] == 320
    assert r["duration_ms"] is None  # ignored entirely per spec
