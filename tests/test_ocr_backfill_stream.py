"""OCR two-phase memoization, backfill job, blacklist filter,
multimodal plumbing, and streaming ingestion tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_semantic_etl_spark.functions.filters import blacklist_predicate, gated, stage_gate
from open_semantic_etl_spark.operators import multimodal as MM
from open_semantic_etl_spark.operators.ocr import fake_ocr, run_ocr_phase
from open_semantic_etl_spark.plans.backfill import run_backfill
from open_semantic_etl_spark.plans.checkpoint import Tables, run_incremental
from open_semantic_etl_spark.sources.pages import pages_df


# --- OCR -------------------------------------------------------------------


def _ocr_corpus(spark):
    rows = [
        ("u1", b"<html><body><p>x</p><img src='FAKEIMG:OCRTextOne'><img src='FAKEIMG:OCRTextTwo'></body></html>", True),
        ("u2", b"<html><body><p>y</p><img src='FAKEIMG:OCRTextOne'></body></html>", True),  # shared image -> memo hit
        ("u3", b"<html><body><p>z</p></body></html>", False),
    ]
    return spark.createDataFrame(rows, "url string, html binary, needs_ocr boolean")


def test_ocr_phase_with_memo(spark, tmp_path):
    memo = str(tmp_path / "ocr_memo")
    df = _ocr_corpus(spark)

    out = {r["url"]: r["ocr_t"] for r in run_ocr_phase(spark, df, memo).collect()}
    assert out == {"u1": "OCRTextOne\nOCRTextTwo", "u2": "OCRTextOne"}

    # memo has one row per distinct image
    memo_df = spark.read.parquet(memo)
    assert memo_df.count() == 2

    # second run: all hits come from the memo, engine sees nothing new
    def exploding(b):  # noqa: ANN001
        raise AssertionError("engine called on memoized image")

    from open_semantic_etl_spark.operators import ocr as ocr_mod

    ocr_mod.ENGINES["explode"] = exploding
    try:
        out2 = {r["url"]: r["ocr_t"] for r in run_ocr_phase(spark, df, memo, engine="explode").collect()}
    finally:
        del ocr_mod.ENGINES["explode"]
    assert out2 == out
    assert spark.read.parquet(memo).count() == 2  # no growth


def test_fake_ocr():
    assert fake_ocr(b"FAKEIMG:hello") == "hello"
    assert fake_ocr(b"\x89PNG....") == ""


# --- backfill (etl_enrich semantics) ---------------------------------------


def test_backfill_runs_only_missing(spark, tmp_path):
    root = str(tmp_path / "ds")
    run_incremental(spark, pages_df(spark, 60, partitions=2), root)
    t = Tables(root)

    def add_shout(s, pruned):  # upper-cases titles as the "new stage"
        return pruned.select("url", F.upper(F.col("title_txt")).alias("title_shout"))

    n = run_backfill(spark, root, "shout", add_shout, fields=("title_txt",))
    assert n == 60
    enriched = spark.read.parquet(t.enriched)
    assert "title_shout" in enriched.columns
    got = enriched.filter(F.col("title_shout") != F.upper(F.col("title_txt"))).count()
    assert got == 0

    # second call: stage recorded in checkpoint → nothing to do
    assert run_backfill(spark, root, "shout", add_shout, fields=("title_txt",)) == 0


# --- blacklist filter -------------------------------------------------------


def test_blacklist_predicate(spark):
    df = spark.createDataFrame(
        [("http://spam.example.com/a",), ("http://ok.example.com/b",),
         ("http://ok.example.com/keep.pdf",), ("http://spam.example.com/keep.pdf",)],
        "url string",
    )
    keep = blacklist_predicate(
        F.col("url"),
        blacklist={"prefix": ("http://spam.",)},
        whitelist={"suffix": (".pdf",)},
    )
    kept = {r["url"] for r in df.filter(keep).collect()}
    assert kept == {
        "http://ok.example.com/b",
        "http://ok.example.com/keep.pdf",
        "http://spam.example.com/keep.pdf",  # whitelist overrides
    }


def test_stage_gate(spark):
    df = spark.createDataFrame(
        [("application/pdf", "http://x/a.pdf"), ("text/html", "http://x/b.html")],
        "ct string, url string",
    )
    gate = stage_gate(F.col("ct"), F.col("url"), mimetype_prefixes=("application/pdf",))
    out = df.select("url", gated(gate, F.lit("ran")).alias("v")).collect()
    got = {r["url"]: r["v"] for r in out}
    assert got == {"http://x/a.pdf": "ran", "http://x/b.html": None}


# --- multimodal plumbing -----------------------------------------------------


def test_multimodal(spark):
    rows = [
        ("m1", b"FAKEIMG:8x6:" + bytes(range(48))),
        ("m2", b"\x89PNG real image bytes"),
        ("m3", None),
    ]
    df = spark.createDataFrame(rows, "id string, media binary")
    meta = {r["id"]: r["media_meta"] for r in MM.with_media_meta(df).collect()}
    assert meta["m1"]["ok"] and meta["m1"]["width"] == 8 and meta["m1"]["height"] == 6
    assert not meta["m2"]["ok"] and "codec" in meta["m2"]["err"]
    assert not meta["m3"]["ok"]

    feats = {r["id"]: r["features"] for r in MM.with_media_features(df).collect()}
    assert len(feats["m1"]) == 16 and abs(sum(x * x for x in feats["m1"]) - 1.0) < 1e-5
    assert feats["m2"] is None

    resized = MM.resize_stub(df.filter("id = 'm1'"), w=4, h=4).first()
    assert bytes(resized["media"]).startswith(b"FAKEIMG:4x4:")


# --- streaming ingestion -----------------------------------------------------


def test_stream_enrich(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages_df(spark, 40, partitions=2).write.mode("overwrite").parquet(landing)

    from open_semantic_etl_spark.streaming.monitor import stream_enrich

    q = stream_enrich(spark, landing, out_root, ckpt, trigger_once=True)
    q.awaitTermination(120)
    enriched = spark.read.parquet(os.path.join(out_root, "enriched"))
    assert enriched.count() == 40
    assert enriched.filter(F.col("content_txt") != F.col("text")).count() == 0

    # restart with no new files → no duplicates (checkpointed source)
    q2 = stream_enrich(spark, landing, out_root, ckpt, trigger_once=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out_root, "enriched")).count() == 40


def test_pdf_ocr_per_page(spark, tmp_path):
    """enhance_pdf_ocr semantics over REAL image XObjects: per-page ocr
    text, multi-image pages joined with newline, image-content memo."""
    from open_semantic_etl_spark.operators.ocr import run_pdf_ocr_phase
    from open_semantic_etl_spark.operators.pdfio import build_pdf, pdf_images

    pdf = build_pdf(
        ["Text page one", "Text page two"],
        images=[[b"FAKEIMG:alpha"], [b"FAKEIMG:b1", b"FAKEIMG:b2"]],
    )
    # the extraction is a real PDF parse, not a fixture scan
    assert pdf_images(pdf) == [
        {"page_i": 1, "image": b"FAKEIMG:alpha"},
        {"page_i": 2, "image": b"FAKEIMG:b1"},
        {"page_i": 2, "image": b"FAKEIMG:b2"},
    ]
    docs = spark.createDataFrame([("file:///s/1.pdf", pdf)], "url string, html binary")
    memo = str(tmp_path / "memo")
    out = {(r["url"], r["page_i"]): r["ocr_t"]
           for r in run_pdf_ocr_phase(spark, docs, memo).collect()}
    assert out == {
        ("file:///s/1.pdf", 1): "alpha",
        ("file:///s/1.pdf", 2): "b1\nb2",
    }
    # second run is all memo hits — same result, memo unchanged size
    n_memo = spark.read.parquet(memo).count()
    out2 = {(r["url"], r["page_i"]): r["ocr_t"]
            for r in run_pdf_ocr_phase(spark, docs, memo).collect()}
    assert out2 == out
    assert spark.read.parquet(memo).count() == n_memo


def test_multimodal_frames_and_audio(spark):
    """video frame-sampling explode + audio metadata over the
    deterministic codec formats; real containers degrade through the
    NotImplementedError seam (zero frames / err captured)."""
    import pytest

    from open_semantic_etl_spark.operators.multimodal import (
        decode_video_frames,
        sample_frames,
        with_audio_meta,
    )

    vid = b"FAKEVID:" + b"|".join(b"f%d" % i for i in range(5))
    df = spark.createDataFrame(
        [("v1", vid), ("v2", b"\x00\x00\x01\xbamp4ish")],
        "url string, media binary",
    )
    rows = sample_frames(df, every_k=2).collect()
    got = {(r["url"], r["frame_i"]): bytes(r["frame"]) for r in rows}
    assert got == {("v1", 0): b"f0", ("v1", 2): b"f2", ("v1", 4): b"f4"}
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"not a fake container")

    aud = spark.createDataFrame(
        [("a1", b"FAKEAUD:8000:" + b"s" * 4000), ("a2", b"RIFFwav")],
        "url string, media binary",
    )
    metas = {r["url"]: r["audio_meta"] for r in with_audio_meta(aud).collect()}
    assert metas["a1"]["sample_rate"] == 8000
    assert metas["a1"]["n_samples"] == 4000
    assert metas["a1"]["duration_ms"] == 500
    assert metas["a1"]["ok"] is True
    assert metas["a2"]["ok"] is False and "torchaudio" in metas["a2"]["err"]


def test_tesseract_binding_shells_when_binary_present(tmp_path, monkeypatch):
    """the real-engine binding is wired: with a tesseract executable on
    PATH it shells out (stand-in script proves the subprocess contract:
    argv = <img> stdout -l <lang>, text on stdout); without one it
    raises the documented NotImplementedError."""
    import os
    import stat

    from open_semantic_etl_spark.operators.ocr import tesseract_ocr

    fake = tmp_path / "tesseract"
    fake.write_text(
        '#!/bin/sh\n'
        '[ "$2" = "stdout" ] || exit 2\n'
        '[ "$3" = "-l" ] || exit 2\n'
        'printf "OCR(%s):" "$4"\ncat "$1"\n'
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    assert tesseract_ocr(b"pixels", lang="deu") == "OCR(deu):pixels"

    monkeypatch.setenv("PATH", str(tmp_path / "empty"))
    import pytest

    with pytest.raises(NotImplementedError):
        tesseract_ocr(b"pixels")


def test_tesseract_failure_raises_engine_error(tmp_path, monkeypatch):
    """non-zero engine exit must surface as OcrEngineError (so the memo
    layer can skip it), never as empty text."""
    import os
    import stat

    import pytest

    from open_semantic_etl_spark.operators.ocr import OcrEngineError, tesseract_ocr

    fake = tmp_path / "tesseract"
    fake.write_text('#!/bin/sh\necho "no traineddata" >&2\nexit 1\n')
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    with pytest.raises(OcrEngineError, match="exit 1"):
        tesseract_ocr(b"pixels")


def test_ocr_engine_failure_not_memoized(spark, tmp_path):
    """a transient engine failure must not write an empty memo row —
    the image retries (and succeeds) on the next run."""
    from open_semantic_etl_spark.operators import ocr as ocr_mod
    from open_semantic_etl_spark.operators.ocr import OcrEngineError, fake_ocr

    memo = str(tmp_path / "ocr_memo_fail")
    df = _ocr_corpus(spark)

    def flaky(b):  # noqa: ANN001
        if b == b"FAKEIMG:OCRTextTwo":
            raise OcrEngineError("transient")
        return fake_ocr(b)

    ocr_mod.ENGINES["flaky"] = flaky
    try:
        out = {r["url"]: r["ocr_t"] for r in
               run_ocr_phase(spark, df, memo, engine="flaky").collect()}
        # failed image contributes no text but does not kill the doc
        assert out == {"u1": "OCRTextOne", "u2": "OCRTextOne"}
        # ONLY the success is memoized
        memo_rows = {r["ocr_text"] for r in spark.read.parquet(memo).collect()}
        assert memo_rows == {"OCRTextOne"}
    finally:
        del ocr_mod.ENGINES["flaky"]

    # next run with a healthy engine: the failed image retries
    out2 = {r["url"]: r["ocr_t"] for r in
            run_ocr_phase(spark, df, memo).collect()}
    assert out2 == {"u1": "OCRTextOne\nOCRTextTwo", "u2": "OCRTextOne"}
    assert spark.read.parquet(memo).count() == 2
