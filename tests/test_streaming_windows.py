"""Streaming: watermarked windowed aggregation (late-data drop) and the
applyInPandasWithState host-sessionizer.

Driven through real file-source streams across several
restart-from-checkpoint phases because watermark mechanics are
batch-delayed: batch N advances the watermark, batch N+1 emits what it
finalized — exactly the semantics a 100 TB streaming ingest sees.
Sink is the parquet file sink (checkpoint-recoverable, unlike memory).
"""

from __future__ import annotations

from datetime import datetime

EVENTS = "event_type string, ts timestamp, value double"
CRAWL = "url string, ts timestamp"


def _append(spark, path, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _run_phase(spark, schema, src, build, ckpt, out_dir):
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_windowed_event_metrics_drops_late_data(spark, tmp_path):
    from open_semantic_etl_spark.streaming.monitor import windowed_event_metrics

    src, ckpt, out = str(tmp_path / "ev"), str(tmp_path / "ck"), str(tmp_path / "out")
    t = lambda m: datetime(2024, 3, 1, 10, m)

    # phase 1: three rows in the 10:00 window + one at 10:20
    #   → watermark after the batch: 10:10 (nothing emitted yet)
    _append(spark, src, EVENTS, [
        ("view", t(0), 1.0), ("view", t(2), 2.0), ("click", t(4), 3.0),
        ("view", t(20), 5.0),
    ])
    _run_phase(spark, EVENTS, src, windowed_event_metrics, ckpt, out)

    # phase 2: a too-late row for the closed 10:00 window (vs watermark
    # 10:10 → dropped) + a 10:40 row; this batch emits the finalized
    # 10:00 windows and moves the watermark to 10:30
    _append(spark, src, EVENTS, [("view", t(2), 100.0), ("click", t(40), 7.0)])
    _run_phase(spark, EVENTS, src, windowed_event_metrics, ckpt, out)

    # phase 3: push the watermark past 10:45 so the 10:20 window emits
    _append(spark, src, EVENTS, [("view", t(59), 9.0)])
    _run_phase(spark, EVENTS, src, windowed_event_metrics, ckpt, out)

    rows = {
        (r["window"].start.minute, r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    # 10:00 windows finalized WITHOUT the late row (watermark dropped it)
    assert rows[(0, "view")] == (2, 3.0)
    assert rows[(0, "click")] == (1, 3.0)
    # 10:20 window finalized after the watermark passed its end
    assert rows[(20, "view")] == (1, 5.0)


def test_host_sessions_stateful(spark, tmp_path):
    from open_semantic_etl_spark.streaming.sessions import host_sessions

    src, ckpt, out = str(tmp_path / "cr"), str(tmp_path / "ck2"), str(tmp_path / "out2")
    t = lambda m: datetime(2024, 3, 1, 10, m)
    build = lambda s: host_sessions(s, gap="30 minutes", watermark="10 minutes")

    # session A on host-a: 10:00-10:05 (3 pages); host-b singleton 10:01
    _append(spark, src, CRAWL, [
        ("https://host-a.org/1", t(0)), ("https://host-a.org/2", t(3)),
        ("https://host-a.org/3", t(5)), ("https://host-b.org/x", t(1)),
    ])
    _run_phase(spark, CRAWL, src, build, ckpt, out)

    # 12:00 activity jumps the watermark to 11:50 (far past both
    # sessions' last_seen + gap)…
    _append(spark, src, CRAWL, [("https://host-a.org/4", datetime(2024, 3, 1, 12, 0))])
    _run_phase(spark, CRAWL, src, build, ckpt, out)

    # …and the NEXT batch fires their event-time timeouts
    _append(spark, src, CRAWL, [("https://host-c.org/y", datetime(2024, 3, 1, 12, 30))])
    _run_phase(spark, CRAWL, src, build, ckpt, out)

    done = {
        (r["host"], r["session_start"].minute, r["n_pages"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("host-a.org", 0, 3) in done  # 3-page session finalized
    assert ("host-b.org", 1, 1) in done  # singleton finalized by timeout


def test_host_sessions_gap_below_watermark(spark, tmp_path):
    """gap shorter than the watermark delay: a late-but-in-watermark
    batch used to compute a timeout BELOW the current watermark and
    crash the query (IllegalArgumentException); the clamp keeps it
    alive and the session still finalizes."""
    from open_semantic_etl_spark.streaming.sessions import host_sessions

    src, ckpt, out = str(tmp_path / "cr3"), str(tmp_path / "ck3"), str(tmp_path / "out3")
    build = lambda s: host_sessions(s, gap="1 minutes", watermark="10 minutes")

    # batch 1: host-a at 10:00 plus a 10:20 row → watermark 10:10
    _append(spark, src, CRAWL, [
        ("https://host-a.org/1", datetime(2024, 3, 1, 10, 0)),
        ("https://host-z.org/w", datetime(2024, 3, 1, 10, 20)),
    ])
    _run_phase(spark, CRAWL, src, build, ckpt, out)

    # batch 2: a LATE host-a row (10:05, inside the watermark): its
    # last+gap = 10:06 < watermark 10:10 → timeout must clamp upward
    _append(spark, src, CRAWL, [("https://host-a.org/2", datetime(2024, 3, 1, 10, 5))])
    _run_phase(spark, CRAWL, src, build, ckpt, out)

    # batch 3: advance far; fire timeouts
    _append(spark, src, CRAWL, [("https://host-b.org/x", datetime(2024, 3, 1, 12, 0))])
    _run_phase(spark, CRAWL, src, build, ckpt, out)
    _append(spark, src, CRAWL, [("https://host-c.org/y", datetime(2024, 3, 1, 12, 30))])
    _run_phase(spark, CRAWL, src, build, ckpt, out)

    done = {(r["host"], r["n_pages"]) for r in spark.read.parquet(out).collect()}
    # host-a finalized with both rows (1-minute gap split? 10:00 vs
    # 10:05 is > gap → two sessions of 1 page each)
    assert ("host-a.org", 1) in done


def test_stream_dedup_ingest_incremental(spark, tmp_path):
    """two micro-batches through the streaming dedup ingest: batch 2's
    near-dup of an already-indexed doc is dropped, its genuinely new
    doc is kept, and the persisted index grows per epoch — the
    incremental-corpus-dedup flow end to end."""
    from datetime import datetime as _dt

    from open_semantic_etl_spark.streaming.monitor import stream_dedup_ingest

    base = (
        "the quick brown fox jumps over the lazy dog while the silver moon "
        "watches from the old wooden fence near the quiet river bank every "
        "single morning before the sun rises over the green hills"
    )
    other = (
        "completely different text about databases indexes and storage "
        "engines for modern analytics workloads at scale"
    )
    third = (
        "yet another unrelated document discussing climate research models "
        "and long term ocean temperature measurement programs"
    )
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    ts = _dt(2024, 1, 1)
    land = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def row(u, t):
        return (u, ts, None, t, "en")

    import glob as _glob
    import os as _os

    def _stamp(t):
        for f in _glob.glob(land + "/*.parquet"):
            if abs(_os.path.getmtime(f) - 1_000_000_000) > 300:
                _os.utime(f, (t, t))

    # batch 1: two distinct docs + an intra-batch near-dup of base
    _append(spark, land, schema, [
        row("a://1", base), row("a://2", other),
        row("a://3", base.replace("quick", "swift")),
    ])
    _stamp(1_000_000_000)
    # batch 2 (second file → second epoch): near-dup of base + new doc.
    # mtimes pin the file→epoch order — the epoch-overwrite idempotence
    # below holds only when the replay assigns files identically, and
    # FileStreamSource orders by mtime (r4 review)
    _append(spark, land, schema, [
        row("b://1", base.replace("morning", "evening")), row("b://2", third),
    ])
    _stamp(1_000_000_100)
    q = stream_dedup_ingest(spark, land, out, ck)
    q.awaitTermination(120)

    kept = spark.read.parquet(f"{out}/kept")
    urls = {r.url for r in kept.select("url").collect()}
    # a://1 kept, a://3 dropped within batch 1 (url-ordered keep rule);
    # b://1 dropped against the index — regardless of which landing
    # file formed epoch 0, exactly ONE base-variant survives overall
    assert "a://2" in urls and "b://2" in urls
    assert len(urls & {"a://1", "a://3", "b://1"}) == 1
    assert kept.count() == 3

    # the index accumulated exactly the kept docs across epochs
    idx_ids = {r._id for r in spark.read.parquet(f"{out}/lsh_index/sigs").collect()}
    assert idx_ids == urls

    # replay with a fresh checkpoint (same epoch ids): the epoch-dir
    # overwrite keeps the keep-set stable, no double rows
    q2 = stream_dedup_ingest(spark, land, out, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/kept").count() == 3


def test_compact_lsh_index_preserves_probe_results(spark, tmp_path):
    """compaction folds the epoch partitions into the flat bucket
    layout; probes before and after must agree, the epoch column must
    be gone, and file count per table must shrink to ~n_buckets."""
    from open_semantic_etl_spark.operators.dedup import (
        build_lsh_index,
        compact_lsh_index,
        probe_lsh_index,
    )

    texts = {
        10: "the quick brown fox jumps over the lazy dog near the old fence",
        11: "completely different text about storage engines and analytics",
        12: "a third unrelated passage on climate and ocean measurement",
    }
    path = str(tmp_path / "idx")
    for epoch, (i, t) in enumerate(texts.items()):
        df = spark.createDataFrame([(i, t)], "doc_id long, text string")
        build_lsh_index(df, path, epoch=epoch)
    probe = spark.createDataFrame(
        [(99, texts[10].replace("quick", "swift"))], "doc_id long, text string"
    )
    before = sorted(
        (r.index_id, r.probe_id) for r in probe_lsh_index(probe, path).collect()
        if r.matched
    )
    assert before  # the near-dup collides pre-compaction
    compact_lsh_index(spark, path, n_buckets=4)
    bands = spark.read.parquet(f"{path}/bands")
    assert "_epoch" not in bands.columns
    after = sorted(
        (r.index_id, r.probe_id) for r in probe_lsh_index(probe, path).collect()
        if r.matched
    )
    assert after == before


def test_stream_dedup_ingest_collapses_repeated_urls(spark, tmp_path):
    """the same url twice in one landing file (re-crawl) must collapse
    to ONE kept row, not multiply through the novel join (r4 review)."""
    from datetime import datetime as _dt

    from open_semantic_etl_spark.streaming.monitor import stream_dedup_ingest

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    ts = _dt(2024, 1, 1)
    land = str(tmp_path / "landing")
    t = "some unique page text about re-crawled documents and landing files"
    _append(spark, land, schema, [("r://1", ts, None, t, "en"),
                                  ("r://1", ts, None, t, "en")])
    q = stream_dedup_ingest(spark, land, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(120)
    kept = spark.read.parquet(f"{tmp_path}/out/kept")
    assert kept.count() == 1
