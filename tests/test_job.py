"""spark-submit job entrypoint: CLI → resumable run → idempotent rerun."""

from __future__ import annotations

import json
import os

from open_semantic_etl_spark.job import load_gazetteer_tsv, main


def test_load_gazetteer_tsv(tmp_path):
    p = tmp_path / "gaz.tsv"
    # note: taxonomy column itself is |-joined; tabs inside taxonomy paths
    # are not expressible in the TSV, so paths use | level separators too
    p.write_text(
        "urn:stgb\tStrafgesetzbuch\tlaw_code_ss\tStrafgesetzbuch|StGB\tLaw|DE\n"
        "# comment line\n"
        "urn:usd\tUS Dollar\tcurrency_ss\tUSD|dollar|dollars\n",
        encoding="utf-8",
    )
    gz = load_gazetteer_tsv(str(p))
    assert [e.uri for e in gz.entries] == ["urn:stgb", "urn:usd"]
    assert gz.entries[0].labels == ("Strafgesetzbuch", "StGB")
    assert gz.entries[0].taxonomy == ("Law", "DE")
    assert gz.entries[1].taxonomy == ()


def test_job_end_to_end_resume(spark, tmp_path, capsys):
    from open_semantic_etl_spark.sources.pages import pages_df

    pages_path = str(tmp_path / "pages")
    pages_df(spark, 60, partitions=4).write.parquet(pages_path)
    gaz = tmp_path / "gaz.tsv"
    gaz.write_text(
        "urn:stgb\tStrafgesetzbuch\tlaw_code_ss\tStrafgesetzbuch|StGB\n",
        encoding="utf-8",
    )
    root = str(tmp_path / "out")

    # no --master: get_spark joins the test fixture session via
    # getOrCreate (and the job must not stop a session it didn't own)
    argv = ["--input", pages_path, "--root", root, "--gazetteer", str(gaz)]
    stats = main(argv)
    assert stats["processed"] == 60
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["processed"] == 60
    assert os.path.isdir(os.path.join(root, "enriched"))
    assert os.path.isdir(os.path.join(root, "checkpoint"))
    assert os.path.isdir(os.path.join(root, "metrics"))

    # resubmit the same command: checkpoint makes it a no-op (resume)
    stats2 = main(argv)
    assert stats2["processed"] == 0


def test_job_rejects_nonpositive_n_buckets(tmp_path):
    """--n-buckets 0 must fail fast, not silently fall through to the
    default 64 (a mismatched bucket count corrupts the table layout
    contract)."""
    import pytest

    from open_semantic_etl_spark.job import main

    with pytest.raises(SystemExit, match="n-buckets"):
        main([
            "--input", str(tmp_path / "in"),
            "--root", str(tmp_path / "out"),
            "--n-buckets", "0",
        ])
