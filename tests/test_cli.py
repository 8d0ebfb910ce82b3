"""CLI surface smoke: extract → audit → errors drive the same entry a
spark-submit job uses (O5 error-display limit ≙ reference cli.py:119-123
'Show first 5')."""

from __future__ import annotations

from pdf_extractor_spark.job.main import main


def test_cli_extract_audit_errors(spark, tmp_path, capsys):
    out = str(tmp_path / "run_out")
    rc = main(["--cores", "8", "extract", "--generate", "6",
               "--output", out, "--buckets", "4", "--batches", "2"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "turns=" in captured and "tps=" in captured

    rc = main(["--cores", "8", "audit", "--output", out, "--limit", "10"])
    assert rc == 0
    assert "content_checksum" in capsys.readouterr().out

    rc = main(["--cores", "8", "errors", "--output", out, "--limit", "5"])
    out_text = capsys.readouterr().out
    # the deterministic corpus extracts cleanly → no failing spans; the
    # command's contract is the limit + deterministic ordering either way
    if rc == 0:
        assert "no failing spans" in out_text
    else:
        assert out_text.count("priority=") <= 5
