"""CLI smoke tests — the spark-submit entry surface (M6).

Run in-process via main(argv) against the current test session's
master (subprocess spark-submit would spawn a second JVM per test)."""

from __future__ import annotations

import json
import os

import pytest

from graphblast_spark.cli import main


@pytest.fixture(autouse=True)
def _use_test_master(monkeypatch):
    # cli's get_spark reuses the active session via getOrCreate()
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")


def test_cli_pagerank_fixture(spark, capsys, tmp_path):
    out = str(tmp_path / "pr")
    rc = main(["pr", "--fixture", "chesapeake", "--niter", "5", "--output", out])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["algorithm"] == "pr" and stats["rows_out"] == 39
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    got = spark.read.parquet(out)
    assert abs(sum(r["val"] for r in got.collect()) - 1.0) < 0.1


def test_cli_tc_and_resume_dir(spark, capsys, tmp_path):
    run_dir = str(tmp_path / "run")
    rc = main(["cc", "--fixture", "test_cc", "--run-dir", run_dir,
               "--checkpoint-every", "1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_out"] == 11
    # durable checkpoints + metrics written
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert any(d.startswith("ckpt_") for d in os.listdir(run_dir))

    rc = main(["tc", "--fixture", "test_cc"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["algorithm"] == "tc"
