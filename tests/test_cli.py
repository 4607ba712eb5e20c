"""End-to-end CLI test — the ``ray job submit`` surface.

Runs in a SUBPROCESS (own Ray session) because the CLI owns its session
lifecycle (init + shutdown); calling ``cli.main`` in-process would tear
down the suite's shared Ray fixture.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "ndap_data_validator_ray.cli", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_synth_validate_baseline_roundtrip(tmp_path):
    data = str(tmp_path / "data")
    clean = str(tmp_path / "clean")
    runs = str(tmp_path / "runs")
    baseline = str(tmp_path / "baseline.json")

    g = _run(["synth", "--out", data, "--rows", "800", "--files", "4",
              "--hot-dups", "10", "--num-cpus", "4"])
    assert g["rows"] >= 800

    v = _run(["validate", "--data", data, "--out", runs, "--run-id", "T1",
              "--num-cpus", "4"])
    assert v["passed"] is False  # injected violations must fail the suite
    assert v["rows"] == g["rows"]
    assert v["violation_counts"].get("unique", 0) > 0

    _run(["synth", "--out", clean, "--rows", "400", "--files", "2",
          "--clean", "--num-cpus", "4"])
    b = _run(["baseline", "--data", clean, "--out", baseline, "--num-cpus", "4"])
    assert os.path.isfile(b["baseline"])

    v2 = _run(["validate", "--data", clean, "--out", runs, "--run-id", "T2",
               "--baseline", baseline, "--num-cpus", "4"])
    assert v2["passed"] is True  # clean table + its own baseline: no drift


def test_cli_missing_data_dir_fails_cleanly(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "ndap_data_validator_ray.cli", "validate",
         "--data", str(tmp_path / "nope"), "--out", str(tmp_path / "o"),
         "--num-cpus", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 2
    assert "not found" in out.stderr


def test_cli_query_subcommand(tmp_path):
    # --list needs no data
    out = subprocess.run(
        [sys.executable, "-m", "ndap_data_validator_ray.cli", "query", "--list"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == 0
    lines = [l for l in out.stdout.splitlines() if "\t" in l]
    assert any(l.startswith("tpch_q1\toracle") for l in lines)
    assert len(lines) >= 80

    # run one query to parquet
    dest = str(tmp_path / "q.parquet")
    r = _run(["query", "orders_priority_stats", "--sf-dir", "/root/testdata/sf0.001",
              "--out", dest, "--num-cpus", "4"])
    assert r["rows"] > 0 and os.path.isfile(dest)

    # unknown name fails cleanly
    bad = subprocess.run(
        [sys.executable, "-m", "ndap_data_validator_ray.cli", "query", "nope"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert bad.returncode == 2 and "unknown query" in bad.stderr
