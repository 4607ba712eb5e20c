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


def test_cli_curate_matches_duckdb_funnel(tmp_path):
    import duckdb
    import pandas as pd

    data = "/root/testdata/sf0.001/documents.parquet"
    # benchmark set: every 17th doc, written to its own parquet
    bench_path = str(tmp_path / "bench.parquet")
    docs = pd.read_parquet(data)
    docs[docs["doc_id"] % 17 == 0].to_parquet(bench_path, index=False)

    out_dir = str(tmp_path / "curated")
    r = _run(["curate", "--data", data, "--bench", bench_path,
              "--out", out_dir, "--num-cpus", "4"])

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{data}')")
    want = con.sql("""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
cnt AS (SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY doc_id, term),
agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS mx FROM cnt GROUP BY doc_id),
q AS (SELECT d.doc_id, d.text,
        CASE WHEN COALESCE(n_tokens, 0) >= 20
              AND COALESCE(CAST(mx AS DOUBLE) / n_tokens, 0.0) <= 0.13 THEN 1 ELSE 0 END AS q
      FROM documents d LEFT JOIN agg USING (doc_id)),
ded AS (SELECT doc_id, q, text,
        CASE WHEN q = 1 AND doc_id = MIN(CASE WHEN q = 1 THEN doc_id END)
                  OVER (PARTITION BY substr(text, 1, 40)) THEN 1 ELSE 0 END AS d
        FROM q),
allg AS (SELECT doc_id, list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'), x -> x <> '') AS ws FROM documents),
grams AS (SELECT doc_id,
    CASE WHEN len(ws) >= 3
      THEN list_distinct(list_transform(range(1, len(ws) - 1), i -> array_to_string(ws[i:i+2], ' ')))
      WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
      ELSE CAST([] AS VARCHAR[]) END AS g FROM allg),
bgrams AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 17 = 0),
contaminated AS (SELECT DISTINCT c.doc_id
  FROM (SELECT doc_id, unnest(g) AS gram FROM grams) c JOIN bgrams b ON c.gram = b.gram)
SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(q) AS BIGINT) AS q,
       CAST(SUM(q*d) AS BIGINT) AS qd,
       CAST(SUM(q*d*(CASE WHEN ct.doc_id IS NULL THEN 1 ELSE 0 END)) AS BIGINT) AS qdc
FROM ded LEFT JOIN contaminated ct ON ded.doc_id = ct.doc_id
""").df().iloc[0]
    assert r["input_docs"] == int(want["n"])
    assert r["quality_kept"] == int(want["q"])
    assert r["dedup_kept"] == int(want["qd"])
    assert r["final_kept"] == int(want["qdc"])

    # written corpus is readable, has the full schema, and only kept docs
    kept = pd.read_parquet(os.path.join(out_dir, "kept"))
    assert len(kept) == r["final_kept"] > 0
    assert set(docs.columns) <= set(kept.columns)
    assert os.path.isfile(os.path.join(out_dir, "curation_summary.json"))
