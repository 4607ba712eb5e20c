"""Remote object-store end-to-end: the flagship pipeline + checkpoint
resume over a REAL (loopback) S3 server.

Reference parity target: the reference validates S3 folders end-to-end
(lister ``s3_uploader.py:42-61``, per-file loop ``main.py:880-936``).  Here
a moto S3 server runs on localhost; the engine's lister, lineage content
addressing, Ray parquet read tasks (in worker processes, over HTTP), and
checkpoint manifest writes/reads all operate on ``s3://`` URIs.

The union parquet output stays on the local out_dir in these tests:
pyarrow's multipart CompleteMultipartUpload handshake is incompatible with
the moto emulator (not with real S3) — the code path is identical
(``write_parquet(path, filesystem=fs)``), only the fixture is constrained.
"""

from __future__ import annotations

import json
import os

import boto3
import pytest

from ndap_data_validator_ray.pipelines.clip_validation import ClipRunConfig, validate_clips
from ndap_data_validator_ray.sources import fs as vfs
from ndap_data_validator_ray.sources.synthetic import ClipTableSpec, clip_files, write_clips_dataset
from ndap_data_validator_ray.state import checkpoint as ckpt

_PORT = 5123
_BUCKET = "ndap-test"


@pytest.fixture(scope="module")
def s3_clips(tmp_path_factory):
    """Loopback S3 with the synthetic clips table uploaded; yields
    (s3 data URI, local data dir)."""
    moto = pytest.importorskip("moto.server")
    server = moto.ThreadedMotoServer(port=_PORT, verbose=False)
    server.start()
    endpoint = f"http://127.0.0.1:{_PORT}"
    old_env = {k: os.environ.get(k) for k in ("AWS_ENDPOINT_URL", "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY", "AWS_REGION")}
    os.environ.update(
        AWS_ENDPOINT_URL=endpoint, AWS_ACCESS_KEY_ID="test",
        AWS_SECRET_ACCESS_KEY="test", AWS_REGION="us-east-1",
    )
    client = boto3.client("s3", endpoint_url=endpoint)
    client.create_bucket(Bucket=_BUCKET)
    local = str(tmp_path_factory.mktemp("clips_s3_src"))
    write_clips_dataset(local, ClipTableSpec(n_rows=400, n_files=4, hot_dup_copies=10), overwrite=True)
    for name in sorted(os.listdir(local)):
        with open(os.path.join(local, name), "rb") as f:
            client.put_object(Bucket=_BUCKET, Key=f"clips/{name}", Body=f.read())
    yield f"s3://{_BUCKET}/clips", local
    for k, v in old_env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    server.stop()


def test_remote_lister_and_lineage(s3_clips):
    """S4 remote lister: suffix-filtered, sorted; lineage content address is
    storage-independent (same bytes -> same lineage_id on s3 and local)."""
    s3_uri, local = s3_clips
    remote = clip_files(s3_uri)
    local_files = clip_files(local)
    assert [vfs.basename(p) for p in remote] == [vfs.basename(p) for p in local_files]
    assert all(p.startswith("s3://") for p in remote)
    assert ckpt.lineage_id_for(remote[:2]) == ckpt.lineage_id_for(local_files[:2])


def test_remote_flagship_matches_local(s3_clips, tmp_path):
    """Full constraint suite over s3:// input with s3:// checkpoint
    manifests — identical verdict to the local-path run."""
    s3_uri, local = s3_clips
    remote_report = validate_clips(
        s3_uri,
        ClipRunConfig(
            out_dir=str(tmp_path / "remote_run"), run_id="S3",
            ckpt_dir=f"s3://{_BUCKET}/ckpt-a", audio_concurrency=2, resume=False,
        ),
    )
    local_report = validate_clips(
        local,
        ClipRunConfig(out_dir=str(tmp_path / "local_run"), run_id="LOCAL", audio_concurrency=2, resume=False),
    )
    assert remote_report["violation_counts"] == local_report["violation_counts"]
    assert remote_report["passed"] == local_report["passed"]
    assert remote_report["per_column"] == local_report["per_column"]
    # manifests really live in the object store
    listed = vfs.list_files(f"s3://{_BUCKET}/ckpt-a")
    assert len(listed) == 4 and all(p.startswith("s3://") for p in listed)
    # report.json written through the same URI-capable writer locally
    rep = json.loads(vfs.read_bytes(str(tmp_path / "remote_run" / "run-S3" / "report.json")))
    assert rep["violation_counts"] == remote_report["violation_counts"]


def test_remote_checkpoint_resume(s3_clips, tmp_path):
    """Resume semantics over the object store: second run resumes every
    partition; deleting one manifest re-validates exactly that partition,
    and the merged verdict never double-counts."""
    s3_uri, _ = s3_clips
    ckpt_uri = f"s3://{_BUCKET}/ckpt-resume"

    def run(run_id):
        return validate_clips(
            s3_uri,
            ClipRunConfig(
                out_dir=str(tmp_path / run_id), run_id=run_id,
                ckpt_dir=ckpt_uri, audio_concurrency=2, resume=True,
            ),
        )

    first = run("R1")
    assert first["partitions"]["validated_this_run"] == [0, 1, 2, 3]
    second = run("R2")
    assert second["partitions"]["resumed_from_checkpoint"] == [0, 1, 2, 3]
    assert second["partitions"]["validated_this_run"] == []
    assert second["violation_counts"] == first["violation_counts"]
    # knock out one manifest in S3 -> only that partition re-runs
    vfs.delete_file(ckpt.manifest_path(ckpt_uri, 2))
    third = run("R3")
    assert third["partitions"]["resumed_from_checkpoint"] == [0, 1, 3]
    assert third["partitions"]["validated_this_run"] == [2]
    assert third["violation_counts"] == first["violation_counts"]


def test_remote_ivf_index_query(s3_clips, tmp_path):
    """Persisted IVF index queried over s3:// (ADVICE round-4: index paths
    route through sources/fs.py): build locally, mirror the files into the
    object store, and the s3 query must return the exact local result while
    still reading a strict probe-cell subset.  (The BUILD over moto is
    blocked by pyarrow's multipart writer — same caveat as the union sink;
    the code path is identical on real S3.)"""
    import numpy as np
    import ray.data

    from ndap_data_validator_ray.stages.similarity import ivf_build_index, ivf_query_index

    s3_uri, _ = s3_clips  # reuses the module moto server + env
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 8))
    import pandas as pd

    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64), "embedding": [list(v) for v in mat]})
    )
    local_idx = str(tmp_path / "ivf")
    ivf_build_index(ds, local_idx, n_clusters=4, train_sample=128)

    client = boto3.client("s3", endpoint_url=os.environ["AWS_ENDPOINT_URL"])
    for root, _dirs, files in os.walk(local_idx):
        for name in files:
            p = os.path.join(root, name)
            key = "ivf/" + os.path.relpath(p, local_idx).replace(os.sep, "/")
            with open(p, "rb") as f:
                client.put_object(Bucket=_BUCKET, Key=key, Body=f.read())

    qids = np.arange(3)
    qmat = mat[:3]
    local_res, local_pruned = ivf_query_index(local_idx, qids, qmat, k=5, nprobe=2)
    s3_res, s3_pruned = ivf_query_index(f"s3://{_BUCKET}/ivf", qids, qmat, k=5, nprobe=2)
    pd.testing.assert_frame_equal(local_res, s3_res)
    # strict pruning holds on the remote read too
    assert 0 < len(s3_pruned.input_files()) < len(local_pruned.input_files()) + 5


def test_remote_curation_resume(s3_clips, tmp_path):
    """Curation checkpoint/resume with an s3:// output dir: survivors,
    manifests and the summary all live in the object store; deleting one
    bucket manifest re-runs exactly that bucket with identical funnel
    counts (single-PUT writes — no multipart, so moto-compatible)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ndap_data_validator_ray.pipelines.curation import curate_documents
    from ndap_data_validator_ray.state import checkpoint as ckpt

    local = str(tmp_path / "docs")
    import os

    os.makedirs(local)
    rows = [
        f"document {i} " + " ".join(f"alpha{i} beta{j} gamma{i+j}" for j in range(15))
        if i % 5 else "short text"
        for i in range(120)
    ]
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": rows}),
            preserve_index=False,
        ),
        local + "/a.parquet",
    )
    out = f"s3://{_BUCKET}/curate-out"
    s1 = curate_documents(local, out, n_buckets=8)
    assert s1["input_docs"] == 120 and s1["buckets_resumed"] == 0
    # knock out one manifest in S3 -> only that bucket re-runs
    pid = sorted(
        int(vfs.basename(p).split("-")[1].split(".")[0])
        for p in vfs.list_files(f"{out}/checkpoints")
        if vfs.basename(p).startswith("partition-")
    )[0]
    vfs.delete_file(ckpt.manifest_path(f"{out}/checkpoints", pid))
    s2 = curate_documents(local, out, n_buckets=8)
    assert s2["buckets_validated_this_run"] == 1
    for k in ("input_docs", "quality_kept", "dedup_kept", "final_kept"):
        assert s2[k] == s1[k], k
    assert vfs.exists(f"{out}/curation_summary.json")
