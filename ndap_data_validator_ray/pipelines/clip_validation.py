"""Flagship pipeline: full constraint-suite validation of the audio clip +
transcript table (the BASELINE.json metric: "validated clips/sec").

One streaming pass over the data (read -> attach partition ids ->
actor-pool audio decode -> stateless batch validation -> small union
output), plus one column-pruned pass for the global uniqueness shuffle:

    read_parquet(files, include_paths)            # fragments -> blocks
      .map_batches(attach_partition_id)           # lineage (path -> pid)
      .map_batches(AudioDecodeValidator, concurrency=N, batch_size=B)
      .map_batches(ValidateBatch(schema))         # stats + violations union
      .write_parquet(run_dir)                     # SMALL output (not data)

    read_parquet(files, columns=[key])            # uniqueness: 1 column only
      -> batch partial counts -> groupby(key).sum -> dup keys (tiny)

Verdict logic runs on merged small state at the driver (reference shape,
``validation.py:352-357``); per-partition manifests make the run resumable
(state/checkpoint.py).  Per-file failure becomes a failed-partition record,
not a job abort — matching the reference's per-file fold (``main.py:928-936``).
"""

from __future__ import annotations

import collections
import json
import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

import ray.data

from ndap_data_validator_ray import report as rpt
from ndap_data_validator_ray.report import TableStats
from ndap_data_validator_ray.schema import TableSchema, clips_table_schema
from ndap_data_validator_ray.sources import fs as vfs
from ndap_data_validator_ray.sources.synthetic import clip_files
from ndap_data_validator_ray.stages.audio import AudioDecodeValidator
from ndap_data_validator_ray.stages.dedup import duplicate_keys
from ndap_data_validator_ray.stages.validate import PARTITION_COL, ValidateBatch
from ndap_data_validator_ray.state import baseline as bl
from ndap_data_validator_ray.state import checkpoint as ckpt
from ndap_data_validator_ray.functions.sketches import deserialize


def _warm_lazy_fs_imports() -> None:
    """Make Ray's lazy path-util import race thread-safe.

    ``path_util._is_http_filesystem`` runs ``from fsspec.implementations.
    http import HTTPFileSystem`` on EVERY call (read construction and write
    sink setup both hit it).  Without aiohttp installed that import always
    raises — single-threaded it raises ``ModuleNotFoundError('aiohttp')``,
    which Ray catches; but when two threads race the first import, the
    loser sees a partially initialized module and gets a plain
    ``ImportError`` ("cannot import name HTTPFileSystem"), which Ray does
    NOT catch, killing whichever Dataset was being built.  Wrapping the
    helper to map any ImportError to False (the exact conclusion of the
    single-threaded path: no aiohttp => the filesystem cannot be HTTP)
    makes concurrent Dataset construction safe.  Idempotent."""
    try:
        from ray.data.datasource import path_util as _pu

        orig = _pu._is_http_filesystem
        if getattr(orig, "_ndap_safe", False):
            return

        def _safe_is_http_filesystem(fs):
            try:
                return orig(fs)
            except ImportError:
                return False

        _safe_is_http_filesystem._ndap_safe = True
        _pu._is_http_filesystem = _safe_is_http_filesystem
        # file_datasink/read paths import the symbol through the module, so
        # patching the module attribute covers both call sites
    except Exception:
        pass  # internal layout changed: threads fall back to serial path


def _mark(label: str, t0: float) -> None:
    """Env-gated phase timing (NDAP_TIMING=1) for fixed-cost hunting."""
    if os.environ.get("NDAP_TIMING"):
        import sys, time

        print(f"# t+{time.time() - t0:7.2f}s  {label}", file=sys.stderr, flush=True)


@dataclass
class ClipRunConfig:
    out_dir: str
    run_id: str = "RUN-local"
    files_per_partition: int = 1
    batch_size: int = 512
    # actor-pool size: (min, max) autoscaling by default so the pool can
    # never reserve every CPU and starve the read/write stages (a fixed
    # pool equal to the CPU count deadlocks a small cluster)
    audio_concurrency: Any = (1, 4)
    full_decode: bool = True
    violation_cap: int = 1000
    dur_tolerance_ms: float = 10.0
    resume: bool = True
    # checkpoint manifests location; defaults to <out_dir>/checkpoints.
    # May be a URI (s3://bucket/ckpt) independent of out_dir.
    ckpt_dir: str | None = None
    baseline_path: str | None = None
    drift_ks_threshold: float = 0.15
    check_unique: bool = True
    extra_read_kwargs: dict = field(default_factory=dict)


def _partition_assignment(files: list[str], files_per_partition: int) -> dict[int, list[str]]:
    parts: dict[int, list[str]] = {}
    for i in range(0, len(files), files_per_partition):
        parts[i // files_per_partition] = files[i : i + files_per_partition]
    return parts


def _read_clip_parquet(files: list[str], **kwargs) -> "ray.data.Dataset":
    """read_parquet that accepts local paths or URIs: remote schemes get an
    explicit pyarrow filesystem (built from standard AWS env config) so
    endpoint overrides / credentials reach every Ray read task."""
    if files and vfs.is_uri(files[0]):
        fs, _ = vfs.resolve(files[0])
        return ray.data.read_parquet([vfs.resolve(f)[1] for f in files], filesystem=fs, **kwargs)
    return ray.data.read_parquet(files, **kwargs)


def _attach_partition_id(path_to_pid: dict[str, int]):
    def fn(batch: pa.Table) -> pa.Table:
        # dictionary-encode first: the Python dict lookup runs once per
        # DISTINCT path (~1 per block), not once per row
        enc = batch["path"].combine_chunks().dictionary_encode()
        mapped = np.array([path_to_pid.get(p, -1) for p in enc.dictionary.to_pylist()], dtype=np.int64)
        pids = pa.array(mapped[enc.indices.to_numpy(zero_copy_only=False)], pa.int64())
        return batch.drop_columns(["path"]).append_column(PARTITION_COL, pids)

    return fn


class _DecodeValidateStage:
    """Fused actor stage: audio decode (ST5 stateful pool) + the stateless
    validation kernel in one ``__call__`` — the decoded batch dies inside
    the actor instead of riding the object store to a second stage."""

    def __init__(self, full_decode: bool, validator: ValidateBatch):
        self.decode = AudioDecodeValidator(full_decode=full_decode)
        self.validate = validator

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.validate(self.decode(batch))


# per-worker-process decoder cache for the TASK-mode stage: the same
# init-once-per-process behavior as an actor pool, without reserving CPUs
_TASK_DECODER_CACHE: dict[bool, AudioDecodeValidator] = {}


def _decode_validate_task(batch: pa.Table, *, full_decode: bool, validator: ValidateBatch) -> pa.Table:
    """TASK-mode fused decode+validate (``audio_concurrency=None``).

    An actor pool reserves a fixed CPU split for the whole run; on a
    bounded job that split is never perfectly balanced against the read /
    compact / write stages, so ~10-15% of the pool sits idle across the
    ramp and drain (measured at 16 CPUs / 3M clips).  As a plain task
    stage, Ray fuses read->decode->compact->write into ONE task chain and
    packs every CPU with no partition gaps.  Stateful decoder init stays
    once-per-worker via a process-global cache (the actor-pool path — the
    contract a REAL model-loading decoder with GPU/heap affinity needs —
    remains available and is the default)."""
    dec = _TASK_DECODER_CACHE.get(full_decode)
    if dec is None:
        dec = AudioDecodeValidator(full_decode=full_decode)
        _TASK_DECODER_CACHE[full_decode] = dec
    return validator(dec(batch))


def validate_clips(data_dir: str, cfg: ClipRunConfig, schema: TableSchema | None = None) -> dict[str, Any]:
    """Run the full constraint suite; returns the verdict report dict and
    writes violations + per-partition manifests under ``cfg.out_dir``."""
    import time as _time

    _t0 = _time.time()
    schema = schema or clips_table_schema(drift=cfg.baseline_path is not None)
    files = clip_files(data_dir)
    _mark("listed files", _t0)
    if not files:
        raise FileNotFoundError(f"no clip shards under {data_dir}")
    partitions = _partition_assignment(files, cfg.files_per_partition)
    ckpt_dir = cfg.ckpt_dir or vfs.join(cfg.out_dir, "checkpoints")
    run_dir = vfs.join(cfg.out_dir, f"run-{cfg.run_id}")

    done = ckpt.completed_partitions(ckpt_dir, partitions) if cfg.resume else set()
    pending = {pid: fs for pid, fs in partitions.items() if pid not in done}

    # build the MAIN plan first: the first read_parquet in a process pays
    # Ray's lazy read-path imports + metadata sampling (~2s at 256 shards);
    # doing it up front also makes it safe for the uniqueness thread below
    # to construct ITS Dataset concurrently (sys.modules already warm —
    # parallel first-construction is what races Ray's lazy path-util
    # imports)
    main_ds = None
    if pending:
        try:
            main_ds = _build_validation_plan(pending, cfg, schema)
        except Exception:  # corrupt shard at metadata time: per-partition fallback below
            main_ds = None
    _mark("main plan built", _t0)

    # launch the uniqueness key-scan CONCURRENTLY with the heavy pass: it
    # reads one pruned column and shares the cluster; the streaming
    # executors interleave, so its wall time hides under the decode stage
    uniq_future = None
    if cfg.check_unique:
        import concurrent.futures

        # single-column projection; coalesce small files so the key scan is
        # not dominated by per-task overhead (~256MB of file footprint per
        # read block; only the key column is read)
        total_bytes = sum(vfs.file_size(f) for f in files)
        n_blocks = int(min(len(files), max(8, total_bytes // (256 << 20))))
        # cap the side-scan's CPUs so it cannot starve the decode pool's
        # read feeder during the ramp — it has minutes of slack against the
        # main pass (measured: uncapped it finishes in the first ~20% of
        # the run while the pool sits ~15% idle)
        try:
            n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            n_cpus = 8
        uniq_cpu_cap = max(1, n_cpus // 8)
        _uniq_pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

        def _uniq_scan():
            kds = _read_clip_parquet(files, columns=["clip_id"], override_num_blocks=n_blocks)
            try:
                from ray.data._internal.execution.interfaces import ExecutionResources

                kds.context.execution_options.resource_limits = ExecutionResources(cpu=uniq_cpu_cap)
            except Exception:
                pass  # private API moved: run uncapped rather than fail
            return duplicate_keys(kds, "clip_id")

        if main_ds is not None:
            # overlap Dataset CONSTRUCTION (metadata fetch) with the main
            # pass; a construction error inside the thread surfaces at
            # .result() and takes the healthy-files retry path below
            _warm_lazy_fs_imports()
            uniq_future = _uniq_pool.submit(_uniq_scan)
        else:
            # nothing pending: no main plan warmed the lazy imports, so
            # construct on the main thread and only execute in the worker
            try:
                key_ds = _read_clip_parquet(files, columns=["clip_id"], override_num_blocks=n_blocks)
                uniq_future = _uniq_pool.submit(duplicate_keys, key_ds, "clip_id")
            except Exception:
                uniq_future = None  # corrupt shard: retried over healthy files below
        _mark("uniqueness scan launched", _t0)

    failed_partitions: dict[int, str] = {}
    new_manifests: dict[int, tuple[ckpt.PartitionManifest, TableStats]] = {}
    if pending:
        try:
            if main_ds is None:
                raise RuntimeError("main plan build failed; per-partition fallback")
            new_manifests = _execute_validation_pass(
                main_ds, pending, run_dir, ckpt_dir, cfg, schema, subdir="union", _t0=_t0
            )
        except Exception:
            # a corrupt shard aborts the whole streaming pass; fall back to
            # per-partition execution so every healthy partition completes
            # and only the broken ones are recorded as failed — the
            # reference's per-file semantics (main.py:928-936): a failing
            # file yields a failed record, never a job abort.  Failed
            # partitions get NO manifest, so a later resume retries them.
            for pid, fs in pending.items():
                try:
                    pass_ds = _build_validation_plan({pid: fs}, cfg, schema)
                    new_manifests.update(
                        _execute_validation_pass(
                            pass_ds, {pid: fs}, run_dir, ckpt_dir, cfg, schema, subdir=f"union-p{pid:05d}"
                        )
                    )
                except Exception as exc:  # noqa: BLE001 - recorded, not raised
                    failed_partitions[pid] = f"{type(exc).__name__}: {str(exc)[:200]}"

    _mark("validation pass done", _t0)
    if done or failed_partitions or not pending:
        # resumed/failed partitions: the checkpoint dir is the source of
        # truth for what actually completed (latest-attempt-wins)
        manifests = ckpt.load_manifests(ckpt_dir)
        total = ckpt.merged_stats(manifests)
    else:
        # fresh full run: the manifests just written ARE the disk state —
        # skip re-reading them, and fold the global total from the stats
        # objects already in memory (re-deserializing every digest is pure
        # driver-serial tail cost at high shard count)
        manifests = {pid: m for pid, (m, _s) in new_manifests.items()}
        total = TableStats()
        for pid in sorted(new_manifests):
            total = total.merge(new_manifests[pid][1])
    _mark("manifests merged", _t0)

    dup_tbl = pa.table({"clip_id": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    n_dup_keys = 0
    if cfg.check_unique:
        try:
            if uniq_future is None:
                raise RuntimeError("key scan not started (corrupt shard)")
            dup_tbl = uniq_future.result()
            _mark("uniqueness result ready", _t0)
        except Exception:
            # key scan hit the corrupt shard: retry over healthy files only
            healthy = [
                f for pid, fs in partitions.items() if pid not in failed_partitions for f in fs
            ]
            key_ds = _read_clip_parquet(healthy, columns=["clip_id"])
            dup_tbl = duplicate_keys(key_ds, "clip_id")
        _uniq_pool.shutdown(wait=False)
        n_dup_keys = dup_tbl.num_rows
        import pyarrow.parquet as pq

        vfs.ensure_dir(run_dir)
        _fs, _p = vfs.resolve(vfs.join(run_dir, "unique_violations.parquet"))
        pq.write_table(dup_tbl, _p, filesystem=_fs)

    baseline = bl.load_baseline(cfg.baseline_path) if cfg.baseline_path else None
    report = rpt.finalize_report(
        schema,
        total,
        duplicate_keys=n_dup_keys if cfg.check_unique else None,
        baseline=baseline,
        drift_ks_threshold=cfg.drift_ks_threshold,
    )
    report["run_id"] = cfg.run_id
    report["partitions"] = {
        "total": len(partitions),
        "resumed_from_checkpoint": sorted(done),
        "validated_this_run": sorted(pid for pid in pending if pid not in failed_partitions),
        "failed": {str(pid): msg for pid, msg in sorted(failed_partitions.items())},
    }
    if failed_partitions:
        report["passed"] = False  # per-file fold: any failed file fails the run (main.py:926-936)
    report["violation_counts"] = _violation_counts_from_manifests(manifests)
    if cfg.check_unique:
        report["violation_counts"][rpt.CHECK_UNIQUE] = n_dup_keys

    vfs.ensure_dir(run_dir)
    vfs.write_bytes_atomic(
        vfs.join(run_dir, "report.json"), json.dumps(report, indent=1, default=str).encode()
    )
    return report


def _build_validation_plan(
    pending: dict[int, list[str]],
    cfg: ClipRunConfig,
    schema: TableSchema,
) -> "ray.data.Dataset":
    """Build (lazily) the streaming validation plan over ``pending``."""
    pending_files = [f for fs in pending.values() for f in fs]
    # Ray's include_paths reports scheme-less paths; key the pid map the
    # same way so remote URIs resolve (s3://b/k -> b/k)
    path_to_pid = {vfs.resolve(f)[1]: pid for pid, fs in pending.items() for f in fs}
    ds = _read_clip_parquet(pending_files, include_paths=True, **cfg.extra_read_kwargs)
    ds = ds.map_batches(_attach_partition_id(path_to_pid), batch_format="pyarrow")
    # decode + validation FUSED into one actor stage: an actor (decode)
    # stage and a task (validate) stage cannot be fused by Ray, so split
    # stages would push the full decoded stream (~15GB/1M clips) through
    # the object store a second time just to shrink it to violation/stats
    # rows; fused, the actor emits only the tiny union records and one
    # pool serves both compute bodies (better CPU balance at any size)
    validator = ValidateBatch(
        schema,
        key_column="clip_id",
        violation_cap=cfg.violation_cap,
        dur_tolerance_ms=cfg.dur_tolerance_ms,
    )
    if cfg.audio_concurrency is None:
        # task mode: fully fusable with read + compact + write — every CPU
        # runs the whole chain, no fixed pool split (see _decode_validate_task)
        ds = ds.map_batches(
            _decode_validate_task,
            fn_kwargs={"full_decode": cfg.full_decode, "validator": validator},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            num_cpus=1,
        )
    else:
        ds = ds.map_batches(
            _DecodeValidateStage,
            fn_constructor_kwargs={"full_decode": cfg.full_decode, "validator": validator},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.audio_concurrency,
            num_cpus=1,
        )
    # compact the per-BATCH stats partials to one row per (block,
    # partition) with a STREAMING per-block map — no shuffle, no barrier.
    # Round 3 measured the previous ``groupby(partition_id)`` sort barrier
    # costing 20-30s of post-decode tail at 500+ blocks (the sort cannot
    # start until the last decode block lands); the driver-side manifest
    # fold already groups by partition, so the cluster only needs to bound
    # the blob count: per-block compaction caps it at ~2x block count.
    # 10^12-scale note: at ~10^8 blocks re-introduce a hierarchical fold
    # (bucketed groupby over the compacted rows) before the driver merge.
    ds = ds.map_batches(_merge_partition_stats_group, batch_size=None, batch_format="pandas")
    return ds


def _execute_validation_pass(
    ds: "ray.data.Dataset",
    pending: dict[int, list[str]],
    run_dir: str,
    ckpt_dir: str,
    cfg: ClipRunConfig,
    schema: TableSchema,
    subdir: str,
    _t0: float = 0.0,
) -> dict[int, tuple["ckpt.PartitionManifest", TableStats]]:
    """Execute a built validation plan -> union output + per-partition
    manifests (returned so a fresh run can skip re-reading them)."""
    union_dir = vfs.join(run_dir, subdir)
    # write_parquet appends; a prior attempt that died between its union
    # write and its manifest writes would leave files this read-back fold
    # would double-count on resume — each attempt owns the subdir exclusively
    vfs.delete_dir(union_dir)
    union_fs, union_path = vfs.resolve(union_dir)
    _mark("pass: plan built, starting execution", _t0)
    ds.write_parquet(union_path, filesystem=union_fs)
    _mark("pass: union written", _t0)
    if os.environ.get("NDAP_TIMING"):
        import sys

        print(ds.stats(), file=sys.stderr, flush=True)

    # union output is SMALL (violations + ONE stats row per partition):
    # read it back, fold per partition, write manifests
    union = pads.dataset(union_path, format="parquet", filesystem=union_fs).to_table()
    _mark("pass: union read back", _t0)
    manifests = _write_partition_manifests(union, pending, ckpt_dir, cfg.run_id, schema)
    _mark("pass: manifests written", _t0)
    return manifests


def _merge_partition_stats_group(block: "pd.DataFrame") -> "pd.DataFrame":
    """Per-block compactor: violations pass through; stats blobs fold into
    one blob per partition present in the block (deterministic bytewise
    merge order).  Commutative/associative, so block boundaries and task
    order cannot change the final manifest fold."""
    import pandas as pd

    from ndap_data_validator_ray.functions.sketches import serialize

    stats_mask = block["record_type"] == "stats"
    if int(stats_mask.sum()) <= 1:
        return block
    merged_rows = []
    for pid, g in block.loc[stats_mask].groupby("partition_id", sort=True):
        blobs = sorted(g["stats_blob"].tolist())
        if len(blobs) == 1:
            merged_rows.append(g.iloc[:1])
            continue
        total = TableStats()
        for blob in blobs:
            total = total.merge(deserialize(blob))
        row = g.iloc[:1].copy()
        row["rows"] = int(total.rows)
        row["stats_blob"] = [serialize(total)]
        merged_rows.append(row)
    return pd.concat([block.loc[~stats_mask], *merged_rows], ignore_index=True)


def _write_partition_manifests(
    union: pa.Table, pending: dict[int, list[str]], ckpt_dir: str, run_id: str, schema: TableSchema
) -> dict[int, tuple["ckpt.PartitionManifest", TableStats]]:
    # vectorized fold: group the (small) union output once with pandas —
    # never a per-row Python loop over all partitions x rows
    df = union.select(["record_type", "partition_id", "check", "stats_blob"]).to_pandas()
    stats_df = df[df["record_type"] == "stats"]
    viol_df = df[df["record_type"] == "violation"]
    blobs_by_pid = {int(pid): sorted(g["stats_blob"].tolist()) for pid, g in stats_df.groupby("partition_id")}
    vcounts_by_pid = {
        int(pid): g["check"].value_counts().to_dict() for pid, g in viol_df.groupby("partition_id")
    }

    def build_and_write(item: tuple[int, list[str]]) -> tuple[int, tuple["ckpt.PartitionManifest", TableStats]]:
        pid, files = item
        stats = TableStats()
        # deterministic fold: sort stats blobs bytewise so merge order does
        # not depend on task completion order (resume determinism)
        for blob in blobs_by_pid.get(pid, []):
            stats = stats.merge(deserialize(blob))
        vcounts = collections.Counter({k: int(v) for k, v in vcounts_by_pid.get(pid, {}).items()})
        # violation ROWS are capped per batch; exact counts come from stats
        exact = _exact_violation_counts(stats, schema)
        for check, cnt in exact.items():
            vcounts[check] = cnt
        m = ckpt.make_manifest(run_id, pid, files, stats, dict(vcounts))
        ckpt.write_manifest(ckpt_dir, m)
        # return the in-memory stats too so the caller's global fold does
        # not re-deserialize every digest it just encoded
        return pid, (m, stats)

    # each manifest write is tiny but does real I/O (lineage content sample
    # + atomic write); at hundreds of shards the serial loop is ~1s of
    # driver tail, so fan out over threads (writes are independent files)
    import concurrent.futures

    vfs.ensure_dir(ckpt_dir)
    if len(pending) <= 4:
        return dict(build_and_write(it) for it in pending.items())
    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as pool:
        return dict(pool.map(build_and_write, pending.items()))


def _exact_violation_counts(stats: TableStats, schema: TableSchema) -> dict[str, int]:
    """Exact per-check counts from the mergeable stats (violation ROWS are
    capped per batch; these counters are never capped)."""
    out: dict[str, int] = {}
    nn = 0
    num = 0
    tfmt = 0
    for spec in schema.columns:
        cs = stats.columns.get(spec.name)
        if cs is None:
            continue
        flags = schema.role_flags(spec.role)
        not_null_req = flags.get("notNull", False) if spec.not_null is None else spec.not_null
        if not_null_req:
            nn += cs.nulls
        if flags.get("numericOnly"):
            num += max(cs.conversion_errors, 0)
        if spec.role == "Time" and cs.time_hist is not None:
            tfmt += int(cs.time_hist[0])
    if nn:
        out[rpt.CHECK_NOT_NULL] = nn
    if num:
        out[rpt.CHECK_NUMERIC_ONLY] = num
    if tfmt:
        out[rpt.CHECK_TIME_FORMAT] = tfmt
    dom = sum(cs.domain_violations for cs in stats.columns.values())
    rng = sum(cs.range_violations for cs in stats.columns.values())
    emp = sum(cs.empty_strings for cs in stats.columns.values())
    if dom:
        out[rpt.CHECK_DOMAIN] = dom
    if rng:
        out[rpt.CHECK_RANGE] = rng
    if emp:
        out[rpt.CHECK_REFERENTIAL] = emp
    if stats.audio:
        a = stats.audio
        for check, v in (
            (rpt.CHECK_DECODE, a.decode_failures),
            (rpt.CHECK_SR_CONSISTENCY, a.sr_mismatches),
            (rpt.CHECK_DUR_CONSISTENCY, a.dur_mismatches),
            (rpt.CHECK_CODEC_CONSISTENCY, a.codec_mismatches),
            (rpt.CHECK_AUDIO_SILENCE, a.silent_clips),
            (rpt.CHECK_AUDIO_CLIPPING, a.clipped_clips),
        ):
            if v:
                out[check] = v
    return out


def _violation_counts_from_manifests(manifests: dict[int, ckpt.PartitionManifest]) -> dict[str, int]:
    total: collections.Counter = collections.Counter()
    for m in manifests.values():
        total.update(m.violation_counts)
    return dict(total)


def save_clean_baseline(data_dir: str, out_path: str, cfg: ClipRunConfig | None = None) -> None:
    """Produce a drift baseline snapshot (FIXTURES.md F3) from a clean run."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        c = cfg or ClipRunConfig(out_dir=tmp)
        c = ClipRunConfig(**{**c.__dict__, "out_dir": tmp, "baseline_path": None, "check_unique": False, "resume": False})
        validate_clips(data_dir, c)
        manifests = ckpt.load_manifests(os.path.join(tmp, "checkpoints"))
        bl.save_baseline(out_path, ckpt.merged_stats(manifests))
