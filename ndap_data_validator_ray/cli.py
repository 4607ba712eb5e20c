"""CLI entry points — the ``ray job submit`` surface of the engine.

    python -m ndap_data_validator_ray.cli synth    --out DIR --rows N [...]
    python -m ndap_data_validator_ray.cli validate --data DIR --out DIR [...]
    python -m ndap_data_validator_ray.cli baseline --data DIR --out FILE
    python -m ndap_data_validator_ray.cli query    NAME --sf-dir DIR [--out F]

On a real cluster each subcommand is launched with
``ray job submit -- python -m ndap_data_validator_ray.cli ...`` and
connects to the running cluster; standalone it initializes a local
session (guarded — the module never double-inits)."""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus is not None:
            kwargs["num_cpus"] = num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ndap_data_validator_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth", help="write a deterministic synthetic clips table")
    sp.add_argument("--out", required=True)
    sp.add_argument("--rows", type=int, default=10000)
    sp.add_argument("--files", type=int, default=16)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--dur-lo", type=int, default=200)
    sp.add_argument("--dur-hi", type=int, default=2000)
    sp.add_argument("--clean", action="store_true", help="no injected violations")
    sp.add_argument("--hot-dups", type=int, default=0)
    sp.add_argument("--num-cpus", type=int, default=None)

    vp = sub.add_parser("validate", help="run the full clip constraint suite")
    vp.add_argument("--data", required=True)
    vp.add_argument("--out", required=True)
    vp.add_argument("--run-id", default="RUN-cli")
    vp.add_argument("--batch-size", type=int, default=512)
    vp.add_argument(
        "--audio-concurrency", type=int, default=None,
        help="FIXED decode pool size (clamped to CPUs-2 so the pool can never "
             "starve the read stage); default: (1, 4) autoscaling pool",
    )
    vp.add_argument("--no-full-decode", action="store_true")
    vp.add_argument("--no-resume", action="store_true")
    vp.add_argument("--no-unique", action="store_true")
    vp.add_argument("--baseline", default=None)
    vp.add_argument("--num-cpus", type=int, default=None)

    bp = sub.add_parser("baseline", help="write a drift baseline from a clean run")
    bp.add_argument("--data", required=True)
    bp.add_argument("--out", required=True)
    bp.add_argument("--num-cpus", type=int, default=None)

    qp = sub.add_parser("query", help="run a registry query over a tables directory")
    qp.add_argument("name", nargs="?", default=None,
                    help="query name (omit with --list to enumerate)")
    qp.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01"),
                    help="directory of {region,nation,...}.parquet tables")
    qp.add_argument("--out", default=None, help="write result parquet here instead of stdout")
    qp.add_argument("--limit", type=int, default=20, help="stdout preview rows")
    qp.add_argument("--list", action="store_true", help="list available queries")
    qp.add_argument("--num-cpus", type=int, default=None)

    cp = sub.add_parser("curate", help="quality-filter + dedup + decontaminate a documents table")
    cp.add_argument("--data", required=True, help="parquet file/dir with (doc_id, text, ...)")
    cp.add_argument("--out", required=True, help="output dir: kept/ parquet + curation_summary.json")
    cp.add_argument("--bench", default=None, help="parquet of benchmark docs to decontaminate against")
    cp.add_argument("--min-tokens", type=int, default=20)
    cp.add_argument("--max-top-frac", type=float, default=0.13)
    cp.add_argument("--prefix-len", type=int, default=40)
    cp.add_argument("--run-id", default="curate", help="recorded in bucket manifests")
    cp.add_argument("--no-resume", action="store_true",
                    help="redo every bucket even if matching manifests exist")
    cp.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "query" and (args.list or args.name is None):
        # metadata-only: the registry import needs no Ray session, so don't
        # pay multi-second Ray startup just to print names
        from ndap_data_validator_ray.pipelines.queries import REGISTRY

        for name, (_fn, sql) in sorted(REGISTRY.items()):
            print(f"{name}\t{'oracle' if sql else 'rows-only'}")
        return 0

    _ensure_ray(getattr(args, "num_cpus", None))

    if args.cmd in ("validate", "baseline") and not os.path.isdir(args.data):
        print(f"error: --data directory not found: {args.data}", file=sys.stderr)
        return 2

    if args.cmd == "synth":
        from ndap_data_validator_ray.sources.synthetic import ClipTableSpec, write_clips_dataset

        spec = ClipTableSpec(
            n_rows=args.rows, n_files=args.files, seed=args.seed,
            dur_ms_lo=args.dur_lo, dur_ms_hi=args.dur_hi,
            inject_violations=not args.clean, hot_dup_copies=args.hot_dups,
        )
        g = write_clips_dataset(args.out, spec)
        print(json.dumps({"rows": g.n_rows, "out": args.out}))
    elif args.cmd == "validate":
        from ndap_data_validator_ray.pipelines.clip_validation import ClipRunConfig, validate_clips

        conc = args.audio_concurrency
        if conc is not None:
            # a FIXED pool equal to the CPU count deadlocks: the read/
            # compact/write stages get no CPU to feed the actors (CLAUDE.md
            # invariant) — clamp explicit pools to leave 2 CPUs free
            import ray as _ray

            n_cpus = int(_ray.cluster_resources().get("CPU", 0))
            if n_cpus:
                conc = max(1, min(conc, n_cpus - 2))
        else:
            conc = ClipRunConfig.audio_concurrency  # (min, max) autoscaling default
        cfg = ClipRunConfig(
            out_dir=args.out, run_id=args.run_id, batch_size=args.batch_size,
            audio_concurrency=conc, full_decode=not args.no_full_decode,
            resume=not args.no_resume, check_unique=not args.no_unique, baseline_path=args.baseline,
        )
        report = validate_clips(args.data, cfg)
        print(json.dumps({k: report[k] for k in ("passed", "rows", "failed_columns", "violation_counts")}, default=str))
    elif args.cmd == "baseline":
        from ndap_data_validator_ray.pipelines.clip_validation import save_clean_baseline

        save_clean_baseline(args.data, args.out)
        print(json.dumps({"baseline": args.out}))
    elif args.cmd == "curate":
        from ndap_data_validator_ray.pipelines.curation import curate_documents

        if not os.path.exists(args.data):
            print(f"error: --data path not found: {args.data}", file=sys.stderr)
            return 2
        summary = curate_documents(
            args.data, args.out, bench_path=args.bench,
            min_tokens=args.min_tokens, max_top_frac=args.max_top_frac,
            prefix_len=args.prefix_len, run_id=args.run_id,
            resume=not args.no_resume,
        )
        print(json.dumps(summary))
    elif args.cmd == "query":
        from ndap_data_validator_ray.pipelines.queries import REGISTRY

        if args.name not in REGISTRY:
            print(f"error: unknown query {args.name!r} (see --list)", file=sys.stderr)
            return 2
        fn, _sql = REGISTRY[args.name]
        result = fn(args.sf_dir)
        import pandas as pd
        import pyarrow as pa

        if isinstance(result, pa.Table):
            result = result.to_pandas()
        elif not isinstance(result, pd.DataFrame):  # a Dataset
            result = result.to_pandas()
        if args.out:
            result.to_parquet(args.out, index=False)
            print(json.dumps({"query": args.name, "rows": int(len(result)), "out": args.out}))
        else:
            print(json.dumps({"query": args.name, "rows": int(len(result)),
                              "columns": list(map(str, result.columns))}))
            with pd.option_context("display.width", 200, "display.max_columns", 50):
                print(result.head(args.limit).to_string(index=False))

    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
