"""CLI entry point: the ray-job-submit surface of the engine.

    python -m ocr_ray.cli extract --input DIR --out DIR [--num-parts P]
        [--no-resume] [--engine stub] [--lang por] [--exploded]
    python -m ocr_ray.cli synth --rows N --out DIR
    python -m ocr_ray.cli stats --out DIR

On a real cluster the same command runs under ``ray job submit --
python -m ocr_ray.cli extract ...`` — the pipeline only talks to Ray Data,
so cluster vs local is a ray.init concern. This script OWNS its Ray session
(the driver-facing ``__ray_entry__`` must not).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ocr_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ext = sub.add_parser("extract", help="run the flagship extraction pipeline")
    p_ext.add_argument("--input", required=True)
    p_ext.add_argument("--out", required=True)
    p_ext.add_argument("--num-parts", type=int, default=64)
    p_ext.add_argument("--no-resume", action="store_true")
    p_ext.add_argument("--engine", default="stub")
    p_ext.add_argument("--lang", default="por")
    p_ext.add_argument("--exploded", action="store_true",
                       help="page-level fan-out variant (giant-doc corpora)")
    p_ext.add_argument("--num-cpus", type=int, default=None)

    p_syn = sub.add_parser("synth", help="generate the synthetic pages corpus")
    p_syn.add_argument("--rows", type=int, required=True)
    p_syn.add_argument("--out", required=True)
    p_syn.add_argument("--seed", type=int, default=42)

    p_st = sub.add_parser("stats", help="summarize committed output partitions")
    p_st.add_argument("--out", required=True)

    p_ex = sub.add_parser("export", help="write per-document export files from extraction output")
    p_ex.add_argument("--extract-out", required=True,
                      help="a committed run_extract output dir")
    p_ex.add_argument("--out", required=True)
    p_ex.add_argument("--outputs", default="txt,txt_delimited,csv,xml")

    p_q = sub.add_parser(
        "query", help="run a named operator pipeline over an sf_dir")
    p_q.add_argument("--name", help="queries() entry to run (omit to list)")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_q.add_argument("--out", help="write result to this parquet file")
    p_q.add_argument("--head", type=int, default=10,
                     help="rows to print when --out is not given")
    p_q.add_argument("--num-cpus", type=int, default=None)

    args = parser.parse_args(argv)

    if args.cmd == "synth":
        from ocr_ray.synth import generate_pages_parquet

        generate_pages_parquet(args.out, args.rows, seed=args.seed)
        print(json.dumps({"generated_rows": args.rows, "dir": args.out}))
        return 0

    if args.cmd == "stats":
        from ocr_ray.sinks.parquet_sink import MANIFEST_NAME, committed_parts, partition_dir

        parts = sorted(committed_parts(args.out))
        rows = 0
        errors = 0
        for p in parts:
            with open(os.path.join(partition_dir(args.out, p), MANIFEST_NAME)) as f:
                m = json.load(f)
            rows += m["n_rows"]
            errors += m.get("n_errors", 0)
        print(json.dumps({"parts": len(parts), "rows": rows, "errors": errors}))
        return 0

    if args.cmd == "export":
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False)
        import ray.data

        from ocr_ray.sinks.exports import make_export_writer
        from ocr_ray.sinks.parquet_sink import SHARD_NAME, committed_parts, partition_dir

        shards = [
            os.path.join(partition_dir(args.extract_out, p), SHARD_NAME)
            for p in sorted(committed_parts(args.extract_out))
        ]
        ds = ray.data.read_parquet(shards)
        writer = make_export_writer(args.out, tuple(args.outputs.split(",")))
        acks = ds.map_batches(writer, batch_format="pyarrow").materialize()
        print(json.dumps({"docs": acks.count(),
                          "files": sum(r["n_files"] for r in acks.take_all())}))
        return 0

    if args.cmd == "query":
        # the queries() registry lives in the driver contract module at the
        # repo root; resolve it relative to this package's parent
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import __ray_entry__ as entrymod

        registry = entrymod.queries()
        if not args.name:
            print(json.dumps(sorted(registry)))
            return 0
        if args.name not in registry:
            print(json.dumps({"error": f"unknown query {args.name!r}"}))
            return 2
        import ray

        if not ray.is_initialized():
            kwargs = {"address": "local", "include_dashboard": False}
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
            ray.init(**kwargs)
        try:
            import pandas as pd
            import pyarrow as pa
            import ray.data

            result = registry[args.name](args.sf_dir)
            if isinstance(result, ray.data.Dataset):
                table = pa.Table.from_pylist(result.take_all())
            elif isinstance(result, pa.Table):
                table = result
            else:  # pandas
                table = pa.Table.from_pandas(result, preserve_index=False)
            if args.out:
                import pyarrow.parquet as pq

                pq.write_table(table, args.out)
                print(json.dumps({"query": args.name, "rows": table.num_rows,
                                  "out": args.out}))
            else:
                df = table.slice(0, args.head).to_pandas()
                print(df.to_string(index=False))
                print(json.dumps({"query": args.name, "rows": table.num_rows}))
            return 0
        finally:
            ray.shutdown()

    # extract
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    try:
        from ocr_ray.config import resolve_config
        from ocr_ray.pipelines.metrics import format_metrics, stage_metrics

        config = resolve_config({"engine": args.engine, "lang": [args.lang]})
        if args.exploded:
            from ocr_ray.pipelines.explode_variant import extract_dataset_exploded
            from ocr_ray.pipelines.extract import read_pages, run_sink
            from ocr_ray.sinks.parquet_sink import committed_parts

            done = frozenset() if args.no_resume else committed_parts(args.out)
            ds = extract_dataset_exploded(
                read_pages(args.input), config=config,
                num_parts=args.num_parts, done_parts=done,
            )
            result, stats = run_sink(ds, args.out, input_path=args.input, done=done)
        else:
            from ocr_ray.pipelines.extract import run_extract

            result, stats = run_extract(
                args.input, args.out, config=config,
                num_parts=args.num_parts, resume=not args.no_resume,
            )
        print(format_metrics(stage_metrics(stats)), file=sys.stderr)
        rows = sum(r["n_rows"] for r in result.take_all())
        print(json.dumps({"committed_parts": result.count() if hasattr(result, "count") else len(result), "rows": rows}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
