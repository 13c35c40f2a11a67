#!/usr/bin/env python3
"""End-to-end GNN inference entry — CLI-compatible analog of the
reference's ``inference.py`` (flags per inference.py:96-124). AmazonProducts
is cluster-partitioned with ~500k-node parts and partition index 1, like
inference.py:64-73.
"""

import argparse


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="pubmed")
    p.add_argument("--model", type=str, default="gcn",
                   choices=["gcn", "sage", "gin"])
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument(
        "--version", type=str, default="grande",
        choices=["spmm", "grande", "spmv", "cpu"],
    )
    p.add_argument("--sp_format", type=str, default="csr", choices=["csr", "coo"])
    from pygim_tpu.compat import normalize_data_type

    # accepts the reference's tokens too: INT8/INT32/FLT32/DBL64
    p.add_argument("--data_type", type=normalize_data_type, default="int32")
    p.add_argument("--sp_parts", type=int, default=2)
    p.add_argument("--ds_parts", type=int, default=16)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--tune", action="store_true")
    p.add_argument("--data_root", "--datadir", type=str, default=None)
    p.add_argument("--lr", type=float, default=0.01)  # reference parity
    # compatibility no-ops
    p.add_argument("--lib_path", type=str, default=None)
    p.add_argument("--nr_dpus", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    print(args)

    from pygim_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()  # remote backends: skip repeat XLA compiles

    from pygim_tpu.bench.runners import run_inference_benchmark
    from pygim_tpu.compat import prepare_for_version
    from pygim_tpu.data import cluster_partition, load_dataset
    from pygim_tpu.ops.spmm import SpmmConfig

    kw = {} if args.data_root is None else {"root": args.data_root}
    try:
        ds = load_dataset(args.dataset, **kw)
    except KeyError as e:
        raise SystemExit(f"error: {e.args[0]}")
    if args.dataset == "amazonproducts":
        ds = cluster_partition(ds, part_size=500_000, part_idx=1)

    cfg = None
    tuned = None
    agg_dtype = None if args.data_type in ("float32", "float64") \
        else args.data_type
    if args.version == "cpu":
        agg_dtype = None
    else:
        # measured-best default (docs/PERF.md); --tune searches instead
        cfg = SpmmConfig(
            backend="ell", format=args.sp_format,
            hidden_hint=args.hidden_size,
        )
        if args.tune:
            import jax

            from pygim_tpu.tune import autotune

            # the sp×ds budget is the tuner's device budget (capped by
            # availability) — the tuner searches ALL its distribution
            # axes (factorizations + halo exchanges), not just the
            # single-chip config space
            nd = min(
                max(1, args.sp_parts * args.ds_parts), len(jax.devices())
            )
            tuned = autotune(
                ds.graph, args.hidden_size, n_devices=nd,
                layouts=("single", "2d", "halo"),
            )
            cfg = tuned.config
            print(f"[DATA]tuned_plan: {tuned.plan.describe()}")
            print(f"[DATA]tuned_constants: {tuned.constants}")

    def prepare_fn(graph, config):
        if tuned is not None:
            from pygim_tpu.tune import prepare_tuned

            return prepare_tuned(graph, tuned)
        return prepare_for_version(
            args.version, graph, hidden_size=args.hidden_size,
            sp_parts=args.sp_parts, ds_parts=args.ds_parts,
            sp_format=args.sp_format, config=config,
        )

    run_inference_benchmark(
        ds, model=args.model, num_layers=args.num_layers,
        hidden=args.hidden_size, agg_dtype=agg_dtype, config=cfg,
        repeat=args.repeat, prepare_fn=prepare_fn,
    )


if __name__ == "__main__":
    main()
