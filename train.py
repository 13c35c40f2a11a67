#!/usr/bin/env python3
"""GNN training entry — beyond the reference (which reports untrained-model
accuracy, SURVEY.md §5.4): full-graph node-classification training with
cross-entropy, Adam, BatchNorm running-stat updates, checkpointing, and the
``[DATA]`` metric protocol.
"""

import argparse
import time


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="pubmed")
    p.add_argument("--model", type=str, default="gcn",
                   choices=["gcn", "sage", "gin"])
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--sp_parts", type=int, default=1)
    p.add_argument("--ds_parts", type=int, default=1)
    p.add_argument("--backend", type=str, default="ell")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    print(args)

    from pygim_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()  # remote backends: skip repeat XLA compiles

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pygim_tpu.data import load_dataset
    from pygim_tpu.nn.models import make_gnn
    from pygim_tpu.nn.train import make_train_step_threaded
    from pygim_tpu.ops.spmm import SpmmConfig, prepare_spmm
    from pygim_tpu.utils.metrics import data_print

    kw = {} if args.data_root is None else {"root": args.data_root}
    try:
        ds = load_dataset(args.dataset, **kw)
    except KeyError as e:
        raise SystemExit(f"error: {e.args[0]}")
    cfg = SpmmConfig(backend=args.backend)
    n_mesh = args.sp_parts * args.ds_parts
    if n_mesh > 1:
        from pygim_tpu.parallel import make_mesh, prepare_spmm_2d

        prep = prepare_spmm_2d(ds.graph, make_mesh(args.sp_parts, args.ds_parts), cfg)
    else:
        prep = prepare_spmm(ds.graph, cfg)

    model = make_gnn(
        jax.random.key(args.seed), args.model, ds.x.shape[1],
        args.hidden_size, ds.num_classes, num_layers=args.num_layers,
    )
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(model.params)
    # thread the sparse tables through the jit as arguments — safe for
    # large graphs on remote-compile backends; the mesh preps implement
    # the same dev_arrays/raw_mul contract, so multi-chip training uses
    # the identical one-jit step
    threaded, dev = make_train_step_threaded(model, prep, optimizer)
    jit_step = jax.jit(threaded)
    step_fn = lambda p_, o_, x_, y_, m_, r_: jit_step(
        p_, o_, x_, y_, m_, r_, dev
    )

    x = jnp.asarray(ds.x, dtype=jnp.float32)
    labels = jnp.asarray(ds.y.astype(np.int32))
    train_mask = jnp.asarray(ds.train_mask.astype(np.float32))

    from pygim_tpu.nn.models import gnn_apply

    @jax.jit
    def eval_fn(params):
        logits = gnn_apply(
            params, x, prep.mul, conv=model.conv,
            num_layers=model.num_layers, dropout_rate=model.dropout,
            agg_dtype=None, training=False,
        )
        return logits

    params = model.params
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        params, opt_state, loss = step_fn(
            params, opt_state, x, labels, train_mask,
            jax.random.key(args.seed * 100003 + epoch),
        )
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            logits = eval_fn(params)
            test = np.asarray(ds.test_mask)
            pred = np.asarray(jnp.argmax(logits, -1))
            acc = float((pred[test] == ds.y[test]).mean())
            data_print("epoch", epoch)
            data_print("train_loss", float(loss))
            data_print("test_acc", acc)
    data_print("train_time(ms)", (time.perf_counter() - t0) * 1e3)

    if args.checkpoint:
        from pygim_tpu.nn.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, params, step=args.epochs)
        data_print("checkpoint", args.checkpoint)


if __name__ == "__main__":
    main()
