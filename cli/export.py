"""Freeze a serving configuration into a self-contained AOT artifact.

  python -m cli.export --configs configs/ls_infer.yaml \
      --ckpt avg_model.npz --out ls_server.npz --lanes 128 --block 100

The artifact (StableHLO with the weights baked in, via jax.export) is
loaded on the serving host with `fseend_tpu.serving.aot.AotBlockServer` —
no model code, configs or checkpoints needed there.  Export on the
platform you will serve on (artifacts are platform-bound).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--lanes", type=int, default=128)
    parser.add_argument("--block", type=int, default=100)
    parser.add_argument("--capacity", type=int, default=4096,
                        help="FS only: max frames per stream")
    parser.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    args = parser.parse_args()

    import jax.numpy as jnp

    from cli.infer import load_model
    from fseend_tpu.serving.aot import save_server
    from fseend_tpu.serving.runtime import BlockStreamingServer
    from fseend_tpu.utils.config import load_config

    configs = load_config(args.configs)
    model_cfg, task, params, mstate = load_model(configs, args.ckpt)
    n_slots = configs["data"]["max_speakers"] + 2
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if dt == jnp.bfloat16:
        cast = lambda t: __import__("jax").tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        params, mstate = cast(params), cast(mstate)
    srv = BlockStreamingServer(cfg=model_cfg, params=params,
                               model_state=mstate, n_lanes=args.lanes,
                               n_slots=n_slots, block=args.block,
                               kind=task.model, capacity=args.capacity,
                               dtype=dt)
    save_server(srv, args.out)
    sz = os.path.getsize(args.out) / 1e6
    print(f"exported {task.model} block server (lanes={args.lanes}, "
          f"block={args.block}, {args.dtype}) -> {args.out} ({sz:.1f} MB)")


if __name__ == "__main__":
    main()
