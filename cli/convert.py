"""Convert a reference PyTorch checkpoint (or an average of several) into a
framework-native .npz checkpoint.

  python -m cli.convert --configs configs/ls_infer.yaml \
      --ckpt epoch1.ckpt epoch2.ckpt --out avg_model.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", required=True)
    parser.add_argument("--ckpt", nargs="+", required=True,
                        help="one or more torch .ckpt files (averaged if several)")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    from cli.train import build_model
    from fseend_tpu.utils import checkpoint as ckpt_lib
    from fseend_tpu.utils import torch_convert as tc
    from fseend_tpu.utils.config import load_config

    configs = load_config(args.configs)
    model_cfg, init_fn, task = build_model(configs)
    sds = [tc.load_torch_ckpt(p) for p in args.ckpt]
    sd = sds[0] if len(sds) == 1 else tc.average_state_dicts(sds)
    if task.model == "ls":
        params, mstate = tc.ls_from_state_dict(sd, model_cfg)
    else:
        params, mstate = tc.fs_from_state_dict(sd, model_cfg)
    ckpt_lib.save_pytree(args.out, {"params": params, "model_state": mstate})
    n = sum(np.asarray(x).size for x in __import__("jax").tree.leaves(params))
    print(f"converted {len(sds)} checkpoint(s) -> {args.out} ({n:,} params)")


if __name__ == "__main__":
    main()
