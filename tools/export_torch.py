"""Export a picopose_tpu checkpoint as a reference-loadable torch .ckpt.

Closes the ecosystem loop: train here on TPU, hand the result back to the
reference codebase (its `Lite.load_from_checkpoint` path, run_test.py:240-245).

Usage:
    python tools/export_torch.py <checkpoint> <out.ckpt> [--depth 24] [--raw]

<checkpoint> is either an orbax checkpoint directory (as written by
train/loop.py, e.g. log/picopose/version_0/checkpoints/40000) or a torch
.ckpt (round-trips through the porter).  --raw writes a bare `Net` state
dict instead of the Lightning {'state_dict': {'network.*'}} wrapper.
Load into the reference with strict=False: dead reference modules
(DPT refinenet1/output convs, ViT mask_token/final norm) are not emitted.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="orbax dir or torch .ckpt")
    ap.add_argument("out", help="output .ckpt path")
    ap.add_argument("--depth", type=int, default=24, help="ViT depth (24 for ViT-L)")
    ap.add_argument("--raw", action="store_true", help="bare state dict, no Lightning wrapper")
    args = ap.parse_args()

    from picopose_tpu.utils.checkpoint import load_any
    from picopose_tpu.utils.torch_export import save_torch_checkpoint

    state = load_any(args.checkpoint, depth=args.depth)
    # orbax checkpoints hold the full TrainState (step, params, batch_stats,
    # opt_state) — as a field-named dict or a plain 4-tuple depending on the
    # orbax version; torch checkpoints come back as a variables dict already
    if isinstance(state, (list, tuple)) and len(state) == 4:
        variables = {"params": state[1], "batch_stats": state[2]}
    elif "params" in state:
        variables = {
            "params": state["params"],
            "batch_stats": state.get("batch_stats", {}),
        }
    else:
        raise SystemExit(f"unrecognized checkpoint structure: {type(state)}")
    save_torch_checkpoint(variables, args.out, lightning=not args.raw)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
