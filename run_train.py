"""Training entry point (the reference's run_train.py surface).

Usage:
    python run_train.py --model picopose --config configs/base.yaml \
        --version_id 0 [--resume] [--max_steps N] [--set key=value ...]
"""

from __future__ import annotations

import argparse
import os


def get_parser():
    p = argparse.ArgumentParser(description="PicoPose-TPU training")
    p.add_argument("--model", default="picopose")
    p.add_argument("--config", default="configs/base.yaml")
    p.add_argument("--version_id", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in the log dir")
    p.add_argument("--init_checkpoint", default=None,
                   help="warm-start weights: full PicoPose checkpoint "
                        "(orbax dir / reference .ckpt) or raw DINOv2 "
                        "backbone .pth (the reference's pretrained=True)")
    p.add_argument("--max_steps", type=int, default=None,
                   help="stop early (debug/smoke runs)")
    p.add_argument("--set", nargs="*", default=[], help="config overrides a.b=c")
    return p


def main():
    args = get_parser().parse_args()

    import jax

    if os.environ.get("PICOPOSE_FORCE_CPU"):
        # test/debug hook (same as run_test.py): this environment's
        # sitecustomize force-selects the TPU platform via jax config, so an
        # env var alone can't override it
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from picopose_tpu.models import PicoPose
    from picopose_tpu.train.loop import run_training
    from picopose_tpu.utils.config import load_config

    cfg = load_config(args.config, args.set)
    if args.init_checkpoint:
        cfg.trainer.init_checkpoint = args.init_checkpoint
    model = PicoPose(
        vit_type=cfg.model.vit_type,
        blocks_to_take=tuple(cfg.model.blocks_to_take),
        hypotheses=cfg.model.hypothesis,
        num_levels=cfg.model.num_levels,
        radius=cfg.model.radius,
        compute_dtype=jnp.dtype(cfg.model.compute_dtype),
        remat_vit=cfg.model.remat_vit,
        fuse_xheads=cfg.model.fuse_xheads,
    )
    log_dir = os.path.join("log", args.model, f"version_{args.version_id}")
    os.makedirs(log_dir, exist_ok=True)

    from picopose_tpu.parallel.distributed import initialize, process_info

    initialize()  # no-op single-process; sets up multi-host slices
    print(f"process {process_info()} devices: {jax.devices()}")
    run_training(cfg, model, log_dir, resume=args.resume, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
