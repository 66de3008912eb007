"""BOP evaluation entry point (the reference's run_test.py surface).

Usage:
    python run_test.py --dataset lmo --config configs/base.yaml \
        --checkpoint_path log/picopose/version_0/checkpoints \
        [--view 42] [--hyp 5] [--set key=value ...]

Emits bop19 CSVs (picopose-stage3-<hyp>hyp_<dataset>-test.csv) under
log/<model>/version_<id>/<dataset>_eval/ — score externally with
bop_toolkit, exactly like the reference (SURVEY.md §4).
"""

from __future__ import annotations

import argparse
import os


def get_parser():
    p = argparse.ArgumentParser(description="PicoPose-TPU evaluation")
    p.add_argument("--model", default="picopose")
    p.add_argument("--config", default="configs/base.yaml")
    p.add_argument("--dataset", default="tudl",
                   help="one of the BOP-7 datasets, or 'all'")
    p.add_argument("--checkpoint_path", default="none",
                   help="orbax dir or torch .ckpt/.pth (auto-ported); "
                        "'none' = resolve from the log dir via --iter, or "
                        "random init if no checkpoints exist (smoke runs)")
    p.add_argument("--iter", type=int, default=-1,
                   help="checkpoint step to load from "
                        "log/<model>/version_<id>/checkpoints (reference "
                        "run_test.py --iter semantics); -1 = latest")
    p.add_argument("--version_id", type=int, default=0)
    p.add_argument("--view", type=int, default=-1,
                   help="override template view count (e.g. 42)")
    p.add_argument("--hyp", type=int, default=-1, help="override hypotheses")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--set", nargs="*", default=[], help="config overrides a.b=c")
    return p


def main():
    args = get_parser().parse_args()

    import jax

    if os.environ.get("PICOPOSE_FORCE_CPU"):
        # test/debug hook: this environment's sitecustomize force-selects the
        # TPU platform via jax config, so an env var alone can't override it
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from picopose_tpu.data.bop import BOP7, BOPTestDataset, DETECTION_FILES
    from picopose_tpu.eval.runner import evaluate_dataset
    from picopose_tpu.models import PicoPose
    from picopose_tpu.models.dinov2 import VIT_CONFIGS
    from picopose_tpu.utils.checkpoint import load_any
    from picopose_tpu.utils.config import load_config

    cfg = load_config(args.config, args.set)
    if args.view != -1:
        cfg = load_config(args.config, args.set + [f"test_dataset.n_template_view={args.view}"])
    hyp = args.hyp if args.hyp != -1 else cfg.model.hypothesis

    model = PicoPose(
        vit_type=cfg.model.vit_type,
        blocks_to_take=tuple(cfg.model.blocks_to_take),
        hypotheses=hyp,
        num_levels=cfg.model.num_levels,
        radius=cfg.model.radius,
        compute_dtype=jnp.dtype(cfg.model.compute_dtype),
        quantize_stage3=cfg.model.quantize_stage3,
        fuse_xheads=cfg.model.fuse_xheads,
    )

    log_dir = os.path.join("log", args.model, f"version_{args.version_id}")
    ckpt_path = args.checkpoint_path
    if ckpt_path == "none":
        # reference behavior: resolve by step under the version's log dir
        # (run_test.py:240-245)
        step_dir = os.path.join(log_dir, "checkpoints")
        if os.path.isdir(step_dir) and os.listdir(step_dir):
            step = args.iter if args.iter != -1 else max(
                int(d) for d in os.listdir(step_dir) if d.isdigit()
            )
            ckpt_path = os.path.join(step_dir, str(step))

    if ckpt_path != "none":
        depth = VIT_CONFIGS[cfg.model.vit_type].depth
        print(f"loading checkpoint {ckpt_path}")
        restored = load_any(ckpt_path, depth=depth)
        # a restored TrainState carries params/batch_stats among optimizer
        # state; a ported torch ckpt is already a variables dict
        variables = {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}),
        }
    else:
        print("WARNING: random init (no checkpoint) — smoke run only")
        imgs = jnp.zeros((1, cfg.test_dataset.img_size, cfg.test_dataset.img_size, 3))
        masks = jnp.ones(imgs.shape[:3])
        variables = model.init(jax.random.PRNGKey(0), imgs, masks, True)
    datasets = list(BOP7) if args.dataset == "all" else [args.dataset]
    key = jax.random.PRNGKey(0)
    for name in datasets:
        # BOP-7 names use the CNOS default files (run_test.py:29-37); custom
        # datasets fall back to <detection_dir>/<name>.json
        det_file = DETECTION_FILES.get(name, f"{name}.json")
        det = os.path.join(cfg.test_dataset.detection_dir, det_file)
        ds = BOPTestDataset(
            cfg.test_dataset.data_dir, name, det,
            img_size=cfg.test_dataset.img_size,
            pts_size=cfg.test_dataset.pts_size,
            min_mask_px=cfg.test_dataset.minimum_n_point,
            seg_filter_score=cfg.test_dataset.seg_filter_score,
            n_template_view=cfg.test_dataset.n_template_view,
            rgb_mask_flag=cfg.test_dataset.rgb_mask_flag,
        )
        save_path = os.path.join(
            log_dir, f"{name}_eval",
            f"picopose-stage3-{hyp}hyp_{name}-test.csv",
        )
        out = evaluate_dataset(
            model, variables, ds,
            os.path.join(cfg.test_dataset.template_dir, name),
            save_path, key, hyp=hyp, batch_size=args.batch,
            stage3_topk=cfg.model.stage3_topk,
        )
        print(f"saved {out}")


if __name__ == "__main__":
    main()
