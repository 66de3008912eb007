"""Closed-loop accuracy proof on synthetic data: train -> eval -> AR.

No external data or checkpoints exist in this environment, so this is the
strongest end-to-end accuracy statement the framework can make about
itself: render a synthetic world with the in-repo rasterizer
(tools/synthetic_world.py), overfit a small PicoPose from scratch on its
training split through the REAL train CLI, evaluate held-out views through
the REAL eval CLI, and score the resulting bop19 CSV against ground truth
with the in-repo scorer.  A trained model must beat the random-init
baseline by a wide AR margin — that closes the loop the reference closes
with bop_toolkit on BOP data (run_test.py:196-220 -> evaluation/bop.py).

    python examples/train_to_ar.py --root /tmp/ar_world --steps 1500

Runs on whatever backend jax selects (TPU if available; CPU works but is
~20x slower).  Writes a JSON summary to <root>/summary.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HYP = 2  # also determines run_test.py's CSV filename (see eval_and_score)
MODEL_ARGS = [
    "model.vit_type=dinov2_vits14",
    "model.blocks_to_take=[2,5,8,11]",
    "model.compute_dtype=float32",
    f"model.hypothesis={HYP}",
]


def run(cmd, log_path, env=None):
    print("+", " ".join(cmd), f"(log: {log_path})")
    full_env = dict(os.environ, **(env or {}))
    with open(log_path, "w") as f:
        rc = subprocess.call(
            cmd, cwd=REPO, stdout=f, stderr=subprocess.STDOUT, env=full_env
        )
    if rc != 0:
        print(open(log_path).read()[-4000:])
        raise SystemExit(f"command failed rc={rc}: {' '.join(cmd)}")


def eval_and_score(root, version, tag, extra_set=(), env=None,
                   paired_vs=None):
    csv_dir = os.path.join(
        REPO, "log", "picopose", f"version_{version}", "fakeds_eval"
    )
    run(
        [sys.executable, "run_test.py", "--dataset", "fakeds",
         "--batch", "4", "--version_id", str(version), "--set",
         f"test_dataset.data_dir={root}/bop",
         f"test_dataset.template_dir={root}/templates",
         f"test_dataset.detection_dir={root}/dets",
         "test_dataset.n_template_view=42",
         *MODEL_ARGS, *extra_set],
        os.path.join(root, f"eval_{tag}.log"),
        env=env,
    )
    # run_test.py names the CSV after the hypothesis count; every arm of
    # one version writes the same path, so keep a per-arm copy (the
    # cross-implementation comparison needs the FAITHFUL arm's CSV after
    # later arms have overwritten the original — tools/cross_impl_ar.py)
    csv = os.path.join(csv_dir, f"picopose-stage3-{HYP}hyp_fakeds-test.csv")
    import shutil

    shutil.copyfile(csv, os.path.join(root, f"csv_{tag}.csv"))
    csv = os.path.join(root, f"csv_{tag}.csv")
    score_log = os.path.join(root, f"score_{tag}.log")
    # every arm dumps its per-GT-instance records; serving-mode arms add a
    # PAIRED bootstrap delta vs the faithful trained arm — all arms score
    # the same instances, so pairing shrinks the delta CI ~10x vs the
    # independent per-arm CIs (docs/PARITY.md "Serving-mode AR deltas")
    score_cmd = [sys.executable, "score_csv.py", "--csv", csv, "--data_dir",
                 f"{root}/bop", "--dataset", "fakeds", "--vsd",
                 "--bootstrap", "2000",
                 "--dump_records", os.path.join(root, f"records_{tag}.pkl")]
    if paired_vs is not None:
        score_cmd += ["--paired_vs", os.path.join(root, f"records_{paired_vs}.pkl")]
    run(score_cmd, score_log)
    # score_csv ends with an indent=2 JSON object; parse from the last
    # line that opens one (the log may or may not have content before it)
    text = open(score_log).read()
    starts = [i for i in range(len(text))
              if text.startswith("{", i) and (i == 0 or text[i - 1] == "\n")]
    return json.loads(text[starts[-1]:])


def _train(args, root, epochs):
    run(
        [sys.executable, "run_train.py", "--version_id", str(args.version),
         "--max_steps", str(args.steps), "--set",
         "trainer.iters_to_print=50",
         f"trainer.training_epoch={epochs}",
         # short synthetic epochs: per-epoch orbax saves would cost ~10 s
         # + 0.7 GB each; eval only needs the final checkpoint
         f"trainer.ckpt_every_epochs={max(1, epochs // 4)}",
         "trainer.n_devices=1",
         f"optimizer.lr={args.lr}",
         "optimizer.betas=[0.9,0.999]",
         f"lr_scheduler.max_iters={args.steps}",
         "lr_scheduler.warmup_iters=100",
         f"train_dataset.data_dir={root}/mp",
         "train_dataset.augment_real=false",
         f"train_dataloader.bs={args.bs}",
         "train_dataloader.num_workers=4",
         *MODEL_ARGS],
        os.path.join(root, "train.log"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ar_world")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--train_views", type=int, default=128)
    ap.add_argument("--test_views", type=int, default=8)
    ap.add_argument("--objects", default="",
                    help="comma list from {lshape,tex,cube} for the world "
                         "builder (empty = single lshape)")
    ap.add_argument("--pair_frac", type=float, default=0.0)
    ap.add_argument("--scenes", type=int, default=1)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--version", type=int, default=910)
    ap.add_argument("--skip_world", action="store_true",
                    help="reuse an existing --root")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse --version's existing checkpoint; rerun only "
                         "the eval arms + paired scoring")
    args = ap.parse_args()
    root = os.path.abspath(args.root)

    if not args.skip_world:
        run(
            [sys.executable, "tools/synthetic_world.py", "--root", root,
             "--train", str(args.train_views), "--test",
             str(args.test_views), "--objects", args.objects,
             "--pair_frac", str(args.pair_frac),
             "--scenes", str(args.scenes)],
            os.path.join("/tmp", "world_gen.log"),
        )

    # 1. random-init baseline (a version id with no checkpoints)
    base_version = args.version + 1
    os.makedirs(os.path.join(root), exist_ok=True)
    baseline = eval_and_score(root, base_version, "random")
    print("random-init:", json.dumps(baseline))

    # 2. train from scratch through the real CLI
    epochs = max(1, args.steps * args.bs // max(args.train_views, 1) + 1)
    if not args.skip_train:
        _train(args, root, epochs)

    # 3. eval + score the trained checkpoint (faithful mode)
    trained = eval_and_score(root, args.version, "trained")
    print("trained:", json.dumps(trained))

    # 4. mode A/Bs on the SAME checkpoint: int8 matching scores and the
    # stage3_topk serving mode — the measured AR deltas docs/PARITY.md
    # cites for both opt-ins.
    trained_int8 = eval_and_score(
        root, args.version, "trained_int8", env={"PICOPOSE_MATCH_INT8": "1"},
        paired_vs="trained",
    )
    print("trained int8-matching:", json.dumps(trained_int8))
    trained_topk1 = eval_and_score(
        root, args.version, "trained_topk1",
        extra_set=("model.stage3_topk=1",), paired_vs="trained",
    )
    print("trained stage3_topk=1:", json.dumps(trained_topk1))
    trained_quant = eval_and_score(
        root, args.version, "trained_quant",
        extra_set=("model.quantize_stage3=true",), paired_vs="trained",
    )
    print("trained quantize_stage3:", json.dumps(trained_quant))

    summary = {
        "steps": args.steps,
        "ar_random": baseline,
        "ar_trained": trained,
        "ar_trained_int8_matching": trained_int8,
        "ar_trained_stage3_topk1": trained_topk1,
        "ar_trained_quantize_stage3": trained_quant,
    }
    with open(os.path.join(root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
