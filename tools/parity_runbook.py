"""One-command real-data parity runbook: reference checkpoint -> AR table.

The single most important unmeasured number of this project is AR parity
with the reference on real BOP data (reference: run_test.py:196-220 ->
rendering/src/megapose/evaluation/bop.py scoring via bop_toolkit).  This
environment has neither the BOP archives nor the reference checkpoint, so
this script packages the ENTIRE chain — torch-checkpoint port, eval CLI,
in-repo BOP19 scoring, optional bop_toolkit cross-run, side-by-side table —
behind one command, ready to run the day data appears:

    python tools/parity_runbook.py --ckpt picopose.ckpt \
        --data_dir data/BOP --dataset lmo \
        --template_dir data/BOP/lmo/templates \
        --detection_dir data/BOP/detections

Every step writes under --workdir and is skipped if its output already
exists (delete the dir to re-run).  Optional:

  --ref_csv   a bop19 CSV produced by the REFERENCE repo (its run_test.py
              writes log/.../result_*.csv) — scored with the same in-repo
              scorer so the table compares like with like;
  --hyp/--view/--batch  eval-config overrides (defaults match the
              reference's test config: 5 hypotheses, 162 views).

Dry-run (no data needed, ~10 min on CPU):

    python tools/parity_runbook.py --dry_run

builds a synthetic world with the in-repo rasterizer, exports a RANDOM-init
model as a reference-style torch .ckpt (utils/torch_export.py), then runs
the identical port -> eval -> score chain on it — proving every link of the
runbook executes before real data is at stake.

If `bop_toolkit_lib` is importable, the script also scores the CSV through
it and prints both scorers' AR side by side (the in-repo scorer agrees with
an independent re-derivation to 1e-10; tests/test_bop_scoring.py).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRY_MODEL_ARGS = [
    "model.vit_type=dinov2_vits14",
    "model.blocks_to_take=[2,5,8,11]",
    "model.compute_dtype=float32",
    "model.hypothesis=2",
]


def run(cmd: list[str], log_path: str, env: dict | None = None) -> None:
    print("+", " ".join(cmd), f"(log: {log_path})")
    full_env = dict(os.environ, **(env or {}))
    with open(log_path, "w") as f:
        rc = subprocess.call(
            cmd, cwd=REPO, stdout=f, stderr=subprocess.STDOUT, env=full_env
        )
    if rc != 0:
        sys.stderr.write(open(log_path).read()[-4000:])
        raise SystemExit(f"step failed rc={rc}: {' '.join(cmd)}")


def score_inrepo(csv: str, data_dir: str, dataset: str, log_path: str,
                 bootstrap: int = 0) -> dict:
    cmd = [sys.executable, "score_csv.py", "--csv", csv, "--data_dir",
           data_dir, "--dataset", dataset, "--vsd"]
    if bootstrap:
        cmd += ["--bootstrap", str(bootstrap)]
    run(cmd, log_path)
    text = open(log_path).read()
    starts = [i for i in range(len(text))
              if text.startswith("{", i) and (i == 0 or text[i - 1] == "\n")]
    return json.loads(text[starts[-1]:])


def score_bop_toolkit(csv: str, data_dir: str, dataset: str) -> dict | None:
    """Cross-run bop_toolkit on the same CSV, if installed.

    Returns {'AR_bop19': ...} or None (with the exact command printed for a
    machine that has it).  bop_toolkit wants the CSV named
    <method>_<dataset>-test.csv inside its --results_path.
    """
    try:
        import bop_toolkit_lib  # noqa: F401
    except ImportError:
        print(
            "bop_toolkit not installed; to cross-check on a machine that "
            "has it:\n"
            f"  python bop_toolkit/scripts/eval_bop19_pose.py "
            f"--results_path {os.path.dirname(csv)} "
            f"--result_filenames {os.path.basename(csv)} "
            f"--eval_path /tmp/bop_eval --datasets_path {data_dir}"
        )
        return None
    import tempfile

    eval_path = tempfile.mkdtemp(prefix="bop_eval_")
    staged = os.path.join(eval_path, f"runbook_{dataset}-test.csv")
    shutil.copy(csv, staged)
    script = os.path.join(
        os.path.dirname(bop_toolkit_lib.__file__), os.pardir,
        "scripts", "eval_bop19_pose.py",
    )
    log = os.path.join(eval_path, "toolkit.log")
    run([sys.executable, script, "--results_path", eval_path,
         "--result_filenames", os.path.basename(staged),
         "--eval_path", eval_path, "--datasets_path", data_dir], log)
    scores_json = os.path.join(
        eval_path, f"runbook_{dataset}-test", "scores_bop19.json"
    )
    if os.path.exists(scores_json):
        with open(scores_json) as f:
            s = json.load(f)
        return {"AR_bop19": s.get("bop19_average_recall")}
    return None


def print_table(rows: list[tuple[str, dict | None]]) -> None:
    keys = ["AR_bop19", "AR_MSSD", "AR_MSPD", "AR_VSD", "n_gt"]
    print()
    print(f"{'run':<34}" + "".join(f"{k:>10}" for k in keys))
    for name, scores in rows:
        if scores is None:
            print(f"{name:<34}{'(not available)':>10}")
            continue
        cells = []
        for k in keys:
            v = scores.get(k)
            cells.append(f"{v:>10.4f}" if isinstance(v, float)
                         else f"{v!s:>10}")
        print(f"{name:<34}" + "".join(cells))
    print()


def eval_csv(args, workdir: str, version: int, ckpt: str,
             extra_set: tuple[str, ...] = ()) -> str:
    csv = os.path.join(
        REPO, "log", "picopose", f"version_{version}",
        f"{args.dataset}_eval",
        f"picopose-stage3-{args.hyp}hyp_{args.dataset}-test.csv",
    )
    if os.path.exists(csv):
        print(f"eval CSV exists, skipping eval: {csv}")
        return csv
    run(
        [sys.executable, "run_test.py", "--dataset", args.dataset,
         "--batch", str(args.batch), "--version_id", str(version),
         "--checkpoint_path", ckpt, "--hyp", str(args.hyp), "--set",
         f"test_dataset.data_dir={args.data_dir}",
         f"test_dataset.template_dir={args.template_dir}",
         f"test_dataset.detection_dir={args.detection_dir}",
         f"test_dataset.n_template_view={args.view}",
         *extra_set],
        os.path.join(workdir, "eval.log"),
    )
    if not os.path.exists(csv):
        raise SystemExit(f"eval finished but CSV not found at {csv}")
    return csv


def dry_run(args) -> None:
    root = os.path.abspath(args.workdir or "/tmp/parity_dryrun")
    os.makedirs(root, exist_ok=True)
    world = os.path.join(root, "world")
    if not os.path.exists(os.path.join(world, "bop")):
        run([sys.executable, "tools/synthetic_world.py", "--root", world,
             "--train", "2", "--test", "4"],
            os.path.join(root, "world.log"))

    # a random-init ViT-S exported through the REVERSE porter stands in for
    # the reference's .ckpt: run_test's load_any then FORWARD-ports it, so
    # the dry run exercises both directions of the checkpoint bridge
    ckpt = os.path.join(root, "fake_reference.ckpt")
    if not os.path.exists(ckpt):
        code = (
            "import jax, jax.numpy as jnp, sys;"
            "from picopose_tpu.models import PicoPose;"
            "from picopose_tpu.utils.torch_export import save_torch_checkpoint;"
            "m = PicoPose(vit_type='dinov2_vits14', blocks_to_take=(2,5,8,11),"
            "  compute_dtype=jnp.float32, hypotheses=2);"
            "v = m.init(jax.random.PRNGKey(0),"
            "  jnp.zeros((1,224,224,3)), jnp.ones((1,224,224)), True);"
            f"save_torch_checkpoint(v, {ckpt!r}, lightning=True);"
            "print('wrote', sys.argv[0])"
        )
        run([sys.executable, "-c", code], os.path.join(root, "export.log"),
            env={"JAX_PLATFORMS": "cpu"})

    args.data_dir = os.path.join(world, "bop")
    args.dataset = "fakeds"
    args.template_dir = os.path.join(world, "templates")
    args.detection_dir = os.path.join(world, "dets")
    args.hyp, args.view, args.batch = 2, 42, 4
    csv = eval_csv(args, root, args.version, ckpt, tuple(DRY_MODEL_ARGS))
    ours = score_inrepo(csv, args.data_dir, args.dataset,
                        os.path.join(root, "score.log"))
    toolkit = score_bop_toolkit(csv, args.data_dir, args.dataset)
    print_table([
        ("ported fake-ref ckpt (in-repo AR)", ours),
        ("same CSV via bop_toolkit", toolkit),
    ])
    # random weights must still produce a full, valid, scoreable run
    assert 0.0 <= ours["AR_bop19"] <= 1.0 and ours["n_gt"] >= 4
    print("dry run OK: port -> eval -> score chain is executable")


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--ckpt", help="reference torch .ckpt (or orbax dir)")
    ap.add_argument("--data_dir", help="BOP root (contains <dataset>/)")
    ap.add_argument("--dataset", default="lmo")
    ap.add_argument("--template_dir",
                    help="rendered banks (render_templates.py output)")
    ap.add_argument("--detection_dir", help="CNOS detection JSONs")
    ap.add_argument("--ref_csv",
                    help="bop19 CSV produced by the reference repo, scored "
                         "with the same in-repo scorer for the table")
    ap.add_argument("--hyp", type=int, default=5)
    ap.add_argument("--view", type=int, default=162)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bootstrap", type=int, default=2000)
    ap.add_argument("--version", type=int, default=950,
                    help="log/ version id for the eval run")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--dry_run", action="store_true",
                    help="prove the chain on a synthetic world (no data)")
    args = ap.parse_args()

    if args.dry_run:
        dry_run(args)
        return

    missing = [k for k in ("ckpt", "data_dir", "template_dir",
                           "detection_dir") if not getattr(args, k)]
    if missing:
        ap.error(f"required without --dry_run: {', '.join('--' + m for m in missing)}")
    workdir = os.path.abspath(args.workdir or f"/tmp/parity_{args.dataset}")
    os.makedirs(workdir, exist_ok=True)

    csv = eval_csv(args, workdir, args.version, args.ckpt)
    ours = score_inrepo(csv, args.data_dir, args.dataset,
                        os.path.join(workdir, "score.log"), args.bootstrap)
    toolkit = score_bop_toolkit(csv, args.data_dir, args.dataset)
    rows = [
        (f"picopose_tpu (ported ckpt, {args.dataset})", ours),
        ("same CSV via bop_toolkit", toolkit),
    ]
    if args.ref_csv:
        ref = score_inrepo(args.ref_csv, args.data_dir, args.dataset,
                           os.path.join(workdir, "score_ref.log"),
                           args.bootstrap)
        rows.append(("reference repo CSV (same scorer)", ref))
        rows.append(("same ref CSV via bop_toolkit",
                     score_bop_toolkit(args.ref_csv, args.data_dir,
                                       args.dataset)))
    print_table(rows)
    with open(os.path.join(workdir, "parity_table.json"), "w") as f:
        json.dump({name: scores for name, scores in rows}, f, indent=1)
    print(f"table written to {workdir}/parity_table.json")
    if args.ref_csv and rows[2][1]:
        delta = ours["AR_bop19"] - rows[2][1]["AR_bop19"]
        print(f"AR delta (ours - reference): {delta:+.4f} "
              f"(target: within 0.005, BASELINE.md)")


if __name__ == "__main__":
    main()
