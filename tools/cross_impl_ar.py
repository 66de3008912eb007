"""Cross-implementation AR parity: OUR trained weights through the ACTUAL
reference network, scored against OUR pipeline's CSV on identical inputs.

This is the strongest parity proof available without external data: the
blocked real-BOP comparison (tools/parity_runbook.py) needs the reference's
Google-Drive checkpoint; this run needs nothing — it trains weights HERE
(examples/train_to_ar.py), exports them to a reference-format state dict
(utils/torch_export.py), and drives the REAL reference eval chain
(/root/reference/model/picopose.py:97-112 Net.forward_test +
utils/pose_recovery.py:68-105 cv2.solvePnPRansac, run_test.py:141-220 CSV
assembly, mmcv stubbed exactly as tests/test_reference_parity.py) over the
same synthetic BOP tree our run_test.py evaluated.  Both CSVs are scored by
the in-repo BOP19 scorer; the PAIRED bootstrap delta over shared GT
instances is the headline number (docs/PARITY.md "Cross-implementation AR").

The reference code never enters the repo — it is imported from
/root/reference at run time as the system under comparison, exactly like
the test-time oracles in tests/test_reference_*.py.

Usage (after examples/train_to_ar.py --root /tmp/ar_world):

    python tools/cross_impl_ar.py --root /tmp/ar_world --version 910

Writes <root>/cross_impl/{reference.csv, ref_score.json, ours_score.json}
and prints a summary JSON with the paired AR delta.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

# Keep the whole run off any real accelerator: the reference side is
# torch-CPU, and our side only loads + exports a checkpoint — pulling
# those leaves through a (possibly busy) TPU tunnel serves nothing.  The
# env var is just the convention the CLIs honor (run_test.py:47-50); an
# env var alone can't beat this environment's TPU-forcing sitecustomize,
# so apply the jax config flip here too, before any jax client exists.
os.environ.setdefault("PICOPOSE_FORCE_CPU", "1")
import jax  # noqa: E402  (config must flip before first device use)

jax.config.update("jax_platforms", "cpu")


def build_reference_net(vit_type: str, blocks: tuple[int, ...], hyp: int):
    """The reference Net at eval, weights uninitialized (loaded by caller).

    interaction_indexes is the reference's grouping config; its
    FeatureExtractor taps the LAST index of each group
    (model/stage1/feature_extractor.py:86), so groups are built to end at
    our blocks_to_take.
    """
    import torch

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from tests.test_reference_parity import _install_mmcv_stub

    _install_mmcv_stub()
    from model.picopose import Net  # reference
    from model.stage1.feature_extractor import descriptor_size  # reference

    groups, start = [], 0
    for b in blocks:
        groups.append([start, b])
        start = b + 1
    ns = types.SimpleNamespace
    cfg = ns(
        hypothesis=hyp,
        stage1=ns(
            vit_type=vit_type, pretrained=False, interaction_indexes=groups
        ),
        stage2=ns(in_channel=256, hidden_dim=256),
        stage3=ns(
            nclass=1, in_channels=descriptor_size[vit_type],
            num_levels=3, radius=4,
        ),
    )
    torch.manual_seed(0)
    return Net(cfg).eval()


def load_trained_variables(version: int, depth: int):
    """Latest orbax checkpoint of log/picopose/version_<v> -> variables."""
    from picopose_tpu.utils.checkpoint import load_any

    step_dir = os.path.join(
        REPO, "log", "picopose", f"version_{version}", "checkpoints"
    )
    steps = sorted(int(d) for d in os.listdir(step_dir) if d.isdigit())
    if not steps:
        raise SystemExit(f"no checkpoints under {step_dir}")
    restored = load_any(os.path.join(step_dir, str(steps[-1])), depth=depth)
    # a train-state checkpoint nests variables under params/batch_stats
    if "params" in restored and "batch_stats" in restored:
        return {k: restored[k] for k in ("params", "batch_stats")}, steps[-1]
    return restored, steps[-1]


def reference_csv_over_world(
    net, dataset, template_dir: str, hyp: int, batch: int, out_csv: str,
) -> None:
    """The reference run_test.py eval loop (141-220), faithfully: cached
    last-tap template features, per-object instance batches, forward_test,
    cv2 RANSAC-EPnP per hypothesis with the stage-2 fallback, hypotheses
    ranked by inlier ratio, CSV rows `scene,im,obj,score,R,t*1000,time`."""
    import numpy as np
    import torch
    import torch.nn.functional as F  # noqa: F401  (parity with reference loop)

    from utils.pose_recovery import pose_recovery_ransac_pnp  # reference

    from picopose_tpu.data.bop import load_template_views

    nchw = lambda x: torch.from_numpy(
        np.ascontiguousarray(np.moveaxis(x, -1, 1), dtype=np.float32)
    )

    # ---- template banks + cached matching features (run_test.py:120-134)
    banks = {}
    for obj_id in dataset.obj_ids:
        tem = load_template_views(
            template_dir, obj_id, dataset.n_template_view,
            img_size=dataset.img_size, pts_size=dataset.pts_size,
        )
        with torch.no_grad():
            feats = []
            rgb_t = nchw(tem["tem_rgb"])
            for s in range(0, len(rgb_t), batch):
                feats.append(net.feature_extractor(rgb_t[s : s + batch])[-1])
        banks[obj_id] = {
            "tem_rgb": rgb_t,
            "tem_mask": torch.from_numpy(tem["tem_mask"].astype(np.float32)),
            "tem_pts3d": torch.from_numpy(tem["tem_pts3d"].astype(np.float32)),
            "tem_pose": torch.from_numpy(tem["tem_pose"].astype(np.float32)),
            "tem_K": torch.from_numpy(tem["tem_K"].astype(np.float32)),
            "tem_M": torch.from_numpy(tem["tem_M"].astype(np.float32)),
            "template_feature": torch.cat(feats),  # (N, C, 16, 16)
        }
        print(f"  bank obj {obj_id}: {len(rgb_t)} views")

    lines = []
    t_total = 0.0
    for ii in range(len(dataset)):
        rec = dataset.load_image(ii)
        if not rec.instances:
            continue
        t0 = time.time()
        preds_image = []
        for s in range(0, len(rec.instances), batch):
            insts = rec.instances[s : s + batch]
            B = len(insts)
            bank = [banks[inst.obj_id] for inst in insts]
            stackb = lambda k: torch.stack([b[k] for b in bank])
            ep = {
                "tem_rgb": stackb("tem_rgb"),            # (B, N, 3, H, W)
                "tem_mask": stackb("tem_mask"),
                "tem_pts3d": stackb("tem_pts3d"),
                "tem_pose": stackb("tem_pose"),
                "tem_K": stackb("tem_K"),
                "tem_M": stackb("tem_M"),
                "template_feature": stackb("template_feature"),
                "real_rgb": nchw(np.stack([i.rgb for i in insts])),
                "real_mask": torch.from_numpy(
                    np.stack([i.mask for i in insts]).astype(np.float32)
                ),
                "real_M": torch.from_numpy(
                    np.stack([i.M for i in insts]).astype(np.float32)
                ),
                "real_K": torch.from_numpy(
                    np.stack([i.K for i in insts]).astype(np.float32)
                ),
                # The reference dataset's real_pts2d is built from a
                # (y, x)-stacked grid (utils/torch_utils.py:287-295) whose
                # channel quirk cancels EXACTLY against forward_test_hyp's
                # spatial transpose (picopose.py:76 permute(0,3,2,1)),
                # leaving pose_recovery's gathered coord_2d sane.  Our
                # Instance.pts2d uses the sane (x, y) convention, so the
                # reference-convention tensor is its SPATIAL TRANSPOSE
                # (crop matrices are scale+translation, which is what makes
                # the two conventions differ by a pure transpose).  Feeding
                # the sane grid directly puts u/v mixed coordinates into
                # cv2.solvePnPRansac — poses come back row-swapped (AR ~0).
                "real_pts2d": torch.from_numpy(
                    np.stack([i.pts2d for i in insts])
                    .transpose(0, 2, 1, 3).astype(np.float32)
                ),
                # passed through select_template_data, unused at test time
                "real_pose": torch.eye(4)[None].repeat(B, 1, 1),
            }
            with torch.no_grad():
                outputs = net.forward_test(ep, hyp=hyp)
            for k in range(B):
                preds = []
                for tk in range(hyp):
                    r3, t3, ratio, ok = pose_recovery_ransac_pnp(
                        outputs[tk]["tar_pts_2d"][k],
                        outputs[tk]["src_pts_3d"][k],
                        ep["real_K"][k],
                        outputs[tk]["tem_pose"][k],
                        outputs[tk]["pred_tar_pts"][k],
                        outputs[tk]["pred_src_pts"][k],
                    )
                    if not ok:
                        p = outputs[tk]["pred_poses"][k]
                        r3 = p[:3, :3].detach().cpu().numpy()
                        t3 = p[:3, 3].detach().cpu().numpy()
                    preds.append({
                        "R": np.asarray(r3).reshape(9),
                        "t": np.asarray(t3).reshape(3) * 1000.0,
                        "ratio": float(ratio),
                    })
                preds_image.append(
                    sorted(preds, key=lambda x: x["ratio"], reverse=True)
                )
        image_time = time.time() - t0 + rec.seg_time
        t_total += image_time
        for k, inst in enumerate(rec.instances):
            best = preds_image[k][0]
            lines.append(",".join((
                str(rec.scene_id), str(rec.img_id), str(inst.obj_id),
                str(inst.score),
                " ".join(str(v) for v in best["R"]),
                " ".join(str(v) for v in best["t"]),
                f"{image_time}\n",
            )))
        print(
            f"  image {ii + 1}/{len(dataset)}: {len(rec.instances)} "
            f"instances, {image_time:.1f}s"
        )
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w") as f:
        f.writelines(lines)
    print(f"reference CSV: {out_csv} ({len(lines)} rows, {t_total:.0f}s)")


def score(csv, root, dataset, out_json, dump_records, paired_vs=None):
    cmd = [
        sys.executable, os.path.join(REPO, "score_csv.py"), "--csv", csv,
        "--data_dir", os.path.join(root, "bop"), "--dataset", dataset,
        "--vsd", "--bootstrap", "2000", "--dump_records", dump_records,
    ]
    if paired_vs:
        cmd += ["--paired_vs", paired_vs]
    import subprocess

    out = subprocess.check_output(cmd, cwd=REPO, text=True)
    start = out.index("{")
    result = json.loads(out[start:])
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ar_world")
    ap.add_argument("--version", type=int, default=910)
    ap.add_argument("--dataset", default="fakeds")
    ap.add_argument("--hyp", type=int, default=2)
    ap.add_argument("--vit", default="dinov2_vits14")
    ap.add_argument("--blocks", default="2,5,8,11",
                    help="our blocks_to_take (must match the trained model)")
    ap.add_argument("--n_template_view", type=int, default=42)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ours_csv", default=None,
                    help="our pipeline's CSV (default: the train_to_ar "
                         "version's fakeds_eval CSV)")
    args = ap.parse_args()
    root = os.path.abspath(args.root)
    out_dir = os.path.join(root, "cross_impl")
    os.makedirs(out_dir, exist_ok=True)
    blocks = tuple(int(b) for b in args.blocks.split(","))

    if REPO not in sys.path:
        sys.path.insert(0, REPO)

    # ---- our trained weights -> reference state dict -> reference Net
    import torch

    from picopose_tpu.utils.torch_export import export_picopose

    variables, step = load_trained_variables(args.version, depth=len(blocks) * 3)
    print(f"loaded our checkpoint: version_{args.version} step {step}")
    net = build_reference_net(args.vit, blocks, args.hyp)
    state = {k: torch.from_numpy(v) for k, v in export_picopose(variables).items()}
    missing, unexpected = net.load_state_dict(state, strict=False)
    assert not unexpected, f"exported keys unknown to the reference: {unexpected}"
    # only reference-dead modules may be missing (torch_export.py:20-25).
    # refinenet4.resConfUnit1 is dead too: the top fusion block is called
    # with a single input (reference dpt.py:267 `refinenet4(layer_4_rn,
    # size=...)`), and resConfUnit1 only runs on a second, skip input
    # (dpt.py:137-138) — refinenet4 never gets one.
    live_missing = [
        k for k in missing
        if not any(tag in k for tag in (
            "refinenet1", "output_conv", "mask_token", "norm.weight",
            "norm.bias", "gru", "flow_head", "feat_head",
            "refinenet4.resConfUnit1",
        ))
    ]
    assert not live_missing, f"live reference keys not exported: {live_missing}"
    print(f"state dict loaded ({len(state)} keys, {len(missing)} dead-module keys skipped)")

    # ---- drive the reference eval loop over the synthetic BOP tree
    from picopose_tpu.data.bop import BOPTestDataset

    dataset = BOPTestDataset(
        os.path.join(root, "bop"), args.dataset,
        os.path.join(root, "dets", f"{args.dataset}.json"),
        n_template_view=args.n_template_view,
    )
    ref_csv = os.path.join(out_dir, "reference.csv")
    # template_dir/<dataset>/... — same join as run_test.py:126
    reference_csv_over_world(
        net, dataset, os.path.join(root, "templates", args.dataset),
        args.hyp, args.batch, ref_csv,
    )

    # ---- score both CSVs; paired delta = ours minus reference.
    # Prefer the faithful arm's preserved CSV (examples/train_to_ar.py
    # writes csv_trained.csv): the version dir's CSV is overwritten by
    # every later serving-mode arm, so it holds whichever arm ran LAST.
    preserved = os.path.join(root, "csv_trained.csv")
    ours_csv = args.ours_csv or (
        preserved if os.path.exists(preserved) else os.path.join(
            REPO, "log", "picopose", f"version_{args.version}",
            f"{args.dataset}_eval",
            f"picopose-stage3-{args.hyp}hyp_{args.dataset}-test.csv",
        )
    )
    ref_records = os.path.join(out_dir, "ref_records.pkl")
    ref_score = score(
        ref_csv, root, args.dataset,
        os.path.join(out_dir, "ref_score.json"), ref_records,
    )
    ours_score = score(
        ours_csv, root, args.dataset,
        os.path.join(out_dir, "ours_score.json"),
        os.path.join(out_dir, "ours_records.pkl"), paired_vs=ref_records,
    )
    summary = {
        "checkpoint_step": step,
        "reference_AR": {
            k: ref_score[k] for k in sorted(ref_score) if k.startswith("AR")
        },
        "ours_AR": {
            k: ours_score[k] for k in sorted(ours_score) if k.startswith("AR")
        },
        "paired_delta_ours_minus_reference":
            ours_score["paired_delta_vs_baseline"],
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
