"""Benchmark: crops/sec/chip for the full three-stage eval pipeline.

Measures the steady-state throughput of the ONE-program inference path
(picopose_tpu/eval/pipeline.py): stage-1 matching against a 162-view
template bank, stage-2 affine + pose recovery, stage-3 flow refinement and
on-device RANSAC-PnP (150 iters) for 5 hypotheses per crop — i.e. the same
work the reference does per instance in run_test.py:141-186, minus host I/O.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
REF_CROPS_PER_SEC below is an ESTIMATE of the reference's single-GPU
per-crop rate (ViT-L forward x(1 query + 5 hypothesis re-runs) + DPT/flow
x5 + serial CPU RANSAC x5 per crop, batch 4) pending a measured baseline —
treat vs_baseline as provisional until one exists.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_CROPS_PER_SEC = 8.0  # provisional estimate; see module docstring


def main(
    batch: int = 16,
    views: int = 162,
    hyp: int = 5,
    iters: int = 10,
    vit: str = "dinov2_vitl14",
):
    import jax
    import jax.numpy as jnp

    from picopose_tpu.eval.pipeline import TemplateBank, run_batch_jit
    from picopose_tpu.models import PicoPose
    from picopose_tpu.models.dinov2 import VIT_CONFIGS

    taps = {"dinov2_vitl14": (5, 11, 17, 23), "dinov2_vits14": (1, 3, 5, 7)}[vit]
    model = PicoPose(vit_type=vit, blocks_to_take=taps)
    rng = np.random.default_rng(0)

    imgs0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    masks0 = jnp.ones((1, 224, 224), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs0, masks0, True)

    C = VIT_CONFIGS[vit].embed_dim
    # synthetic resident bank (bf16 features like production)
    feats = tuple(
        jnp.asarray(rng.normal(size=(views, 16, 16, C)), jnp.bfloat16)
        for _ in range(4)
    )
    pose = np.broadcast_to(np.eye(4, dtype=np.float32), (views, 4, 4)).copy()
    pose[:, 2, 3] = 0.5
    K = np.broadcast_to(
        np.array([[572.4114, 0, 320], [0, 573.57043, 240], [0, 0, 1]], np.float32),
        (views, 3, 3),
    )
    bank = TemplateBank(
        feats=feats,
        mask=jnp.asarray(rng.random((views, 224, 224)) > 0.3, jnp.float32),
        pts3d=jnp.asarray(
            rng.normal(size=(views, 64, 64, 3)).astype(np.float32) * 0.02 + [0, 0, 0.5]
        ),
        pose=jnp.asarray(pose),
        K=jnp.asarray(K),
        M=jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (views, 3, 3))),
    )
    batch_data = {
        "real_rgb": jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.float32),
        "real_mask": jnp.asarray(rng.random((batch, 224, 224)) > 0.3, jnp.float32),
        "real_M": jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (batch, 3, 3))),
        "real_K": jnp.asarray(K[:batch]),
        "real_pts2d": jnp.asarray(
            rng.uniform(0, 640, size=(batch, 64, 64, 2)).astype(np.float32)
        ),
    }

    key = jax.random.PRNGKey(1)
    out = run_batch_jit(model, variables, batch_data, bank, key, hyp=hyp)
    _ = float(out.inlier_ratio.sum())  # compile + warmup (host-fetch sync)

    # Timing discipline: the device tunnel in this environment memoizes
    # identical executions and reports early readiness, so every iteration
    # (a) gets UNIQUE inputs and (b) ends with a device->host fetch of a
    # scalar that depends on the whole pipeline — the only sync that cannot
    # be satisfied without actually running the program.
    lat = []
    acc = 0.0
    t0 = time.perf_counter()
    for i in range(iters):
        b = dict(batch_data)
        b["real_rgb"] = batch_data["real_rgb"] + jnp.float32((i + 1) * 1e-6)
        ti = time.perf_counter()
        out = run_batch_jit(
            model, variables, b, bank, jax.random.PRNGKey(i), hyp=hyp
        )
        acc += float(out.inlier_ratio.sum()) + float(out.R.sum())
        lat.append(time.perf_counter() - ti)
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    p50_ms = sorted(lat)[len(lat) // 2] * 1000.0
    # steady-state throughput from the median batch latency — the mean is
    # polluted by the development tunnel's round-trip stragglers; on directly
    # attached hardware the two agree.
    crops_per_sec = batch / (p50_ms / 1000.0) / n_chips
    crops_per_sec_mean = batch * iters / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "crops_per_sec_per_chip_full_pipeline",
                "value": round(crops_per_sec, 3),
                "unit": "crops/s/chip",
                "vs_baseline": round(crops_per_sec / REF_CROPS_PER_SEC, 3),
                "p50_batch_latency_ms": round(p50_ms, 2),
                "mean_crops_per_sec": round(crops_per_sec_mean, 3),
                "batch": batch,
                "hyp": hyp,
                "views": views,
                "checksum": round(acc, 3),
            }
        )
    )


def main_train(batch: int = 8, iters: int = 6, vit: str = "dinov2_vitl14"):
    """Training-step throughput (BASELINE.json config 4 shape)."""
    import jax
    import jax.numpy as jnp

    from picopose_tpu.models import PicoPose
    from picopose_tpu.train.step import init_state, make_optimizer, train_step

    taps = {"dinov2_vitl14": (5, 11, 17, 23), "dinov2_vits14": (1, 3, 5, 7)}[vit]
    model = PicoPose(vit_type=vit, blocks_to_take=taps)
    tx = make_optimizer()
    state = init_state(model, tx, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B, S = batch, 224
    eye = lambda n: np.broadcast_to(np.eye(n, dtype=np.float32), (B, n, n)).copy()
    K = eye(3)
    K[:, 0, 0] = K[:, 1, 1] = 572.0
    K[:, 0, 2], K[:, 1, 2] = 320.0, 240.0
    pose = eye(4)
    pose[:, 2, 3] = 0.5
    base = {
        "real_rgb": rng.normal(size=(B, S, S, 3)).astype(np.float32),
        "tem_rgb": rng.normal(size=(B, S, S, 3)).astype(np.float32),
        "real_mask": np.ones((B, S, S), np.float32),
        "tem_mask": np.ones((B, S, S), np.float32),
        "real_M": eye(3), "tem_M": eye(3),
        "real_K": K, "tem_K": K.copy(),
        "real_pose": pose, "tem_pose": pose.copy(),
        "real_full_depth": np.full((B, 480, 640), 0.5, np.float32),
        "tem_full_depth": np.full((B, 480, 640), 0.5, np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in base.items()}
    state, losses = train_step(model, tx, state, jb, jax.random.PRNGKey(0))
    _ = float(losses["loss"])
    lat = []
    for i in range(iters):
        b = dict(jb)
        b["real_rgb"] = jb["real_rgb"] + jnp.float32((i + 1) * 1e-6)
        t0 = time.perf_counter()
        state, losses = train_step(model, tx, state, b, jax.random.PRNGKey(i))
        _ = float(losses["loss"])
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[len(lat) // 2]
    print(
        json.dumps(
            {
                "metric": "train_step_samples_per_sec_per_chip",
                "value": round(batch / p50, 3),
                "unit": "samples/s/chip",
                "vs_baseline": 0.0,
                "p50_step_ms": round(p50 * 1000, 2),
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["eval", "train"], default="eval")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--views", type=int, default=162)
    p.add_argument("--hyp", type=int, default=5)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--vit", type=str, default="dinov2_vitl14")
    a = p.parse_args()
    if a.mode == "train":
        main_train(min(a.batch, 8) if a.batch == 16 else a.batch, a.iters, a.vit)
    else:
        main(a.batch, a.views, a.hyp, a.iters, a.vit)
