"""Benchmark: crops/sec/chip for the full three-stage eval pipeline.

Measures the steady-state throughput of the ONE-program inference path
(picopose_tpu/eval/pipeline.py): stage-1 matching against a 162-view
template bank, stage-2 affine + pose recovery, stage-3 flow refinement and
on-device RANSAC-PnP (150 iters) for 5 hypotheses per crop — i.e. the same
work the reference does per instance in run_test.py:141-186, minus host I/O.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

"value" is the pipelined steady-state throughput (dispatch one batch ahead
of the result fetches — eval/runner.py's serving pattern); the JSON also
carries the per-batch-synced p50 LATENCY and its derived rate, plus the
RTT-free summed device-op time from a profiler trace, so latency and
throughput stay separately auditable.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
REF_CROPS_PER_SEC below is an estimate of the reference's single-GPU
per-crop rate, now BOUNDED two ways by tools/ref_baseline.py:

  * serial-host bound (measured): the reference runs OpenCV RANSAC on the
    host per instance x per hypothesis (run_test.py:168-186); one call at
    4096 correspondences measures 22 ms on this host's CPU -> 5 serial
    calls cap the reference near ~9 crops/s when RANSAC can't early-exit
    (clean inlier sets let cv2 stop early, so treat as the hard-scene
    bound, not a universal one);
  * GPU-compute upper bound (analytic): the reference's own dataflow
    (ViT-L x6 per crop — query + 5 per-hypothesis re-runs, stage-3 both
    sides x5, 162-view matching) is 1.65 TFLOP/crop; at an optimistic
    50%-MFU A100 that is <= ~95 crops/s with zero host time.

REF_CROPS_PER_SEC = 8 sits at the serial-host bound; vs_baseline is that
ratio.  The JSON also reports our achieved TFLOP/s and MFU (from XLA's
own cost analysis of the compiled program) so "fast" is auditable
against the v5e peak, not only against an estimated rival.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compilation cache: the pipeline program takes minutes to
# compile; cache it so repeat bench runs (and the driver's end-of-round
# run) pay it once per machine, not once per process.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/picopose_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

REF_CROPS_PER_SEC = 8.0       # serial-host bound; see module docstring
REF_GPU_UPPER_BOUND = 94.8    # analytic; tools/ref_baseline.py
V5E_PEAK_TFLOPS = 197.0       # bf16 per chip


def main(
    batch: int = 16,
    views: int = 162,
    hyp: int = 5,
    iters: int = 20,
    vit: str = "dinov2_vitl14",
    stage3_topk: int | None = None,
    quantize_stage3: bool = False,
    fuse_xheads: bool = True,
):
    import jax
    import jax.numpy as jnp

    from picopose_tpu.eval.pipeline import TemplateBank, run_batch_jit
    from picopose_tpu.models import PicoPose
    from picopose_tpu.models.dinov2 import VIT_CONFIGS

    taps = {"dinov2_vitl14": (5, 11, 17, 23), "dinov2_vits14": (1, 3, 5, 7)}[vit]
    model = PicoPose(
        vit_type=vit, blocks_to_take=taps, quantize_stage3=quantize_stage3,
        fuse_xheads=fuse_xheads,
    )
    rng = np.random.default_rng(0)

    imgs0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    masks0 = jnp.ones((1, 224, 224), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs0, masks0, True)
    # production eval stores bf16-consumed weights as bf16 (utils/precast.py)
    from picopose_tpu.utils.precast import precast_inference_params

    variables = precast_inference_params(variables)

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
        # Production banks cache the template-side DPT pyramids
        # (eval/pipeline.py::build_template_bank, cache_dpt=True default),
        # so stage 3 does zero template conv work per query batch.  The
        # bench bank must match, or it times a program production never
        # runs (~16 ms/batch of per-hypothesis template DPT recompute).
        dpt=tuple(
            jnp.asarray(rng.normal(size=(views, g, g, 256)), jnp.bfloat16)
            for g in (16, 32, 64)
        ),
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

    # ONE compile for everything: AOT-compile the pipeline, read XLA's own
    # FLOP count off that executable (auditable MFU), and run the timed
    # loops through it.  (The tunnel platform doesn't support the
    # persistent compilation cache, and this program costs minutes of
    # remote compile — paying it twice for a .cost_analysis() is the
    # difference between a 10- and a 19-minute bench run.)
    flops = 0.0
    try:
        compiled = run_batch_jit.lower(
            model, variables, batch_data, bank, key, hyp=hyp,
            stage3_topk=stage3_topk,
        ).compile()
        exec_fn = lambda v, b, bk, k: compiled(v, b, bk, k)
    except Exception:
        compiled = None
        exec_fn = lambda v, b, bk, k: run_batch_jit(
            model, v, b, bk, k, hyp=hyp, stage3_topk=stage3_topk
        )
    if compiled is not None:
        # guarded separately: a cost_analysis() failure must not discard the
        # already-built executable (that would re-pay the multi-minute
        # compile through the jit path — the exact cost AOT avoids)
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        except Exception:
            pass
    out = exec_fn(variables, batch_data, bank, key)
    _ = float(out.inlier_ratio.sum())  # warmup (host-fetch sync)

    # Timing discipline: the device tunnel in this environment memoizes
    # identical executions and reports early readiness, so every iteration
    # (a) gets UNIQUE inputs and (b) ends with a device->host fetch of an
    # output that depends on the whole pipeline — the only sync that cannot
    # be satisfied without actually running the program.  Inputs (and
    # per-iteration PRNG keys) are staged on device OUTSIDE the timed
    # windows:
    # a serving host preps batch i+1 while batch i runs (eval/runner.py's
    # pipeline), so input-perturbation dispatches don't belong in the
    # per-batch cost.  One program dispatch + one small device_get per
    # iteration is all the timed region contains.
    def make_input(seed0: int, off: float, i: int):
        b = dict(batch_data)
        b["real_rgb"] = batch_data["real_rgb"] + jnp.float32(
            off + (i + 1) * 1e-6
        )
        return b, jax.random.PRNGKey(seed0 + i)

    # Latency loop: stage each input and block on it OUTSIDE the per-batch
    # timed window — O(1) staged HBM regardless of --iters.
    lat = []
    acc = 0.0
    t0 = time.perf_counter()
    for i in range(iters):
        b, k = make_input(0, 0.0, i)
        jax.block_until_ready(b["real_rgb"])
        ti = time.perf_counter()
        out = exec_fn(variables, b, bank, k)
        ir, R = jax.device_get((out.inlier_ratio, out.R))
        acc += float(ir.sum()) + float(R.sum())
        lat.append(time.perf_counter() - ti)
    dt = time.perf_counter() - t0

    # Steady-state pipelined throughput: dispatch runs TWO batches ahead of
    # the result fetches (eval/runner.py's software pipeline), so the host
    # fetch of batch i-2 overlaps the device executing batches i-1 and i —
    # tunnel round-trip jitter hides entirely under device execution.
    # This is the number a serving loop sees; the per-batch-synced p50
    # above is the LATENCY number.  Unique inputs per iteration as before
    # (offset range disjoint from the latency loop's).
    # Staged HBM is bounded: pre-stage at most STAGE_LIMIT inputs (each
    # real_rgb copy is ~9.6 MB at batch 16 — large --iters would otherwise
    # hold O(iters) copies on a chip already carrying ViT-L + the bank);
    # beyond the limit, dispatch the perturbation inline — it is async and
    # overlaps device execution, exactly what a serving host pays.
    STAGE_LIMIT = 32
    n_staged = min(iters, STAGE_LIMIT)
    ins_pipe = [make_input(1000, 0.5, i) for i in range(n_staged)]
    jax.block_until_ready([b["real_rgb"] for b, _ in ins_pipe])
    depth = 2
    acc_pipe = 0.0
    pending = []
    fetch_t = []
    t0 = time.perf_counter()
    for i in range(iters):
        b, k = ins_pipe[i] if i < n_staged else make_input(1000, 0.5, i)
        pending.append(
            exec_fn(variables, b, bank, k)
        )
        if len(pending) > depth:
            acc_pipe += float(
                jax.device_get(pending.pop(0).inlier_ratio).sum()
            )
            fetch_t.append(time.perf_counter())
    for out in pending:
        acc_pipe += float(jax.device_get(out.inlier_ratio).sum())
        fetch_t.append(time.perf_counter())
    dt_pipe = time.perf_counter() - t0
    # Steady-state per-batch time = median inter-fetch gap while the device
    # queue is full (drop the fill-dominated first gap and the drain's last
    # `depth` fetches, whose gaps nothing overlaps).  The RAW mean
    # (dt_pipe / iters) amortizes the ~1-latency pipeline fill over the
    # run, so at small --iters it understates what a serving loop sustains
    # over thousands of batches — that mean is still reported as
    # mean_pipelined_crops_per_sec.
    gaps = [b - a for a, b in zip(fetch_t, fetch_t[1:])]
    core = gaps[1 : len(gaps) - depth] or gaps
    batch_s_pipe = sorted(core)[len(core) // 2]

    # device-op time from a profiler trace: the tunnel development setup
    # adds tens of ms of RTT per host fetch, so wall p50 OVERSTATES batch
    # latency; the summed XLA-op device time is the RTT-free number a
    # directly-attached chip would deliver.
    device_ms = 0.0
    try:
        import collections
        import glob
        import gzip
        import shutil
        import tempfile

        import jax.profiler

        tdir = tempfile.mkdtemp(prefix="bench_trace")
        jax.profiler.start_trace(tdir)
        for i in range(2):
            b = dict(batch_data)
            b["real_rgb"] = batch_data["real_rgb"] + jnp.float32(7 + i * 1e-6)
            o = exec_fn(variables, b, bank, jax.random.PRNGKey(99 + i))
            _ = float(o.inlier_ratio.sum())
        jax.profiler.stop_trace()
        tf = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))[-1]
        trace = json.load(gzip.open(tf))
        meta = {}
        for e in trace["traceEvents"]:
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                meta[(e["pid"], e.get("tid"))] = e["args"]["name"]
        tot = sum(
            e.get("dur", 0)
            for e in trace["traceEvents"]
            if e.get("ph") == "X"
            and meta.get((e.get("pid"), e.get("tid"))) == "XLA Ops"
        )
        device_ms = tot / 1e3 / 2
        shutil.rmtree(tdir, ignore_errors=True)
    except Exception:
        pass

    n_chips = max(1, len(jax.devices()))
    p50_ms = sorted(lat)[len(lat) // 2] * 1000.0
    # latency-derived rate from the median per-batch-synced latency — the
    # mean is polluted by the development tunnel's round-trip stragglers;
    # on directly attached hardware the two agree.
    latency_crops_per_sec = batch / (p50_ms / 1000.0) / n_chips
    crops_per_sec_mean = batch * iters / dt / n_chips
    # headline = pipelined steady-state throughput (the serving number):
    # median inter-fetch gap with the device queue full (see above)
    crops_per_sec = batch / batch_s_pipe / n_chips
    mean_pipelined = batch * iters / dt_pipe / n_chips
    achieved_tflops = flops / batch_s_pipe / 1e12 if flops else 0.0
    print(
        json.dumps(
            {
                "metric": "crops_per_sec_per_chip_full_pipeline",
                "value": round(crops_per_sec, 3),
                "unit": "crops/s/chip",
                "vs_baseline": round(crops_per_sec / REF_CROPS_PER_SEC, 3),
                "vs_ref_gpu_upper_bound": round(
                    crops_per_sec / REF_GPU_UPPER_BOUND, 3
                ),
                "p50_batch_latency_ms": round(p50_ms, 2),
                "latency_crops_per_sec": round(latency_crops_per_sec, 3),
                "device_batch_ms": round(device_ms, 2),
                "device_crops_per_sec": (
                    round(batch / (device_ms / 1e3), 3) if device_ms else 0.0
                ),
                "mean_crops_per_sec": round(crops_per_sec_mean, 3),
                "mean_pipelined_crops_per_sec": round(mean_pipelined, 3),
                "achieved_tflops_per_sec": round(achieved_tflops, 2),
                "mfu_vs_v5e_peak": round(
                    achieved_tflops / V5E_PEAK_TFLOPS, 4
                ),
                "batch": batch,
                "hyp": hyp,
                "views": views,
                **(
                    {"stage3_topk": stage3_topk}
                    if stage3_topk is not None
                    else {}
                ),
                **({"quantize_stage3": True} if quantize_stage3 else {}),
                "checksum": round(acc, 3),
            }
        )
    )


def main_train(
    batch: int = 8, iters: int = 6, vit: str = "dinov2_vitl14",
    remat: bool = False,
):
    """Training-step throughput (BASELINE.json config 4 shape).

    batch 32 needs remat=True on a 16 GB chip (18.3 GB HBM without —
    ViT block activation rematerialization, models/dinov2.py)."""
    import jax
    import jax.numpy as jnp

    from picopose_tpu.models import PicoPose
    from picopose_tpu.train.step import init_state, make_optimizer, train_step

    taps = {"dinov2_vitl14": (5, 11, 17, 23), "dinov2_vits14": (1, 3, 5, 7)}[vit]
    model = PicoPose(vit_type=vit, blocks_to_take=taps, remat_vit=remat)
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

    # XLA's own FLOP accounting for the whole step and its forward
    # sub-program -> auditable MFU + fwd/bwd+opt attribution (the eval
    # bench's self-auditing pattern applied to training; VERDICT r4 weak #5)
    def _cost_flops(obj):
        try:
            cost = obj.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0))
        except Exception:
            return 0.0

    from picopose_tpu.train.step import forward_train

    # ONE compile of the step (AOT), reused by the timed loop — the same
    # double-compile avoidance as the eval bench (bench.py:133-141)
    step_flops = 0.0
    try:
        compiled = train_step.lower(
            model, tx, state, jb, jax.random.PRNGKey(0)
        ).compile()
        step_fn = lambda st, b, k: compiled(st, b, k)
        step_flops = _cost_flops(compiled)
    except Exception:
        step_fn = lambda st, b, k: train_step(model, tx, st, b, k)
    # forward-only sub-program: lowered cost analysis where available (no
    # second backend compile), else compile the small program
    fwd_lowered = jax.jit(
        lambda params, stats, b, k: forward_train(model, params, stats, b, k),
    ).lower(state.params, state.batch_stats, jb, jax.random.PRNGKey(0))
    fwd_flops = _cost_flops(fwd_lowered)
    if not fwd_flops:
        try:
            fwd_flops = _cost_flops(fwd_lowered.compile())
        except Exception:
            pass

    state, losses = step_fn(state, jb, jax.random.PRNGKey(0))
    _ = float(losses["loss"])
    lat = []
    for i in range(iters):
        b = dict(jb)
        b["real_rgb"] = jb["real_rgb"] + jnp.float32((i + 1) * 1e-6)
        t0 = time.perf_counter()
        state, losses = step_fn(state, b, jax.random.PRNGKey(i))
        _ = float(losses["loss"])
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[len(lat) // 2]
    achieved_tflops = step_flops / p50 / 1e12 if step_flops else 0.0
    print(
        json.dumps(
            {
                "metric": "train_step_samples_per_sec_per_chip",
                "value": round(batch / p50, 3),
                "unit": "samples/s/chip",
                "vs_baseline": 0.0,
                "p50_step_ms": round(p50 * 1000, 2),
                "batch": batch,
                "step_tflop": round(step_flops / 1e12, 3),
                "fwd_tflop": round(fwd_flops / 1e12, 3),
                "bwd_opt_tflop": round((step_flops - fwd_flops) / 1e12, 3),
                "achieved_tflops_per_sec": round(achieved_tflops, 2),
                "mfu_vs_v5e_peak": round(achieved_tflops / V5E_PEAK_TFLOPS, 4),
            }
        )
    )


def main_latency(
    vit: str = "dinov2_vitl14",
    hyp: int = 5,
    views: int = 42,
    frames: int = 40,
    batches: tuple[int, ...] = (1, 4),
):
    """Single-frame serving latency through serve.PoseEstimator.estimate.

    The reference has no serving story at all (its eval loop is offline CSV
    production, run_test.py:141-220) — this measures the interactive path a
    robot/AR client sees: one camera frame + CNOS-style detections in,
    ranked poses out, host preprocessing included.  Reports p50/p99 wall
    per frame for batch sizes `batches`, each with host preprocessing and
    with the on-device preprocess stage (ops/preprocess.py).

    Frames are freshly rendered + perturbed so the device tunnel's
    memoization cannot satisfy a request without running the program
    (same discipline as the eval bench, bench.py:165-174)."""
    import jax
    import jax.numpy as jnp

    from picopose_tpu.data.synthetic import (
        K_TEMPLATE, make_pose, make_view, render_sphere,
    )
    from picopose_tpu.eval.pipeline import build_bank
    from picopose_tpu.models import PicoPose
    from picopose_tpu.serve import PoseEstimator

    taps = {"dinov2_vitl14": (5, 11, 17, 23), "dinov2_vits14": (1, 3, 5, 7)}[vit]
    radius = 0.05
    rng = np.random.default_rng(0)

    # hermetic bank: synthetic sphere views through the production
    # build_bank (no file IO, no native renderer dependency)
    tviews = [
        make_view(make_pose(az, 0.3 + 0.2 * (i % 3), z=0.45), radius)
        for i, az in enumerate(np.linspace(0, 2 * np.pi, views, endpoint=False))
    ]

    # pre-render query frames (host rendering excluded from latency)
    H, W = 480, 640
    frames_data = []
    for i in range(frames):
        pose = make_pose(0.3 + 0.11 * i, 0.4 + 0.02 * (i % 5), z=0.55)
        rgb, _, mask = render_sphere(K_TEMPLATE, pose, radius, (H, W))
        frames_data.append((
            np.clip(rgb * 255, 0, 255).astype(np.uint8),
            (mask > 0.5).astype(np.uint8),
        ))

    results = {}
    for device_preprocess in (False, True):
        for B in batches:
            est = PoseEstimator(
                vit_type=vit, blocks_to_take=taps, hyp=hyp,
                n_template_view=views, max_batch=B,
                device_preprocess=device_preprocess, seed=0,
            )
            bank = build_bank(
                est.model, est.variables,
                jnp.asarray(np.stack([v.rgb for v in tviews])),
                jnp.asarray(np.stack([v.mask for v in tviews])),
                jnp.asarray(np.stack([v.depth_crop_pts for v in tviews])),
                jnp.asarray(np.stack([v.pose for v in tviews])),
                jnp.asarray(np.stack([v.K for v in tviews])),
                jnp.asarray(np.stack([v.M for v in tviews])),
            )
            est.register_bank(1, bank)

            def one_frame(i):
                rgb, mask = frames_data[i % frames]
                # unique pixels every call (tunnel memoization defeat)
                rgb = rgb.copy()
                rgb[0, 0, 0] = i % 251
                dets = [{"obj_id": 1, "mask": mask}] * B
                t0 = time.perf_counter()
                res = est.estimate(rgb, K_TEMPLATE.astype(np.float32), dets)
                assert len(res) == B and np.isfinite(res[0].t).all()
                return time.perf_counter() - t0

            one_frame(0)  # compile + warm
            one_frame(1)
            lat = sorted(one_frame(i) for i in range(2, frames))
            arm = f"b{B}_{'dev' if device_preprocess else 'host'}_preproc"
            results[arm] = {
                "p50_ms": round(lat[len(lat) // 2] * 1000, 2),
                "p99_ms": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1000, 2),
            }
            del est

    headline = results[f"b1_host_preproc"]["p50_ms"]
    print(
        json.dumps(
            {
                "metric": "serve_frame_latency_p50_ms",
                "value": headline,
                "unit": "ms",
                "vs_baseline": 0.0,
                "vit": vit,
                "hyp": hyp,
                "views": views,
                "arms": results,
            }
        )
    )


def main_bank(views: int = 162, vit: str = "dinov2_vitl14", crop: int = 224):
    """BASELINE stretch config (5): build a full resident TemplateBank with
    the real model (all four taps + cached DPT pyramids) and print the HBM
    budget table plus build time.  For dinov2_vitg14 this exercises the
    SwiGLU giant trunk."""
    import jax
    import jax.numpy as jnp

    from picopose_tpu.eval.pipeline import build_bank
    from picopose_tpu.models import PicoPose

    taps = {
        "dinov2_vitl14": (5, 11, 17, 23),
        "dinov2_vitg14": (9, 19, 29, 39),
        "dinov2_vits14": (1, 3, 5, 7),
    }[vit]
    model = PicoPose(vit_type=vit, blocks_to_take=taps)
    rng = np.random.default_rng(0)
    imgs0 = jnp.zeros((1, crop, crop, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), imgs0, jnp.ones((1, crop, crop)), True
    )
    tem_rgb = jnp.asarray(
        rng.normal(size=(views, crop, crop, 3)), jnp.float32
    )
    tem_mask = jnp.asarray(rng.random((views, crop, crop)) > 0.3, jnp.float32)
    pts3d = jnp.asarray(
        rng.normal(size=(views, 64, 64, 3)).astype(np.float32) * 0.02
        + [0, 0, 0.5]
    )
    pose = np.broadcast_to(np.eye(4, dtype=np.float32), (views, 4, 4)).copy()
    pose[:, 2, 3] = 0.5
    K = np.broadcast_to(
        np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float32),
        (views, 3, 3),
    )
    M = np.broadcast_to(np.eye(3, dtype=np.float32), (views, 3, 3))
    t0 = time.perf_counter()
    bank = build_bank(
        model, variables, tem_rgb, tem_mask, pts3d,
        jnp.asarray(pose), jnp.asarray(K), jnp.asarray(M),
    )
    jax.block_until_ready(bank.feats)
    build_s = time.perf_counter() - t0
    nbytes = {}
    for name, leaf in [
        ("feats", bank.feats), ("dpt", bank.dpt or ()), ("mask", bank.mask),
        ("pts3d", bank.pts3d), ("pose", bank.pose), ("K", bank.K),
        ("M", bank.M),
    ]:
        leaves = leaf if isinstance(leaf, (tuple, list)) else [leaf]
        nbytes[name] = int(sum(x.size * x.dtype.itemsize for x in leaves))
    total_mb = sum(nbytes.values()) / 2**20
    print(
        json.dumps(
            {
                "metric": "resident_bank_hbm_mb",
                "value": round(total_mb, 1),
                "unit": "MiB",
                "vs_baseline": 0.0,
                "vit": vit,
                "views": views,
                "build_seconds": round(build_s, 2),
                "bytes_by_field": nbytes,
            }
        )
    )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["eval", "train", "bank", "latency"], default="eval")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--views", type=int, default=162)
    p.add_argument("--hyp", type=int, default=5)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--vit", type=str, default="dinov2_vitl14")
    p.add_argument(
        "--remat", action="store_true",
        help="ViT activation remat (required for --mode train --batch 32 "
        "on a 16 GB chip)",
    )
    p.add_argument(
        "--topk", type=int, default=None,
        help="stage3_topk serving mode (refine only the k best-matching "
        "hypotheses; changes ranking semantics vs the reference)",
    )
    p.add_argument(
        "--quant", action="store_true",
        help="int8-MXU stage-3 convs (opt-in serving mode; changes numerics)",
    )
    p.add_argument(
        "--no_fuse_xheads", action="store_true",
        help="A/B: run the reference-shaped unfused XHead conv stacks",
    )
    a = p.parse_args()
    if a.mode == "train":
        # BASELINE config (4) is the train step @ batch 32: bench.py
        # --mode train --batch 32 --remat
        main_train(
            min(a.batch, 8) if a.batch == 16 else a.batch, a.iters, a.vit,
            remat=a.remat,
        )
    elif a.mode == "bank":
        main_bank(a.views, a.vit)
    elif a.mode == "latency":
        main_latency(a.vit, a.hyp, min(a.views, 42), frames=a.iters * 2)
    else:
        main(
            a.batch, a.views, a.hyp, a.iters, a.vit,
            stage3_topk=a.topk, quantize_stage3=a.quant,
            fuse_xheads=not a.no_fuse_xheads,
        )
