"""Per-XLA-op breakdown of the faithful eval pipeline on the attached device.

Runs the one-program pipeline twice under jax.profiler, then ranks XLA ops
by total device self-time.  Use it to decide where the next optimization
goes: bench.py reports the product number; this shows the parts.

Usage: python tools/trace_ops.py [--batch 16] [--hyp 5] [--views 162] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(batch: int, hyp: int, views: int, vit: str):
    """(model, variables, batch_data, bank, key) at the requested shapes."""
    import jax
    import jax.numpy as jnp

    from picopose_tpu.eval.pipeline import TemplateBank
    from picopose_tpu.models import PicoPose
    from picopose_tpu.models.dinov2 import VIT_CONFIGS

    taps = {
        "dinov2_vitl14": (5, 11, 17, 23),
        "dinov2_vits14": (1, 3, 5, 7),
    }[vit]
    model = PicoPose(vit_type=vit, blocks_to_take=taps)
    rng = np.random.default_rng(0)
    C = VIT_CONFIGS[vit].embed_dim

    imgs0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), imgs0, jnp.ones((1, 224, 224)), True
    )
    # trace the PRODUCTION program: bench.py and serve.py both pre-cast
    # bf16-consumed weights (utils/precast.py) — without this the trace
    # shows per-fusion f32->bf16 weight converts that don't exist in the
    # benched pipeline and misattributes ~10 ms/batch to convert/copy
    from picopose_tpu.utils.precast import precast_inference_params

    variables = precast_inference_params(variables)
    bank = TemplateBank(
        feats=tuple(
            jnp.asarray(rng.normal(size=(views, 16, 16, C)), jnp.bfloat16)
            for _ in range(4)
        ),
        mask=jnp.asarray(rng.random((views, 224, 224)) > 0.3, jnp.float32),
        pts3d=jnp.asarray(rng.normal(size=(views, 64, 64, 3)), jnp.float32),
        pose=jnp.asarray(
            np.broadcast_to(np.eye(4, dtype=np.float32), (views, 4, 4))
        ),
        K=jnp.asarray(
            np.broadcast_to(
                np.array(
                    [[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float32
                ),
                (views, 3, 3),
            )
        ),
        M=jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (views, 3, 3))
        ),
        dpt=tuple(
            jnp.asarray(rng.normal(size=(views, g, g, 256)), jnp.bfloat16)
            for g in (16, 32, 64)
        ),
    )
    batch_data = {
        "real_rgb": jnp.asarray(
            rng.normal(size=(batch, 224, 224, 3)), jnp.float32
        ),
        "real_mask": jnp.asarray(
            rng.random((batch, 224, 224)) > 0.3, jnp.float32
        ),
        "real_M": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (batch, 3, 3))
        ),
        "real_K": bank.K[:batch],
        "real_pts2d": jnp.asarray(
            rng.uniform(0, 640, size=(batch, 64, 64, 2)), jnp.float32
        ),
    }
    key = jax.random.PRNGKey(1)
    return model, variables, batch_data, bank, key


def build_and_trace(batch: int, hyp: int, views: int, vit: str):
    import jax
    import jax.numpy as jnp

    from picopose_tpu.eval.pipeline import run_batch_jit

    model, variables, batch_data, bank, key = _build(batch, hyp, views, vit)
    out = run_batch_jit(model, variables, batch_data, bank, key, hyp=hyp)
    _ = float(out.inlier_ratio.sum())

    import jax.profiler

    tdir = tempfile.mkdtemp(prefix="trace_ops")
    jax.profiler.start_trace(tdir)
    for i in range(2):
        b = dict(batch_data)
        b["real_rgb"] = batch_data["real_rgb"] + jnp.float32(7 + i * 1e-6)
        o = run_batch_jit(
            model, variables, b, bank, jax.random.PRNGKey(99 + i), hyp=hyp
        )
        _ = float(o.inlier_ratio.sum())
    jax.profiler.stop_trace()
    return sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))[-1]


def dump_fusions(batch: int, hyp: int, views: int, vit: str, names: list[str]):
    """Print the optimized-HLO definitions of the named ops (e.g. from the
    trace's top list) so 'fusion.456' becomes attributable to a model stage."""
    from picopose_tpu.eval.pipeline import run_batch_jit

    model, variables, batch_data, bank, key = _build(batch, hyp, views, vit)
    compiled = run_batch_jit.lower(
        model, variables, batch_data, bank, key, hyp=hyp
    ).compile()
    text = compiled.as_text()
    want = set(names)
    lines = text.splitlines()
    for i, ln in enumerate(lines):
        m = re.search(r"%?([\w.\-]+) = .*(fusion|custom-call)", ln)
        if m and m.group(1) in want:
            print(f"----- {m.group(1)} -----")
            print(ln.strip()[:600])
            # print the called computation's body if present
            cm = re.search(r"calls=%?([\w.\-]+)", ln)
            if cm:
                comp = cm.group(1)
                start = next(
                    (j for j, l2 in enumerate(lines)
                     if re.match(rf"%?{re.escape(comp)}\b", l2.strip())),
                    None,
                )
                if start is not None:
                    for l2 in lines[start : start + 40]:
                        print("   ", l2.rstrip()[:240])
                        if l2.strip() == "}":
                            break
            print()


CATEGORIES = [
    ("pallas corr/warp", re.compile(r"corr|warp|window", re.I)),
    ("pallas attention", re.compile(r"attention|flash", re.I)),
    ("convolution", re.compile(r"^%?convolution|conv\d*\.")),
    ("matmul/dot", re.compile(r"dot|gemm|einsum", re.I)),
    ("scan (pnp/ransac)", re.compile(r"while|scan|body", re.I)),
    ("gather/scatter/sort", re.compile(r"gather|scatter|sort|top-?k", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("convert/copy/transpose", re.compile(r"convert|copy|transpose|bitcast", re.I)),
    ("elementwise fusion", re.compile(r"fusion|loop_", re.I)),
]


def categorize(name: str) -> str:
    for label, pat in CATEGORIES:
        if pat.search(name):
            return label
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hyp", type=int, default=5)
    p.add_argument("--views", type=int, default=162)
    p.add_argument("--vit", default="dinov2_vitl14")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace", help="reuse an existing trace.json.gz")
    p.add_argument(
        "--fusions",
        help="comma-separated op names: print their optimized-HLO "
        "definitions instead of tracing",
    )
    args = p.parse_args()

    if args.fusions:
        dump_fusions(
            args.batch, args.hyp, args.views, args.vit,
            args.fusions.split(","),
        )
        return

    tf = args.trace or build_and_trace(
        args.batch, args.hyp, args.views, args.vit
    )
    trace = json.load(gzip.open(tf))
    meta = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            meta[(e["pid"], e.get("tid"))] = e["args"]["name"]

    per_op = collections.Counter()
    per_cat = collections.Counter()
    n_runs = 2
    for e in trace["traceEvents"]:
        if (
            e.get("ph") == "X"
            and meta.get((e.get("pid"), e.get("tid"))) == "XLA Ops"
        ):
            dur = e.get("dur", 0) / 1e3 / n_runs  # ms per run
            per_op[e["name"]] += dur
            per_cat[categorize(e["name"])] += dur

    total = sum(per_op.values())
    print(f"trace: {tf}")
    print(f"total device-op time: {total:.1f} ms/batch\n")
    print("== by category ==")
    for cat, ms in per_cat.most_common():
        print(f"{ms:9.2f} ms  {100 * ms / total:5.1f}%  {cat}")
    print(f"\n== top {args.top} ops ==")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms:9.2f} ms  {100 * ms / total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
