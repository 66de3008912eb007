"""Per-stage timing of the eval pipeline on the attached device.

Each stage is jitted separately and timed with unique inputs + a dependent
scalar fetch (the tunnel memoizes identical executions — bench.py documents
the discipline).  Standalone stage times sum above the fused end-to-end
latency (XLA overlaps stages inside one program); use this to RANK stages,
bench.py to measure the product.

Usage: python tools/profile_stages.py [--batch 16] [--hyp 5] [--views 162]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _checksum(out) -> float:
    """Host fetch of a scalar depending on every output leaf — the only sync
    the tunnel cannot satisfy from its memo cache."""
    import jax
    import jax.numpy as jnp

    tot = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            tot += float(jnp.sum(leaf.astype(jnp.float32)))
    return tot


def timeit(fn, *args, iters=6, **kw):
    """Median latency with UNIQUE inputs per iteration + dependent fetch.

    Every inexact-float array argument is perturbed by i*1e-6 each round so
    the tunnel's execution memoization can never hit.
    """
    import jax.numpy as jnp

    def eps(dtype, i):
        # must exceed the dtype's epsilon at O(1) values or bf16 rounds the
        # perturbation away and the tunnel memo-hits anyway
        step = 0.05 if dtype == jnp.bfloat16 else 1e-6
        return jnp.asarray((i + 1) * step, dtype)

    def perturbed(i):
        a = []
        for arg in args:
            if (
                hasattr(arg, "dtype")
                and jnp.issubdtype(arg.dtype, jnp.inexact)
                and arg.ndim > 0
            ):
                a.append(arg + eps(arg.dtype, i))
            elif isinstance(arg, (list, tuple)) and arg and hasattr(arg[0], "dtype"):
                a.append(type(arg)(x + eps(x.dtype, i) for x in arg))
            else:
                a.append(arg)
        return a

    _checksum(fn(*perturbed(-1), **kw))  # compile + warmup
    lat = []
    for i in range(iters):
        a = perturbed(i)
        t0 = time.perf_counter()
        _checksum(fn(*a, **kw))
        lat.append(time.perf_counter() - t0)
    return sorted(lat)[len(lat) // 2] * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hyp", type=int, default=5)
    p.add_argument("--views", type=int, default=162)
    p.add_argument("--vit", default="dinov2_vitl14")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from picopose_tpu.models import PicoPose
    from picopose_tpu.models.dinov2 import VIT_CONFIGS
    from picopose_tpu.ops.corr import corr_lookup
    from picopose_tpu.ops.matching import match_templates
    from picopose_tpu.ops.pnp import ransac_pnp

    taps = {"dinov2_vitl14": (5, 11, 17, 23), "dinov2_vits14": (1, 3, 5, 7)}[args.vit]
    model = PicoPose(vit_type=args.vit, blocks_to_take=taps)
    rng = np.random.default_rng(0)
    B, H, V = args.batch, args.hyp, args.views
    BH = B * H
    C = VIT_CONFIGS[args.vit].embed_dim

    imgs0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), imgs0, jnp.ones((1, 224, 224)), True
    )

    rgb = jnp.asarray(rng.normal(size=(B, 224, 224, 3)), jnp.float32)
    feats_fn = jax.jit(lambda v, x: model.apply(v, x, method=model.features))
    t_vit = timeit(feats_fn, variables, rgb)
    feats = feats_fn(variables, rgb)

    bank_last = jnp.asarray(rng.normal(size=(V, 16, 16, C)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, 224, 224)) > 0.3, jnp.float32)
    match_fn = jax.jit(lambda b, f, m: match_templates(b, f, m, topk=H))
    t_match = timeit(match_fn, bank_last, feats[-1], mask)

    tem_last = jnp.asarray(rng.normal(size=(BH, 16, 16, C)), feats[-1].dtype)
    real_last = jnp.tile(feats[-1][:, None], (1, H, 1, 1, 1)).reshape(BH, 16, 16, C)
    tem_mask224 = jnp.asarray(rng.random((BH, 224, 224)) > 0.3, jnp.float32)
    stage2_fn = jax.jit(
        lambda v, a, b, m: model.apply(v, a, b, m, method=model.stage2)
    )
    t_stage2 = timeit(stage2_fn, variables, tem_last, real_last, tem_mask224)

    dpt_fn = jax.jit(lambda v, f: model.apply(v, list(f), method=model.dpt))
    t_dpt_q = timeit(dpt_fn, variables, feats)  # query side at B
    real_pyr = dpt_fn(variables, feats)

    tem_pyr = [
        jnp.asarray(rng.normal(size=(BH, g, g, 256)), jnp.bfloat16)
        for g in (16, 32, 64)
    ]
    real_pyr_t = [
        jnp.tile(p[:, None], (1, H, 1, 1, 1)).reshape(BH, *p.shape[1:]).astype(jnp.bfloat16)
        for p in real_pyr
    ]
    init_flow = jnp.asarray(rng.normal(size=(BH, 16, 16, 2)), jnp.float32)
    init_cert = jnp.asarray(rng.normal(size=(BH, 16, 16, 1)), jnp.float32)
    flow_fn = jax.jit(
        lambda v, tp, rp, f, c: model.apply(v, tp, rp, f, c, method=model.flow)
    )
    t_flow = timeit(flow_fn, variables, tem_pyr, real_pyr_t, init_flow, init_cert)

    # corr lookup alone, per decoder level
    t_corr = {}
    for lvl, g in enumerate((16, 32, 64)):
        f1 = jnp.asarray(rng.normal(size=(BH, g, g, 256)), jnp.bfloat16)
        f2 = jnp.asarray(rng.normal(size=(BH, g, g, 256)), jnp.bfloat16)
        fl = jnp.asarray(rng.normal(size=(BH, g, g, 2)), jnp.float32)
        cfn = jax.jit(
            lambda a, b, f, lvl=lvl: corr_lookup(a, b, f, 2, lvl + 1)
        )
        t_corr[g] = timeit(cfn, f1, f2, fl)

    # PnP alone
    G = 64
    pts3 = jnp.asarray(rng.normal(size=(BH, G * G, 3)), jnp.float32) * 0.05
    pts2 = jnp.asarray(rng.uniform(0, 640, size=(BH, G * G, 2)), jnp.float32)
    Kb = jnp.asarray(
        np.broadcast_to(
            np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float32),
            (BH, 3, 3),
        )
    )
    valid = jnp.asarray(rng.random((BH, G * G)) > 0.5)
    pnp_fn = jax.jit(
        lambda a, b, k, v: ransac_pnp(a, b, k, v, jax.random.PRNGKey(0), iters=150)
    )
    t_pnp = timeit(pnp_fn, pts3, pts2, Kb, valid)

    # tunnel round-trip floor: a trivial dependent fetch
    tiny = jnp.ones((8, 128), jnp.float32)
    t_rtt = timeit(jax.jit(lambda x: x * 2.0 + 1.0), tiny)

    print(f"device: {jax.devices()[0].platform} x{len(jax.devices())}")
    print(f"dispatch+fetch RTT floor:    {t_rtt:8.1f} ms (subtract from rows)")
    print(f"ViT features      (B={B}):   {t_vit:8.1f} ms")
    print(f"match {V} views   (B={B}):   {t_match:8.1f} ms")
    print(f"stage2 affine     (BH={BH}): {t_stage2:8.1f} ms")
    print(f"query DPT         (B={B}):   {t_dpt_q:8.1f} ms")
    print(f"flow decoder      (BH={BH}): {t_flow:8.1f} ms")
    for g, t in t_corr.items():
        print(f"  corr_lookup {g:3d}^2 lvl{int(np.log2(g//16))+1}:  {t:8.1f} ms")
    print(f"RANSAC-PnP 150it  (BH={BH}): {t_pnp:8.1f} ms")


if __name__ == "__main__":
    main()
