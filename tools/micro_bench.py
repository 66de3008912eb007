"""Micro-benchmarks for suspect ops on the attached device.

Usage: python tools/micro_bench.py <case> — cases: attn, vit, stage2, convs,
corr, pnp_parts
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_stages import timeit  # noqa: E402


def case_attn():
    import jax
    import jax.numpy as jnp

    from picopose_tpu.ops.attention import attention

    rng = np.random.default_rng(0)
    for B, H, N, D in [(16, 16, 257, 64), (80, 16, 257, 64)]:
        q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
        for impl in ("pallas", "xla"):
            fn = jax.jit(lambda a, b, c, impl=impl: attention(a, b, c, impl=impl))
            t = timeit(fn, q, k, v)
            print(f"attn {impl:7s} B={B:3d} H={H} N={N}: {t:7.1f} ms")


def case_vit():
    import jax
    import jax.numpy as jnp

    from picopose_tpu.models.dinov2 import FeatureExtractor

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 224, 224, 3)), jnp.float32)
    for impl_note, fe in [
        ("bf16", FeatureExtractor("dinov2_vitl14", (5, 11, 17, 23))),
    ]:
        vars_ = fe.init(jax.random.PRNGKey(0), x[:1])
        fn = jax.jit(lambda v, a: fe.apply(v, a))
        t = timeit(fn, vars_, x)
        print(f"ViT-L {impl_note} B=16: {t:7.1f} ms")


def case_stage2():
    import jax
    import jax.numpy as jnp

    from picopose_tpu.models import AffineRegressor
    from picopose_tpu.ops.matching import feature_similarity_volume

    rng = np.random.default_rng(0)
    BH, C = 80, 1024
    tem = jnp.asarray(rng.normal(size=(BH, 16, 16, C)), jnp.bfloat16)
    real = jnp.asarray(rng.normal(size=(BH, 16, 16, C)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((BH, 224, 224)) > 0.3, jnp.float32)

    t = timeit(jax.jit(feature_similarity_volume), tem, real, mask)
    print(f"sim volume BH={BH}: {t:7.1f} ms")

    ar = AffineRegressor()
    vol = feature_similarity_volume(tem, real, mask)
    vars_ = ar.init(jax.random.PRNGKey(0), vol[:1])
    t = timeit(jax.jit(lambda v, x: ar.apply(v, x)), vars_, vol)
    print(f"affine head BH={BH}: {t:7.1f} ms  (input dtype {vol.dtype})")


def case_convs():
    """XHead-like conv stacks at stage-3 shapes, bf16 vs f32."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(512, (3, 3), padding=1)(x))
            x = nn.relu(nn.Conv(256, (3, 3), padding=1)(x))
            return nn.Conv(2, (3, 3), padding=1)(x)

    rng = np.random.default_rng(0)
    for dt in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(rng.normal(size=(80, 64, 64, 640)), dt)
        m = Stack()
        vars_ = m.init(jax.random.PRNGKey(0), x[:1])
        t = timeit(jax.jit(lambda v, a: m.apply(v, a)), vars_, x)
        print(f"XHead-ish conv stack 80x64x64x640 {dt.__name__:9s}: {t:7.1f} ms")


def case_corr():
    import jax
    import jax.numpy as jnp

    from picopose_tpu.ops.corr import corr_lookup

    rng = np.random.default_rng(0)
    BH, g = 80, 64
    f1 = jnp.asarray(rng.normal(size=(BH, g, g, 256)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(BH, g, g, 256)), jnp.bfloat16)
    fl = jnp.asarray(rng.normal(size=(BH, g, g, 2)), jnp.float32)
    fn = jax.jit(lambda a, b, f: corr_lookup(a, b, f, 2, 3))
    t = timeit(fn, f1, f2, fl)
    print(f"corr_lookup 64^2 lvl3 BH={BH}: {t:7.1f} ms")


def case_corr_ab():
    """Packed vs per-row corr-window kernel at the faithful shapes."""
    import jax
    import jax.numpy as jnp

    from picopose_tpu.ops.pallas.corr import corr_window_pallas
    from picopose_tpu.ops.resize import avg_pool2d
    from picopose_tpu.ops.corr import pixel_coords_grid

    rng = np.random.default_rng(0)
    BH, B, g, C, r, lvls, group = 80, 16, 64, 256, 2, 3, 5
    f1 = jnp.asarray(rng.normal(size=(BH, g, g, C)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(B, g, g, C)), jnp.bfloat16)
    fl = jnp.asarray(rng.normal(size=(BH, g, g, 2)) * 3, jnp.float32)

    def lookup(a, b, f, variant):
        P = g * g
        grid = pixel_coords_grid(g, g, f.dtype) + f
        f1r = a.reshape(BH, P, C)
        outs = []
        pooled = b
        for i in range(lvls):
            if i > 0:
                pooled = avg_pool2d(pooled, 2)
            Hp, Wp = pooled.shape[1], pooled.shape[2]
            cen = (grid / (2.0 ** i)).reshape(BH, P, 2)
            outs.append(corr_window_pallas(
                f1r, pooled.reshape(B, Hp * Wp, C), cen, Hp, Wp, r,
                group=group, packed=(variant == "packed"),
                transposed=(variant == "transposed"),
            ))
        return jnp.concatenate(outs, axis=-1)

    for variant in ("per-row", "packed", "transposed"):
        def once(a, f, variant=variant):
            return lookup(a, f2, f, variant).sum()

        def twice(a, f, variant=variant):
            return (lookup(a, f2, f, variant).sum()
                    + lookup(a, f2, f + 0.01, variant).sum())

        t1 = timeit(jax.jit(once), f1, fl)
        t2 = timeit(jax.jit(twice), f1, fl)
        print(f"corr 3-lvl {variant:10s} BH={BH} group={group}: "
              f"1x {t1:.1f}, 2x {t2:.1f} -> per-op {t2 - t1:.1f} ms")


def case_rtt():
    import jax
    import jax.numpy as jnp

    t = timeit(jax.jit(lambda x: x * 2 + 1), jnp.ones((8, 128)))
    print(f"RTT floor: {t:7.1f} ms")




def case_slope():
    """Per-op cost via 1x vs 2x chained applications (removes RTT)."""
    import jax
    import jax.numpy as jnp

    from picopose_tpu.models import AffineRegressor
    from picopose_tpu.ops.matching import feature_similarity_volume
    from picopose_tpu.models.dinov2 import FeatureExtractor

    rng = np.random.default_rng(0)
    BH, C = 80, 1024
    tem = jnp.asarray(rng.normal(size=(BH, 16, 16, C)), jnp.bfloat16)
    real = jnp.asarray(rng.normal(size=(BH, 16, 16, C)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((BH, 224, 224)) > 0.3, jnp.float32)
    vol = feature_similarity_volume(tem, real, mask)

    ar = AffineRegressor()
    vars_ = ar.init(jax.random.PRNGKey(0), vol[:1])

    def once(v, x):
        return ar.apply(v, x)

    def twice(v, x):
        t1, s1, i1 = ar.apply(v, x)
        t2, s2, i2 = ar.apply(v, x + 0.001)
        return t1 + t2, s1 + s2, i1 + i2

    t1 = timeit(jax.jit(once), vars_, vol)
    t2 = timeit(jax.jit(twice), vars_, vol)
    print(f"affine head: 1x {t1:.1f} ms, 2x {t2:.1f} ms -> per-op {t2 - t1:.1f} ms")

    def vonce(v, x):
        return feature_similarity_volume(x, real, mask)

    def vtwice(v, x):
        return (
            feature_similarity_volume(x, real, mask)
            + feature_similarity_volume(x + 0.01, real, mask)
        )

    t1 = timeit(jax.jit(vonce), vars_, tem)
    t2 = timeit(jax.jit(vtwice), vars_, tem)
    print(f"sim volume: 1x {t1:.1f} ms, 2x {t2:.1f} ms -> per-op {t2 - t1:.1f} ms")

    fe = FeatureExtractor("dinov2_vitl14", (5, 11, 17, 23))
    x = jnp.asarray(rng.normal(size=(16, 224, 224, 3)), jnp.float32)
    fvars = fe.init(jax.random.PRNGKey(0), x[:1])

    def fonce(v, a):
        return fe.apply(v, a)[-1]

    def ftwice(v, a):
        return fe.apply(v, a)[-1] + fe.apply(v, a + 0.001)[-1]

    t1 = timeit(jax.jit(fonce), fvars, x)
    t2 = timeit(jax.jit(ftwice), fvars, x)
    print(f"ViT-L B=16: 1x {t1:.1f} ms, 2x {t2:.1f} ms -> per-op {t2 - t1:.1f} ms")




def case_slope2():
    """Slope timing for flow decoder, corr lookup, DPT, PnP."""
    import jax
    import jax.numpy as jnp

    from picopose_tpu.models import DPTHead, FlowDecoder, PicoPose
    from picopose_tpu.ops.corr import corr_lookup
    from picopose_tpu.ops.pnp import ransac_pnp

    rng = np.random.default_rng(0)
    BH = 80

    fd = FlowDecoder(num_levels=3, radius=4)
    tem = [jnp.asarray(rng.normal(size=(BH, g, g, 256)), jnp.bfloat16) for g in (16, 32, 64)]
    real = [jnp.asarray(rng.normal(size=(BH, g, g, 256)), jnp.bfloat16) for g in (16, 32, 64)]
    fl0 = jnp.asarray(rng.normal(size=(BH, 16, 16, 2)), jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(BH, 16, 16, 1)), jnp.float32)
    fvars = fd.init(jax.random.PRNGKey(0), [t[:1] for t in tem], [r[:1] for r in real], fl0[:1], c0[:1], False)

    def fonce(v, f):
        fs, cs = fd.apply(v, tem, real, f, c0, False)
        return fs[-1].sum() + cs[-1].sum()

    def ftwice(v, f):
        fs, cs = fd.apply(v, tem, real, f, c0, False)
        fs2, cs2 = fd.apply(v, tem, real, f + 0.01, c0, False)
        return fs[-1].sum() + cs[-1].sum() + fs2[-1].sum() + cs2[-1].sum()

    t1 = timeit(jax.jit(fonce), fvars, fl0)
    t2 = timeit(jax.jit(ftwice), fvars, fl0)
    print(f"flow decoder BH=80: 1x {t1:.1f}, 2x {t2:.1f} -> per-op {t2 - t1:.1f} ms")

    f1 = jnp.asarray(rng.normal(size=(BH, 64, 64, 256)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(BH, 64, 64, 256)), jnp.bfloat16)
    fl = jnp.asarray(rng.normal(size=(BH, 64, 64, 2)), jnp.float32)

    def conce(a, f):
        return corr_lookup(a, f2, f, 2, 3).sum()

    def ctwice(a, f):
        return corr_lookup(a, f2, f, 2, 3).sum() + corr_lookup(a, f2, f + 0.01, 2, 3).sum()

    t1 = timeit(jax.jit(conce), f1, fl)
    t2 = timeit(jax.jit(ctwice), f1, fl)
    print(f"corr_lookup 64^2 l3 BH=80: 1x {t1:.1f}, 2x {t2:.1f} -> per-op {t2 - t1:.1f} ms")

    G = 64
    pts3 = jnp.asarray(rng.normal(size=(BH, G * G, 3)), jnp.float32) * 0.05
    pts2 = jnp.asarray(rng.uniform(0, 640, size=(BH, G * G, 2)), jnp.float32)
    Kb = jnp.asarray(np.broadcast_to(np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float32), (BH, 3, 3)))
    valid = jnp.asarray(rng.random((BH, G * G)) > 0.5)
    key = jax.random.PRNGKey(0)

    def ponce(a, b):
        r = ransac_pnp(a, b, Kb, valid, key, iters=150)
        return r.R.sum() + r.t.sum() + r.inlier_ratio.sum()

    def ptwice(a, b):
        r = ransac_pnp(a, b, Kb, valid, key, iters=150)
        r2 = ransac_pnp(a + 1e-4, b, Kb, valid, key, iters=150)
        return r.R.sum() + r2.R.sum() + r.inlier_ratio.sum() + r2.inlier_ratio.sum()

    t1 = timeit(jax.jit(ponce), pts3, pts2)
    t2 = timeit(jax.jit(ptwice), pts3, pts2)
    print(f"ransac_pnp 150it BH=80: 1x {t1:.1f}, 2x {t2:.1f} -> per-op {t2 - t1:.1f} ms")

    model = PicoPose()
    dpt = DPTHead(in_channels=1024)
    feats = [jnp.asarray(rng.normal(size=(16, 16, 16, 1024)), jnp.bfloat16) for _ in range(4)]
    dvars = dpt.init(jax.random.PRNGKey(0), [f[:1] for f in feats], False)

    def donce(v, f0):
        return sum(x.sum() for x in dpt.apply(v, [f0] + feats[1:], False))

    def dtwice(v, f0):
        a = sum(x.sum() for x in dpt.apply(v, [f0] + feats[1:], False))
        b = sum(x.sum() for x in dpt.apply(v, [f0 + 0.01] + feats[1:], False))
        return a + b

    t1 = timeit(jax.jit(donce), dvars, feats[0])
    t2 = timeit(jax.jit(dtwice), dvars, feats[0])
    print(f"query DPT B=16: 1x {t1:.1f}, 2x {t2:.1f} -> per-op {t2 - t1:.1f} ms")


def case_ln():
    """LayerNorm stats on VPU (flax kLoop reduce) vs MXU dots, chained x24
    as in a ViT-L forward.  Slope form (1x vs 2x chains) removes RTT."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from picopose_tpu.models.dinov2 import MXULayerNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 257, 1024)), jnp.bfloat16)

    for label, mod in [
        ("flax nn.LayerNorm", nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)),
        ("MXULayerNorm", MXULayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)),
    ]:
        v = mod.init(jax.random.PRNGKey(0), x)

        def chain(v, a, reps):
            for i in range(reps):
                # +a breaks CSE; mimics LN-on-residual-stream dataflow
                a = mod.apply(v, a) + a * jnp.bfloat16(0.999)
            return a

        t1 = timeit(jax.jit(lambda v, a: chain(v, a, 24)), v, x)
        t2 = timeit(jax.jit(lambda v, a: chain(v, a, 48)), v, x)
        print(
            f"{label:18s} 24x {t1:6.2f} ms, 48x {t2:6.2f} ms -> "
            f"per-LN {(t2 - t1) / 24 * 1000:6.1f} us"
        )


if __name__ == "__main__":
    for c in sys.argv[1:] or ["rtt"]:
        globals()[f"case_{c}"]()
