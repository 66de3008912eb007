"""On-device gradient parity for the Pallas custom-VJP ops.

Round 1's lesson (docs/PERF.md): an opaque Pallas forward makes TPU
training fail in ways CPU-mesh tests can never catch — and even with a
custom VJP wired, only a DEVICE run proves the compiled forward/backward
pair is consistent.  This script runs on the attached chip:

  1. attention: grad of a scalar loss through the Pallas path vs the XLA
     path (forward uses the fused kernel, backward rematerializes XLA);
  2. corr_lookup: same check through the fused window kernel.

Both checks compare VALUES and GRADS between impl='pallas' and impl='xla'
under bf16 forward dtypes (the production training configuration).

Run: python tools/device_grad_check.py      (~2 min incl. compiles)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_attention():
    import jax
    import jax.numpy as jnp

    from picopose_tpu.ops.attention import attention

    rng = np.random.default_rng(0)
    B, H, N, D = 2, 4, 257, 64
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)

    def loss(impl):
        def f(q, k, v):
            o = attention(q, k, v, impl=impl)
            return (o.astype(jnp.float32) ** 2).sum()
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    (vp, gp) = loss("pallas")(q, k, v)
    (vx, gx) = loss("xla")(q, k, v)
    dv = abs(float(vp) - float(vx)) / max(abs(float(vx)), 1e-9)
    dgs = [
        float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
        for a, b in zip(gp, gx)
    ]
    scale = float(jnp.abs(gx[0].astype(jnp.float32)).max())
    print(f"attention: value rel diff {dv:.2e}, grad max abs diffs "
          f"{[f'{d:.3e}' for d in dgs]} (grad scale {scale:.2e})")
    assert dv < 2e-2 and all(d < 0.35 * scale for d in dgs), "attention grad mismatch"


def check_corr():
    import jax
    import jax.numpy as jnp

    from picopose_tpu.ops.corr import corr_lookup

    rng = np.random.default_rng(0)
    B, g, C, r, L = 4, 32, 256, 2, 2
    f1 = jnp.asarray(rng.normal(size=(B, g, g, C)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(B, g, g, C)), jnp.bfloat16)
    fl = jnp.asarray(rng.normal(size=(B, g, g, 2)) * 2, jnp.float32)

    def loss(impl):
        def f(f1, f2, fl):
            o = corr_lookup(f1, f2, fl, r, L, impl=impl)
            return (o.astype(jnp.float32) ** 2).sum()
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    (vp, gp) = loss("pallas")(f1, f2, fl)
    (vx, gx) = loss("xla")(f1, f2, fl)
    dv = abs(float(vp) - float(vx)) / max(abs(float(vx)), 1e-9)
    oks = []
    for a, b in zip(gp, gx):
        a = a.astype(jnp.float32); b = b.astype(jnp.float32)
        scale = float(jnp.abs(b).max())
        d = float(jnp.abs(a - b).max())
        oks.append((d, scale))
    print(f"corr_lookup: value rel diff {dv:.2e}, grad (diff, scale) pairs "
          f"{[(f'{d:.3e}', f'{s:.2e}') for d, s in oks]}")
    # the pallas forward keeps corr fp32 through the window while the xla
    # path rounds to bf16 — value/grad differences are bf16-epsilon scale
    assert dv < 2e-2 and all(d < 0.35 * s for d, s in oks), "corr grad mismatch"


def main():
    import jax

    print(f"device: {jax.devices()[0]}")
    check_attention()
    check_corr()
    print("device grad checks OK")


if __name__ == "__main__":
    main()
