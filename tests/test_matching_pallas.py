"""Pallas matching kernel vs the XLA implementation (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from picopose_tpu.ops.matching import l2_normalize, match_templates
from picopose_tpu.ops.pallas.matching import match_scores_pallas
from picopose_tpu.ops.resize import resize_nearest


def test_pallas_scores_match_xla(rng):
    B, N, h, C = 2, 6, 16, 64
    S = h * h
    tem = rng.normal(size=(N, h, h, C)).astype(np.float32)
    qry = rng.normal(size=(B, h, h, C)).astype(np.float32)
    mask = (rng.random((B, 224, 224)) > 0.4).astype(np.float32)

    # XLA reference scores via the public API (forced xla impl)
    scores_x, ids_x = match_templates(
        jnp.asarray(tem), jnp.asarray(qry), jnp.asarray(mask), topk=N, impl="xla"
    )

    q = l2_normalize(jnp.asarray(qry), axis=-1).reshape(B, S, C)
    qm = resize_nearest(jnp.asarray(mask), (h, h)).reshape(B, S)
    t = l2_normalize(jnp.asarray(tem), axis=-1).reshape(N, S, C)
    scores_p = match_scores_pallas(q, qm, t, interpret=True)

    # compare full score tables (reorder xla topk=N output by ids)
    table_x = np.zeros((B, N), np.float32)
    for b in range(B):
        table_x[b, np.asarray(ids_x[b])] = np.asarray(scores_x[b])
    np.testing.assert_allclose(np.asarray(scores_p), table_x, atol=1e-5)


def test_pallas_int8_scores_close_to_fp32(rng):
    """The quantized kernel path: scores within int8-quantization tolerance
    of the fp32 table, and the top-1 view stable when its margin is real."""
    B, N, h, C = 2, 8, 16, 64
    S = h * h
    tem = rng.normal(size=(N, h, h, C)).astype(np.float32)
    qry = rng.normal(size=(B, h, h, C)).astype(np.float32)
    mask = (rng.random((B, 224, 224)) > 0.4).astype(np.float32)

    q = l2_normalize(jnp.asarray(qry), axis=-1).reshape(B, S, C)
    qm = resize_nearest(jnp.asarray(mask), (h, h)).reshape(B, S)
    t = l2_normalize(jnp.asarray(tem), axis=-1).reshape(N, S, C)
    ref = np.asarray(match_scores_pallas(q, qm, t, interpret=True))

    qi = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
    ti = jnp.clip(jnp.round(t * 127.0), -127, 127).astype(jnp.int8)
    got = np.asarray(match_scores_pallas(qi, qm, ti, interpret=True))

    np.testing.assert_allclose(got, ref, atol=5e-3)
    for b in range(B):
        order = np.argsort(-ref[b])
        if ref[b, order[0]] - ref[b, order[1]] > 2e-2:
            assert got[b].argmax() == order[0]
