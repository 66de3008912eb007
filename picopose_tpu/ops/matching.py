"""Stage-1/2 feature matching ops: similarity volume + template selection.

Rebuilds utils/matching.py (matching_features_similarity at :6-26,
matching_templates at :29-69) on NHWC features with channel-last volumes.

Two reference quirks are preserved deliberately, because trained weights /
selection behavior depend on them (documented here so they don't read as
bugs):

  * the similarity volume's query-spatial unflattening is TRANSPOSED
    (reference rearrange "b (w h) c -> b c h w", matching.py:25): the volume
    at spatial (h, w) holds the similarities of query patch (row=w, col=h).
    We mirror it so stage-2 head weights are portable 1:1 from reference
    checkpoints.
  * matching_templates' mutual-consistency mask multiplies a (b, n, t) query
    mask elementwise with (b, n, s)-indexed argmax-validity terms
    (matching.py:54-60) — i.e. index i is simultaneously interpreted as a
    query patch and a template patch.  Faithfully reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _mask_to_grid(mask: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """(B, Hm, Wm) crop mask -> (B, h, w) by nearest downsample (the
    reference's default-mode F.interpolate, matching.py:16,38)."""
    from picopose_tpu.ops.resize import resize_nearest

    return resize_nearest(mask, hw)


def feature_similarity_volume(
    tem_feat: jnp.ndarray,
    query_feat: jnp.ndarray,
    tem_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked cosine-similarity volume between one template and the query.

    Args:
      tem_feat:   (B, h, w, C) template features (stage-1 last level).
      query_feat: (B, h, w, C) query features.
      tem_mask:   (B, Hm, Wm) template crop mask (any resolution).

    Returns (B, h, w, h*w): channel s = template patch (row-major); spatial
    (h, w) = query patch (row=w, col=h) — see module docstring.  Values are
    relu(cos-sim * tem_mask[s]).

    Equivalent of matching_features_similarity (utils/matching.py:6-26).
    """
    B, h, w, C = tem_feat.shape
    q = l2_normalize(query_feat, axis=-1).reshape(B, h * w, C)
    t = l2_normalize(tem_feat, axis=-1).reshape(B, h * w, C)
    m = _mask_to_grid(tem_mask, (h, w)).reshape(B, 1, h * w)
    sim = jnp.einsum("btc,bsc->bts", q, t, precision="highest")  # t = query patch, s = template
    sim = sim * m
    sim = jnp.maximum(sim, 0.0)
    # transposed unflattening of the query index: t == w*h_dim + h
    sim = sim.reshape(B, w, h, h * w)  # (B, w, h, S)
    return jnp.swapaxes(sim, 1, 2)  # (B, h, w, S)


def match_templates(
    tem_feats: jnp.ndarray,
    query_feat: jnp.ndarray,
    query_mask: jnp.ndarray,
    topk: int = 5,
    view_chunk: int = 8,
    impl: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Score all template views against the query; return top-k (scores, ids).

    Args:
      tem_feats:  (N, h, w, C) shared bank, or (B, N, h, w, C) per-item
                  cached stage-1 features.
      query_feat: (B, h, w, C).
      query_mask: (B, Hm, Wm) query crop mask.
      impl:       'auto' (Pallas kernel on TPU for shared banks) | 'xla'.

    Per view: sim[t, s] = cos(query[t], tem[s]) * query_mask[t]; score =
    sum_t max_s sim[t, s] * valid[t] / (h*w)^2 where valid combines the query
    mask with the reference's argmax-nonzero consistency terms
    (utils/matching.py:47-67).

    Equivalent of matching_templates (utils/matching.py:29-69).  The view
    axis is processed in `view_chunk`-sized lax.map slices: the full
    (B, N, S, S) similarity tensor is ~2.7 GB fp32 at B=16, N=162 — far too
    big to materialize on a 16 GB chip next to the model; only per-view
    SCORES survive each chunk.
    """
    shared_bank = tem_feats.ndim == 4  # (N, h, w, C): one bank for the batch
    if shared_bank:
        N, h, w, C = tem_feats.shape
    else:
        _, N, h, w, C = tem_feats.shape
    B = query_feat.shape[0]
    S = h * w
    q = l2_normalize(query_feat.astype(jnp.float32), axis=-1).reshape(B, S, C)
    qm = _mask_to_grid(query_mask, (h, w)).reshape(B, 1, S)
    qvalid = qm > 0  # (B, 1, S)
    t = l2_normalize(tem_feats.astype(jnp.float32), axis=-1)

    if shared_bank and impl != "xla" and jax.devices()[0].platform == "tpu":
        import os

        from picopose_tpu.ops.pallas.matching import match_scores_pallas

        q_k, t_k = q, t.reshape(N, S, C)
        if os.environ.get("PICOPOSE_MATCH_INT8", "0") == "1":
            pass  # int8 quantizes from the f32 forms below
        elif (
            tem_feats.dtype == jnp.bfloat16
            and os.environ.get("PICOPOSE_MATCH_FP32", "0") != "1"
        ):
            # Production banks store bf16 features; after the f32-accurate
            # normalization above, rounding the operands back to bf16 runs
            # the S x S x C cosine matmul at the bf16 MXU rate (the f32 form
            # measured 3.9 ms/batch at ~45% MFU in the device trace).  Score
            # perturbation is ~0.4%/sqrt(C) ~ 1e-4 relative — an order of
            # magnitude below the int8 mode whose paired AR delta measured
            # +0.0001 +/- 0.0063 (docs/PARITY.md).  PICOPOSE_MATCH_FP32=1
            # restores the fp32-operand kernel.
            q_k, t_k = q_k.astype(jnp.bfloat16), t_k.astype(jnp.bfloat16)
        if os.environ.get("PICOPOSE_MATCH_INT8", "0") == "1":
            # OPT-IN (PICOPOSE_MATCH_INT8=1): normalized features live in
            # [-1, 1]; symmetric int8 at scale 127 costs <0.5% per element
            # and runs the S x S x C matmul on the int8 MXU with a quarter
            # of the bank DMA.  Off by default: ~0.005 absolute score error
            # can flip top-k view selection on near-ties vs the reference's
            # fp32 cosine scores, and the A/B on real BOP data hasn't been
            # run (matching is ~2 ms/batch device-side, so the win is DMA
            # headroom, not time — docs/PARITY.md records the trade).
            q_k = jnp.clip(jnp.round(q_k * 127.0), -127, 127).astype(jnp.int8)
            t_k = jnp.clip(jnp.round(t_k * 127.0), -127, 127).astype(jnp.int8)
        sim_avg = match_scores_pallas(q_k, qm.reshape(B, S), t_k)
        return jax.lax.top_k(sim_avg, topk)

    pad = (-N) % view_chunk
    t = t.reshape((N, S, C) if shared_bank else (B, N, S, C))
    if pad:
        zshape = (pad, S, C) if shared_bank else (B, pad, S, C)
        t = jnp.concatenate([t, jnp.zeros(zshape, t.dtype)], axis=-3)
    n_chunks = (N + pad) // view_chunk
    if shared_bank:
        t = t.reshape(n_chunks, view_chunk, S, C)
        sim_eq = "btc,nsc->bnts"
    else:
        t = jnp.moveaxis(
            t.reshape(B, n_chunks, view_chunk, S, C), 1, 0
        )  # (n_chunks, B, chunk, S, C)
        sim_eq = "btc,bnsc->bnts"

    def score_chunk(tc):
        sim = jnp.einsum(sim_eq, q, tc, precision="highest")
        sim = sim * qm[..., None]
        score_t2s = sim.max(axis=3)      # (B, c, t)
        idx_t2s = sim.argmax(axis=3)
        idx_s2t = sim.argmax(axis=2)     # (B, c, s)
        mask_all = (
            qvalid & (idx_s2t != 0) & (idx_t2s != 0)
        ).astype(sim.dtype)              # aligned-index product, see docstring
        any_valid = mask_all.sum(axis=2) > 0
        # divisor is num_patches**2 == h*w == S (utils/matching.py:37,65-67)
        return jnp.where(
            any_valid, (score_t2s * mask_all).sum(axis=2) / S, 0.0
        )  # (B, c)

    scores_all = jax.lax.map(score_chunk, t)  # (n_chunks, B, chunk)
    sim_avg = jnp.moveaxis(scores_all, 0, 1).reshape(B, N + pad)[:, :N]
    scores, ids = jax.lax.top_k(sim_avg, topk)
    return scores, ids
