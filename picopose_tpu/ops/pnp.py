"""Batched, fully on-device RANSAC-PnP (replaces cv2.solvePnPRansac).

The reference leaves pose solving to OpenCV on the host: per instance x per
hypothesis, copy correspondences to CPU and run EPnP+RANSAC serially
(utils/pose_recovery.py:68-105, run_test.py:168-186) — SURVEY.md ranks this
the #4 hot loop and the serial bottleneck of evaluation.  Here the whole
solver is jit-compiled XLA, vmapped over (batch x hypothesis), so poses come
off the chip with everything else in one program:

  1. hypothesis generation: `iters` samples of 6 valid correspondences
     (Gumbel-top-k over the validity mask — no rejection loops);
  2. minimal solve: Hartley-normalized DLT (12x12 eigendecomposition) +
     orthogonal Procrustes onto SO(3);
  3. scoring: pixel-space reprojection error, threshold `reproj_px`
     (reference uses 2 px, 150 iterations — pose_recovery.py:93-95);
  4. refit: weighted DLT on the best hypothesis' inliers, then a few
     Gauss-Newton iterations on SE(3) (left-multiplicative twist updates)
     — this replaces OpenCV's refinement and is what closes the accuracy
     gap to EPnP;
  5. fallback: identity pose + success=False when < `min_points` valid
     correspondences or the solution degenerates (mirrors the reference's
     try/except at pose_recovery.py:91-104).

Everything is fp32 with explicit highest-precision matmuls (pose math must
not ride the bf16 MXU default).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_EINSUM = functools.partial(jnp.einsum, precision="highest")


class PnPResult(NamedTuple):
    R: jnp.ndarray          # (..., 3, 3)
    t: jnp.ndarray          # (..., 3)
    inlier_ratio: jnp.ndarray  # (...,)
    success: jnp.ndarray    # (...,) bool


def _hat(w: jnp.ndarray) -> jnp.ndarray:
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def _exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    W = _hat(w)
    W2 = _EINSUM("...ij,...jk->...ik", W, W)
    theta = jnp.maximum(theta, 1e-12)
    A = jnp.sin(theta) / theta
    B = (1.0 - jnp.cos(theta)) / (theta**2)
    return jnp.eye(3, dtype=w.dtype) + A * W + B * W2


def _inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    adj = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
        ],
        -2,
    )
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return adj / det[..., None, None]


def _det3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form determinant of (..., 3, 3) — jnp.linalg.det lowers to an
    LU custom call on TPU, which neither fuses nor vectorizes well inside
    the 12k-hypothesis vmap."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _cholesky_small(A: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky for small static n (<= 12 here).

    Pure jnp ops (static slices + elementwise), so it fuses into the
    surrounding program instead of hitting the TPU linalg custom call per
    vmapped instance — those custom calls were ~20 ms/batch of the whole
    pipeline.  NaN-propagation on non-SPD inputs is preserved (sqrt of a
    negative pivot), which the degenerate-sample detection relies on.
    """
    n = A.shape[-1]
    cols = []
    for j in range(n):
        # a_j column below the diagonal, minus already-computed L columns
        s = A[..., j:, j]
        for k in range(j):
            # L[j:, k] * L[j, k]: cols[k][m] holds L[k+m, k]
            s = s - cols[k][..., j - k:] * cols[k][..., j - k:j - k + 1]
        d = jnp.sqrt(s[..., :1])
        cols.append(jnp.concatenate([d, s[..., 1:] / d], axis=-1))
    L = jnp.zeros_like(A)
    for j, c in enumerate(cols):
        L = L.at[..., j:, j].set(c)
    return L


def _cho_solve_small(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b by unrolled forward/back substitution."""
    n = L.shape[-1]
    y = []
    for i in range(n):
        acc = b[..., i]
        for k in range(i):
            acc = acc - L[..., i, k] * y[k]
        y.append(acc / L[..., i, i])
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[..., k, i] * x[k]
        x[i] = acc / L[..., i, i]
    return jnp.stack(x, axis=-1)


def _normalize_points(pts: jnp.ndarray, w: jnp.ndarray, dim: int):
    """Hartley normalization: zero-centroid, mean norm sqrt(dim)."""
    wsum = jnp.maximum(w.sum(-1, keepdims=True), 1e-6)
    centroid = (pts * w[..., None]).sum(-2) / wsum
    centered = pts - centroid[..., None, :]
    scale = (jnp.linalg.norm(centered, axis=-1) * w).sum(-1) / wsum[..., 0]
    s = jnp.sqrt(float(dim)) / jnp.maximum(scale, 1e-9)
    return centered * s[..., None, None], centroid, s


def _weighted_dlt(pts3d, uv, w):
    """Weighted DLT pose from (N,3) model points and (N,2) NORMALIZED image
    coords with weights (N,).  Returns (R, t, ok)."""
    X, c3, s3 = _normalize_points(pts3d, w, 3)
    U, c2, s2 = _normalize_points(uv, w, 2)
    N = X.shape[-2]
    ones = jnp.ones((N, 1), X.dtype)
    zeros = jnp.zeros((N, 4), X.dtype)
    Xh = jnp.concatenate([X, ones], -1)  # (N, 4)
    u, v = U[..., :1], U[..., 1:2]
    row1 = jnp.concatenate([Xh, zeros, -u * Xh], -1)  # (N, 12)
    row2 = jnp.concatenate([zeros, Xh, -v * Xh], -1)
    A = jnp.concatenate([row1 * w[..., None], row2 * w[..., None]], -2)  # (2N, 12)
    AtA = _EINSUM("ni,nj->ij", A, A)
    # Smallest eigenvector of AtA by shifted-Cholesky inverse iteration:
    # lambda_min ~ 0 while lambda_2 is O(1) after Hartley normalization, so
    # 3 solves converge — and a 12x12 Cholesky + triangular solves is far
    # cheaper on TPU than the Jacobi eigh this replaces (eigh dominated the
    # whole RANSAC stage when vmapped over batch x 150 hypotheses).
    shift = 1e-7 * jnp.trace(AtA) / 12.0 + 1e-12
    L = _cholesky_small(AtA + shift * jnp.eye(12, dtype=AtA.dtype))
    x = jnp.ones((12,), AtA.dtype)

    def inv_iter(_, x):
        y = _cho_solve_small(L, x)
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-20)

    p = jax.lax.fori_loop(0, 3, inv_iter, x / jnp.sqrt(12.0))
    # fall back to a fresh start if cholesky failed (degenerate sample)
    p = jnp.where(jnp.isfinite(p).all(), p, jnp.ones((12,), AtA.dtype))
    P = p.reshape(3, 4)

    # de-normalize: x_n = s2 (x - c2);  X_n = s3 (X - c3)
    # [u_n;v_n;1] ~ P [X_n;1]  =>  [u;v;1] ~ T2^-1 P T3 [X;1]
    T2inv = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], X.dtype
    )
    T2inv = T2inv.at[0, 0].set(1.0 / s2).at[1, 1].set(1.0 / s2)
    T2inv = T2inv.at[0, 2].set(c2[0]).at[1, 2].set(c2[1])
    T3 = jnp.zeros((4, 4), X.dtype)
    T3 = T3.at[0, 0].set(s3).at[1, 1].set(s3).at[2, 2].set(s3).at[3, 3].set(1.0)
    T3 = T3.at[:3, 3].set(-s3 * c3)
    P = _EINSUM("ij,jk,kl->il", T2inv, P, T3)

    M = P[:, :3]
    # sign: make det(M) positive
    sign = jnp.sign(_det3(M))
    sign = jnp.where(sign == 0, 1.0, sign)
    P = P * sign
    M = P[:, :3]
    # Orthogonal Procrustes via Newton polar iteration (replaces a 3x3 SVD:
    # vmapped small-matrix SVD cost ~82 ms per 12k RANSAC hypotheses on TPU,
    # the iteration ~28 ms).  det(M) > 0 here, so the polar factor is the
    # nearest rotation; the isotropic DLT scale is then trace(R^T M) / 3
    # (== mean singular value, since R^T M is the SPD polar stretch).
    det = jnp.maximum(_det3(M), 1e-20)
    Xp = M / jnp.cbrt(det)

    def polar_step(_, Xc):
        # determinant-scaled Newton: quadratic convergence even for the
        # ill-conditioned matrices degenerate RANSAC samples produce
        g = 1.0 / jnp.cbrt(jnp.abs(_det3(Xc)) + 1e-20)
        return 0.5 * (g * Xc + jnp.swapaxes(_inv3(Xc), -1, -2) / g)

    R = jax.lax.fori_loop(0, 7, polar_step, Xp)
    scale = jnp.maximum(jnp.trace(_EINSUM("ji,jk->ik", R, M)) / 3.0, 1e-9)
    t = P[:, 3] / scale
    ok = jnp.isfinite(R).all() & jnp.isfinite(t).all()
    R = jnp.where(ok, R, jnp.eye(3, dtype=X.dtype))
    t = jnp.where(ok, t, jnp.array([0.0, 0.0, 1.0], X.dtype))
    return R, t, ok


def _reproj_err2_px(pts3d, pts2d_px, K, R, t):
    """Squared pixel reprojection errors (N,)."""
    p = _EINSUM("ij,nj->ni", R, pts3d) + t
    z = p[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uv = p[..., :2] / z
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    px = jnp.stack([uv[..., 0] * fx + cx, uv[..., 1] * fy + cy], -1)
    behind = p[..., 2] <= 0
    err2 = ((px - pts2d_px) ** 2).sum(-1)
    return jnp.where(behind, jnp.inf, err2)


def _gauss_newton(pts3d, uv, w, R, t, iters: int):
    """Refine (R, t) by GN on normalized-coordinate reprojection."""

    def body(_, Rt):
        R, t = Rt
        p = _EINSUM("ij,nj->ni", R, pts3d) + t  # (N, 3)
        z = jnp.maximum(p[..., 2:3], 1e-6)
        iz = 1.0 / z[..., 0]
        u, v = p[..., 0] * iz, p[..., 1] * iz
        r = (jnp.stack([u, v], -1) - uv) * w[..., None]  # (N, 2)
        # closed-form rows of J = d(pi)/d(xi) for xi = (nu, omega) with
        # dp = nu - [p]x omega (the J_pi @ [I | -hat(p)] product expanded
        # by hand — two fewer batched matmuls per GN iteration):
        #   du/dxi = [iz, 0, -u*iz, -u*v, 1+u^2, -v]
        #   dv/dxi = [0, iz, -v*iz, -(1+v^2), u*v, u]
        zro = jnp.zeros_like(u)
        Ju = jnp.stack([iz, zro, -u * iz, -u * v, 1.0 + u * u, -v], -1)
        Jv = jnp.stack([zro, iz, -v * iz, -(1.0 + v * v), u * v, u], -1)
        Ju = Ju * w[..., None]
        Jv = Jv * w[..., None]
        JtJ = (
            _EINSUM("ni,nj->ij", Ju, Ju)
            + _EINSUM("ni,nj->ij", Jv, Jv)
            + 1e-6 * jnp.eye(6, dtype=p.dtype)
        )
        Jtr = _EINSUM("ni,n->i", Ju, r[..., 0]) + _EINSUM(
            "ni,n->i", Jv, r[..., 1]
        )
        Lc = _cholesky_small(JtJ)
        delta = -_cho_solve_small(Lc, Jtr)
        nu, omega = delta[:3], delta[3:]
        dR = _exp_so3(omega)
        R_new = _EINSUM("ij,jk->ik", dR, R)
        t_new = _EINSUM("ij,j->i", dR, t) + nu
        ok = jnp.isfinite(delta).all()
        return (jnp.where(ok, R_new, R), jnp.where(ok, t_new, t))

    return jax.lax.fori_loop(0, iters, body, (R, t))


def _ransac_pnp_single(
    pts3d, pts2d_px, K, valid, key, iters, sample, reproj_px, refine_iters,
    min_points, hyp_refine_iters=5, score_subset=1024,
):
    N = pts3d.shape[0]
    w = valid.astype(jnp.float32)
    n_valid = w.sum()

    Kinv = _inv3(K)
    ph = jnp.concatenate([pts2d_px, jnp.ones((N, 1), pts2d_px.dtype)], -1)
    uv = _EINSUM("ij,nj->ni", Kinv, ph)[:, :2]  # normalized coords

    # --- hypothesis sampling: uniform draws from a valid-index table.
    # (A per-iteration Gumbel-top-k over all N was measurably expensive:
    # iters*N gumbels per instance just to pick 6 indices.)  argsort(~valid)
    # is stable, so the first n_valid table entries are exactly the valid
    # indices; sampling WITH replacement can (rarely, ~C(6,2)/n_valid)
    # produce a duplicate inside one minimal sample — the rank-deficient
    # DLT then usually still yields a finite (just bad) pose that scores
    # few inliers and loses the ranking, costing one of 150 hypotheses,
    # which RANSAC absorbs by construction.
    k_hyp, k_sub = jax.random.split(key)
    table = jnp.argsort(jnp.logical_not(valid))  # (N,) valid indices first
    nv = jnp.maximum(n_valid.astype(jnp.int32), 1)
    sample_idx = table[jax.random.randint(k_hyp, (iters, sample), 0, nv)]

    # --- loose-phase scoring subset: ranking 150 hypotheses does not need
    # all N correspondences; a fixed random subset of valid points (shared
    # by every hypothesis of this instance, so the comparison stays fair)
    # cuts the scoring volume 4x.  Drawn WITHOUT replacement (top-S random
    # keys over the valid set) so no correspondence is double-counted and
    # the effective sample really is min(S, n_valid) distinct points; when
    # n_valid < S the tail indices are invalid and masked by valid_s.  The
    # polish/refit/final phases below still score strictly on ALL points —
    # the returned pose and inlier ratio are subset-free.
    #
    # All per-point columns ride ONE packed (N, 8) array so each index set
    # costs a single row gather: the four separate subset gathers (pts3d /
    # pts2d_px / uv / valid) measured ~2.7 ms/batch of kCustom gather time
    # in the device trace; packed they move the same bytes in one pass.
    packed = jnp.concatenate(
        [pts3d, uv, pts2d_px, w[..., None]], axis=-1
    )  # (N, 8): [xyz | uv_norm | uv_px | valid]
    S = min(score_subset, N)
    keys_sub = jnp.where(valid, jax.random.uniform(k_sub, (N,)), -jnp.inf)
    _, sub = jax.lax.top_k(keys_sub, S)
    packed_s = packed[sub]
    pts3d_s, pts2d_s = packed_s[:, :3], packed_s[:, 5:7]
    valid_s = packed_s[:, 7] > 0.5
    nv_s = jnp.maximum(valid_s.sum(), 1.0)  # = min(S, n_valid) distinct pts

    # A minimal DLT is too noise-sensitive under weak perspective (small
    # object, long focal): its hypotheses need a few Gauss-Newton steps on
    # their own sample to become competitive with OpenCV's EPnP minimal
    # solves.  GN on every hypothesis dominated the stage, so RANSAC runs in
    # two phases: (1) all `iters` DLT hypotheses scored with a LOOSE (4x)
    # threshold — inaccurate-but-unbiased ranking; (2) only the top
    # `polish_k` get the GN polish + strict scoring.  A clean sample always
    # ranks highly under the loose score, so the survivor set keeps RANSAC's
    # guarantees at ~1/10 the polish cost.
    polish_k = min(16, iters)

    def solve_dlt(idx):
        ws = jnp.ones((sample,), jnp.float32)
        row = packed[idx]  # one gather for [xyz | uv_norm]
        R, t, ok = _weighted_dlt(row[:, :3], row[:, 3:5], ws)
        err2 = _reproj_err2_px(pts3d_s, pts2d_s, K, R, t)
        loose = (err2 < (4.0 * reproj_px) ** 2) & valid_s
        score = jnp.where(ok, loose.sum(), -1)
        return R, t, score

    R_d, t_d, loose_scores = jax.vmap(solve_dlt)(sample_idx)
    _, topk_idx = jax.lax.top_k(loose_scores, polish_k)

    # The polish / refit / GN phases below also work on the subset: the
    # reference's cv2 refinement runs on the RANSAC inlier set only
    # (typically far fewer than N points), so a 1024-point weighted subset
    # is if anything closer to its estimator than full-N refinement.  Only
    # the FINAL inlier count of the chosen pose — the quantity that ranks
    # hypotheses in run_test.py:186 — is computed over all N points.
    uv_s = packed_s[:, 3:5]

    def polish_one(h):
        idx = sample_idx[h]
        ws = jnp.ones((sample,), jnp.float32)
        row = packed[idx]
        R, t = _gauss_newton(row[:, :3], row[:, 3:5], ws, R_d[h], t_d[h],
                             hyp_refine_iters)
        err2 = _reproj_err2_px(pts3d_s, pts2d_s, K, R, t)
        inl = (err2 < reproj_px**2) & valid_s
        score = jnp.where(loose_scores[h] >= 0, inl.sum(), -1)
        return R, t, score

    Rs, ts, scores = jax.vmap(polish_one)(topk_idx)
    best = jnp.argmax(scores)
    R0, t0, best_score = Rs[best], ts[best], scores[best]

    # --- refit on best inliers (weighted DLT + Gauss-Newton, subset)
    err2 = _reproj_err2_px(pts3d_s, pts2d_s, K, R0, t0)
    inl_w = ((err2 < reproj_px**2) & valid_s).astype(jnp.float32)
    # min_points is calibrated for full-N inlier counts; the subset sees a
    # nv_s/n_valid fraction of the valid points, so scale the gate to the
    # same inlier RATIO instead of comparing an absolute subset count
    enough = inl_w.sum() * n_valid >= min_points * nv_s
    refit_w = jnp.where(enough, inl_w, valid_s.astype(jnp.float32))
    R1, t1, ok1 = _weighted_dlt(pts3d_s, uv_s, refit_w)
    # keep the better of (minimal, refit) before GN
    err2_refit = _reproj_err2_px(pts3d_s, pts2d_s, K, R1, t1)
    refit_better = (
        ok1 & (((err2_refit < reproj_px**2) & valid_s).sum() >= best_score)
    )
    R1 = jnp.where(refit_better, R1, R0)
    t1 = jnp.where(refit_better, t1, t0)

    R2, t2 = _gauss_newton(pts3d_s, uv_s, refit_w, R1, t1, refine_iters)
    err2_gn = _reproj_err2_px(pts3d_s, pts2d_s, K, R2, t2)
    use_gn = ((err2_gn < reproj_px**2) & valid_s).sum() >= best_score
    R_out = jnp.where(use_gn, R2, R1)
    t_out = jnp.where(use_gn, t2, t1)

    # Final orthonormality polish: the GN updates chain ~13 f32 3x3
    # products (exp_so3 deltas), which can drift R^T R off identity by
    # ~2e-3 in the worst case.  Two det-scaled Newton polar steps converge
    # quadratically, pulling the drift below f32 roundoff, so consumers
    # always receive a true rotation — the guarantee cv2.Rodrigues gives
    # the reference's CSV writer (utils/pose_recovery.py:97-104).
    for _ in range(2):
        g = 1.0 / jnp.cbrt(jnp.abs(_det3(R_out)) + 1e-20)
        R_out = 0.5 * (g * R_out + jnp.swapaxes(_inv3(R_out), -1, -2) / g)

    # --- final strict inlier count of the chosen pose over ALL points
    err2_final = _reproj_err2_px(pts3d, pts2d_px, K, R_out, t_out)
    n_inl = ((err2_final < reproj_px**2) & valid).sum()

    success = (n_valid >= min_points) & (best_score > 0)
    R_out = jnp.where(success, R_out, jnp.eye(3, dtype=R_out.dtype))
    t_out = jnp.where(success, t_out, jnp.array([0.0, 0.0, 1.0], t_out.dtype))
    ratio = jnp.where(
        success, n_inl.astype(jnp.float32) / jnp.maximum(n_valid, 1.0), 0.0
    )
    return PnPResult(R_out, t_out, ratio, success)


@functools.partial(
    jax.jit,
    static_argnames=("iters", "sample", "reproj_px", "refine_iters", "min_points"),
)
def ransac_pnp(
    pts3d: jnp.ndarray,
    pts2d: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    iters: int = 150,
    sample: int = 6,
    reproj_px: float = 2.0,
    refine_iters: int = 8,
    min_points: int = 6,
) -> PnPResult:
    """Batched RANSAC-PnP.

    Args:
      pts3d: (B, N, 3) model-frame 3D points.
      pts2d: (B, N, 2) pixel observations.
      K:     (B, 3, 3) intrinsics.
      valid: (B, N) bool correspondence validity.
      key:   PRNG key (one; split internally per batch element).

    Returns PnPResult with (B, ...) leaves.  Matches the reference's OpenCV
    settings by default (reprojectionError=2, iterationsCount=150).
    """
    B = pts3d.shape[0]
    keys = jax.random.split(key, B)
    fn = functools.partial(
        _ransac_pnp_single,
        iters=iters,
        sample=sample,
        reproj_px=reproj_px,
        refine_iters=refine_iters,
        min_points=min_points,
    )
    return jax.vmap(fn)(
        pts3d.astype(jnp.float32),
        pts2d.astype(jnp.float32),
        K.astype(jnp.float32),
        valid,
        keys,
    )
