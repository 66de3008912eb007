"""BOP19 MSSD/MSPD scoring tests on synthetic ground truth."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from picopose_tpu.eval.bop_scoring import (
    Estimate,
    GTInstance,
    ObjectModel,
    continuous_syms,
    mspd,
    mssd,
    read_csv,
    score_bop19,
)

K = np.array([[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]])


def make_model(rng, n=200, scale=40.0):
    pts = rng.uniform(-scale, scale, size=(n, 3))
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1).max()
    return ObjectModel(pts=pts, diameter=float(d))


class TestMetrics:
    def test_mssd_zero_at_gt(self, rng):
        m = make_model(rng)
        R = Rotation.random(random_state=0).as_matrix()
        t = np.array([10.0, 5.0, 500.0])
        assert mssd(R, t, R, t, m.pts, m.syms) < 1e-9
        assert mspd(R, t, R, t, K, m.pts, m.syms) < 1e-9

    def test_mssd_translation_offset(self, rng):
        m = make_model(rng)
        R = np.eye(3)
        t = np.array([0.0, 0.0, 500.0])
        e = mssd(R, t + [3.0, 0, 0], R, t, m.pts, m.syms)
        assert np.isclose(e, 3.0, atol=1e-9)

    def test_symmetry_aware(self, rng):
        """A z-symmetric ring: rotated estimate has ~0 MSSD with continuous
        z symmetry, large without."""
        theta = np.linspace(0, 2 * np.pi, 72, endpoint=False)
        pts = np.stack(
            [30 * np.cos(theta), 30 * np.sin(theta), np.zeros_like(theta)], -1
        )
        t = np.array([0.0, 0.0, 500.0])
        Rz = Rotation.from_euler("z", 40, degrees=True).as_matrix()
        m_nosym = ObjectModel(pts=pts, diameter=60.0)
        m_sym = ObjectModel(pts=pts, diameter=60.0, syms=continuous_syms([0, 0, 1], 72))
        assert mssd(Rz, t, np.eye(3), t, m_nosym.pts, m_nosym.syms) > 10.0
        assert mssd(Rz, t, np.eye(3), t, m_sym.pts, m_sym.syms) < 1e-6


class TestScoring:
    def test_perfect_estimates_get_full_ar(self, rng):
        m = make_model(rng)
        gts, ests = [], []
        for i in range(4):
            R = Rotation.random(random_state=i).as_matrix()
            t = np.array([0.0, 0.0, 500.0 + 10 * i])
            gts.append(GTInstance(1, i, 7, R, t))
            ests.append(Estimate(1, i, 7, 0.9, R, t))
        Ks = {(1, i): K for i in range(4)}
        s = score_bop19(ests, gts, {7: m}, Ks)
        assert s["AR_MSSD"] == 1.0 and s["AR_MSPD"] == 1.0
        assert s["n_gt"] == 4

    def test_bad_estimates_get_zero(self, rng):
        m = make_model(rng)
        R = np.eye(3)
        t = np.array([0.0, 0.0, 500.0])
        gts = [GTInstance(1, 0, 7, R, t)]
        bad_R = Rotation.from_euler("x", 170, degrees=True).as_matrix()
        ests = [Estimate(1, 0, 7, 0.9, bad_R, t + [200, 0, 0])]
        s = score_bop19(ests, gts, {7: m}, {(1, 0): K})
        assert s["AR_MSSD"] == 0.0

    def test_partial_recall_with_missing_detection(self, rng):
        m = make_model(rng)
        R = np.eye(3)
        t = np.array([0.0, 0.0, 500.0])
        gts = [GTInstance(1, 0, 7, R, t), GTInstance(1, 1, 7, R, t)]
        ests = [Estimate(1, 0, 7, 0.9, R, t)]  # image 1 missed
        s = score_bop19(ests, gts, {7: m}, {(1, 0): K, (1, 1): K})
        assert np.isclose(s["AR_MSSD"], 0.5)

    def test_csv_roundtrip(self, tmp_path, rng):
        from picopose_tpu.eval.bop_csv import format_row

        R = Rotation.random(random_state=5).as_matrix()
        t_m = np.array([0.01, 0.02, 0.5])  # meters in CSV writer
        row = format_row(3, 14, 7, 0.8, R, t_m, 0.1)
        p = tmp_path / "x.csv"
        p.write_text(row)
        ests = read_csv(str(p))
        assert len(ests) == 1
        np.testing.assert_allclose(ests[0].R, R, atol=1e-6)
        np.testing.assert_allclose(ests[0].t, t_m * 1000.0, atol=1e-4)  # mm
        assert (ests[0].scene_id, ests[0].im_id, ests[0].obj_id) == (3, 14, 7)


class TestVSD:
    def test_vsd_zero_at_gt(self, rng):
        from picopose_tpu.eval.bop_scoring import vsd

        d = rng.uniform(400, 500, size=(48, 64))
        d[:10] = 0  # background
        errs = vsd(d, d, None, taus=np.array([10.0, 50.0]))
        np.testing.assert_allclose(errs, 0.0)

    def test_vsd_disjoint_is_one(self, rng):
        from picopose_tpu.eval.bop_scoring import vsd

        a = np.zeros((40, 40)); a[:20] = 450.0
        b = np.zeros((40, 40)); b[20:] = 450.0
        errs = vsd(a, b, None, taus=np.array([100.0]))
        np.testing.assert_allclose(errs, 1.0)

    def test_vsd_occlusion_masks(self):
        from picopose_tpu.eval.bop_scoring import vsd

        # object at 500mm, occluder at 300mm over the left half of BOTH
        d_obj = np.full((10, 10), 500.0)
        d_scene = np.full((10, 10), 500.0)
        d_scene[:, :5] = 300.0  # occluded: object invisible there
        errs = vsd(d_obj, d_obj, d_scene, taus=np.array([5.0]), delta=15.0)
        np.testing.assert_allclose(errs, 0.0)  # visible parts agree

    @pytest.mark.skipif(
        __import__("picopose_tpu.native", fromlist=["available"]).available()
        is False,
        reason="native rasterizer not built",
    )
    def test_full_bop19_with_rendered_vsd(self, rng, tmp_path):
        """End-to-end: perfect estimates score AR_bop19 == 1 with depth
        rendered by the native rasterizer."""
        from picopose_tpu.eval.bop_scoring import score_bop19
        from picopose_tpu.native.renderer import load_ply, render_views
        from tests.test_native import make_cube_ply

        cad = str(tmp_path / "c.ply")
        make_cube_ply(cad, size=60.0)
        verts, colors, faces = load_ply(cad)

        def render_depth(obj_id, R, t, Kk):
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3], pose[:3, 3] = R, t
            _, depth = render_views(verts, colors, faces, pose[None],
                                    Kk.astype(np.float32), (480, 640))
            return depth[0].astype(np.float64)

        d = np.linalg.norm(verts[:, None] - verts[None], axis=-1).max()
        m = ObjectModel(pts=verts.astype(np.float64), diameter=float(d))
        R = Rotation.random(random_state=2).as_matrix()
        t = np.array([5.0, -3.0, 450.0])
        gts = [GTInstance(1, 0, 7, R, t)]
        ests = [Estimate(1, 0, 7, 0.9, R, t)]
        s = score_bop19(
            ests, gts, {7: m}, {(1, 0): K}, render_depth=render_depth
        )
        assert s["AR_VSD"] == 1.0 and s["AR_bop19"] == 1.0


class TestIndependentFormulaCrossCheck:
    """VERDICT round-1 item 7: validate the scorer against an INDEPENDENT
    from-scratch coding of the bop_toolkit formulas (pose_error.py mssd /
    mspd / vsd definitions, restructured: one vectorized einsum over the
    whole symmetry set instead of a python loop), plus an analytic
    hand-derived symmetry case.  bop_toolkit itself is not installed in
    this environment; these tests are the vendored-formula cross-check."""

    def _mssd_ref(self, R_e, t_e, R_g, t_g, pts, syms):
        # e = min_S max_x || (R_e x + t_e) - (R_g S x + S_t + ... ) ||
        # with the symmetry applied to the MODEL points of the GT pose
        Rs = syms[:, :3, :3]
        ts = syms[:, :3, 3]
        pts_s = np.einsum("sij,nj->sni", Rs, pts) + ts[:, None]      # (S,N,3)
        gt = np.einsum("ij,snj->sni", R_g, pts_s) + t_g              # (S,N,3)
        est = pts @ R_e.T + t_e                                      # (N,3)
        d = np.linalg.norm(est[None] - gt, axis=-1)                  # (S,N)
        return d.max(axis=1).min()

    def _mspd_ref(self, R_e, t_e, R_g, t_g, Kc, pts, syms):
        Rs = syms[:, :3, :3]
        ts = syms[:, :3, 3]
        pts_s = np.einsum("sij,nj->sni", Rs, pts) + ts[:, None]
        gt = np.einsum("ij,snj->sni", R_g, pts_s) + t_g
        est = pts @ R_e.T + t_e
        pe = (est @ Kc.T)
        pe = pe[:, :2] / pe[:, 2:3]
        pg = np.einsum("ij,snj->sni", Kc, gt)
        pg = pg[..., :2] / pg[..., 2:3]
        d = np.linalg.norm(pe[None] - pg, axis=-1)
        return d.max(axis=1).min()

    def test_mssd_mspd_match_independent_formula(self, rng):
        from picopose_tpu.eval.bop_scoring import discrete_syms

        pts = rng.uniform(-30, 30, size=(64, 3))
        sym_list = [
            np.eye(4)[None],
            continuous_syms(np.array([0.0, 0.0, 1.0]), n=12),
            discrete_syms(
                [np.diag([-1.0, -1.0, 1.0, 1.0]).reshape(-1).tolist()]
            ),
        ]
        for syms in sym_list:
            for trial in range(5):
                R_e = Rotation.random(random_state=trial).as_matrix()
                R_g = Rotation.random(random_state=100 + trial).as_matrix()
                t_e = rng.uniform(-20, 20, 3) + [0, 0, 600]
                t_g = rng.uniform(-20, 20, 3) + [0, 0, 600]
                np.testing.assert_allclose(
                    mssd(R_e, t_e, R_g, t_g, pts, syms),
                    self._mssd_ref(R_e, t_e, R_g, t_g, pts, syms),
                    rtol=1e-10,
                )
                np.testing.assert_allclose(
                    mspd(R_e, t_e, R_g, t_g, K, pts, syms),
                    self._mspd_ref(R_e, t_e, R_g, t_g, K, pts, syms),
                    rtol=1e-10,
                )

    def test_mssd_analytic_cube_symmetry(self):
        """Hand-derived: cube corners, 4-fold z symmetry, estimate rotated
        45 deg about z.  Nearest symmetric GT is 45 deg away; every corner
        moves by 2*sin(22.5 deg)*a*sqrt(2) (its xy-radius), z unchanged."""
        a = 30.0
        corners = np.array(
            [[sx * a, sy * a, sz * a]
             for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        syms = np.stack([
            np.block([
                [Rotation.from_euler("z", k * 90, degrees=True).as_matrix(),
                 np.zeros((3, 1))],
                [np.zeros((1, 3)), np.ones((1, 1))],
            ])
            for k in range(4)
        ])
        R_e = Rotation.from_euler("z", 45, degrees=True).as_matrix()
        t = np.array([0.0, 0.0, 500.0])
        expected = 2.0 * np.sin(np.deg2rad(22.5)) * a * np.sqrt(2.0)
        got = mssd(R_e, t, np.eye(3), t, corners, syms)
        np.testing.assert_allclose(got, expected, rtol=1e-12)
        # and with a symmetry-respecting 90-deg estimate the error vanishes
        R_90 = Rotation.from_euler("z", 90, degrees=True).as_matrix()
        assert mssd(R_90, t, np.eye(3), t, corners, syms) < 1e-9

    def test_vsd_matches_independent_formula(self, rng):
        """vsd() vs a from-scratch coding of bop_toolkit
        pose_error.vsd visibility semantics (estimation visibility amended
        by the GT-visible mask, delta tolerance against the scene depth)."""
        from picopose_tpu.eval.bop_scoring import vsd

        H = W = 24
        d_est = np.where(rng.random((H, W)) > 0.4,
                         rng.uniform(400, 600, (H, W)), 0.0)
        d_gt = np.where(rng.random((H, W)) > 0.4,
                        rng.uniform(400, 600, (H, W)), 0.0)
        d_scene = np.where(rng.random((H, W)) > 0.3,
                           rng.uniform(350, 650, (H, W)), 0.0)
        delta = 15.0
        taus = np.array([5.0, 20.0, 80.0])

        def ref(d_e, d_g, d_s):
            # visib_gt: rendered & (no scene depth | not occluded)
            seen = d_s > 0
            v_g = (d_g > 0) & (~seen | (d_g <= d_s + delta))
            v_e = (d_e > 0) & (~seen | (d_e <= d_s + delta))
            v_e = v_e | (v_g & (d_e > 0))
            union = v_e | v_g
            inter = v_e & v_g
            out = []
            for tau in taus:
                ok = inter & (np.abs(d_e - d_g) < tau)
                out.append(1.0 - ok.sum() / union.sum())
            return np.array(out)

        np.testing.assert_allclose(
            vsd(d_est, d_gt, d_scene, taus, delta),
            ref(d_est, d_gt, d_scene), rtol=1e-12,
        )
        # no-occluder path
        np.testing.assert_allclose(
            vsd(d_est, d_gt, None, taus, delta),
            ref(d_est, d_gt, np.zeros((H, W))), rtol=1e-12,
        )


class TestPairedDelta:
    """paired_delta_ar: paired bootstrap over shared GT instances."""

    def _score(self, rng, ests, gts, m, Ks):
        recs = []
        s = score_bop19(ests, gts, {7: m}, Ks, per_instance=recs)
        return s, recs

    def _world(self, rng, n=24):
        m = make_model(rng)
        gts, Ks = [], {}
        for i in range(n):
            R = Rotation.random(random_state=i).as_matrix()
            t = np.array([0.0, 0.0, 500.0 + 5 * i])
            gts.append(GTInstance(1, i, 7, R, t))
            Ks[(1, i)] = K
        return m, gts, Ks

    def test_identical_arms_zero_delta(self, rng):
        from picopose_tpu.eval.bop_scoring import paired_delta_ar

        m, gts, Ks = self._world(rng)
        ests = [Estimate(g.scene_id, g.im_id, g.obj_id, 0.9, g.R, g.t)
                for g in gts]
        _, ra = self._score(rng, ests, gts, m, Ks)
        _, rb = self._score(rng, ests, gts, m, Ks)
        d = paired_delta_ar(ra, rb)
        for metric in ("AR_MSSD", "AR_MSPD", "AR_mssd_mspd"):
            assert d[metric]["delta"] == 0.0
            assert d[metric]["ci95"] == [0.0, 0.0]
            assert d[metric]["n"] == len(gts)

    def test_paired_ci_tighter_than_independent(self, rng):
        """Arm B perturbs a few estimates; per-arm CIs overlap widely while
        the paired delta CI is tight around the true (negative) delta."""
        from picopose_tpu.eval.bop_scoring import bootstrap_ar, paired_delta_ar

        m, gts, Ks = self._world(rng, n=40)
        # arm A: mixed quality — some perfect, some offset (difficulty
        # variance across instances, the thing pairing cancels)
        ests_a = []
        for i, g in enumerate(gts):
            off = np.array([0.02 * m.diameter * (i % 5), 0.0, 0.0])
            ests_a.append(
                Estimate(g.scene_id, g.im_id, g.obj_id, 0.9, g.R, g.t + off)
            )
        # arm B: same, but 4 instances degraded further
        ests_b = []
        for i, g in enumerate(gts):
            extra = np.array([0.1 * m.diameter, 0, 0]) if i < 4 else 0.0
            off = np.array([0.02 * m.diameter * (i % 5), 0.0, 0.0]) + extra
            ests_b.append(
                Estimate(g.scene_id, g.im_id, g.obj_id, 0.9, g.R, g.t + off)
            )
        sa, ra = self._score(rng, ests_a, gts, m, Ks)
        sb, rb = self._score(rng, ests_b, gts, m, Ks)
        true_delta = sb["AR_mssd_mspd"] - sa["AR_mssd_mspd"]
        assert true_delta < 0

        d = paired_delta_ar(ra, rb)["AR_mssd_mspd"]
        assert np.isclose(d["delta"], true_delta, atol=1e-12)
        lo, hi = d["ci95"]
        assert lo <= true_delta <= hi
        paired_width = hi - lo
        ci_a = bootstrap_ar(ra)["AR_mssd_mspd"]
        ci_b = bootstrap_ar(rb)["AR_mssd_mspd"]
        indep_width = (ci_a[1] - ci_a[0]) + (ci_b[1] - ci_b[0])
        assert paired_width < indep_width / 2

    def test_mismatched_ground_truth_rejected(self, rng):
        from picopose_tpu.eval.bop_scoring import paired_delta_ar

        m, gts, Ks = self._world(rng, n=6)
        ests = [Estimate(g.scene_id, g.im_id, g.obj_id, 0.9, g.R, g.t)
                for g in gts]
        _, ra = self._score(rng, ests, gts, m, Ks)
        _, rb = self._score(rng, ests[:-1], gts[:-1], m,
                            {k: v for k, v in list(Ks.items())[:-1]})
        with pytest.raises(ValueError, match="record sets differ"):
            paired_delta_ar(ra, rb)
