"""Disk-contract integration tests: fake BOP + MegaPose trees -> full drivers.

Builds miniature datasets in the EXACT on-disk layouts the reference
consumes (BOP test scenes + CNOS detections + template banks; MegaPose
webdataset training shards), using the native rasterizer for all imagery,
then runs the real loaders / eval driver / train step over them.
"""

import json
import os

import numpy as np
import pytest

import imageio.v2 as imageio

from picopose_tpu.native import available as native_available

pytestmark = [
    pytest.mark.skipif(not native_available(), reason="native rasterizer not built"),
    pytest.mark.compileheavy,
]

K = np.array([[572.4114, 0, 320.0], [0, 573.57043, 240.0], [0, 0, 1.0]], np.float32)


def encode_rle(mask: np.ndarray) -> dict:
    flat = mask.flatten(order="F").astype(np.uint8)
    counts, cur, run = [], 0, 0
    for v in flat:
        if v == cur:
            run += 1
        else:
            counts.append(int(run))
            cur, run = int(v), 1
    counts.append(int(run))
    return {"size": [int(mask.shape[0]), int(mask.shape[1])], "counts": counts}


@pytest.fixture(scope="module")
def cube_assets(tmp_path_factory):
    """A cube CAD + rendered template bank + a few posed scene renders."""
    from picopose_tpu.native.renderer import load_ply, render_object_bank, render_views
    from tests.test_native import make_cube_ply

    root = tmp_path_factory.mktemp("assets")
    cad = str(root / "obj_000001.ply")
    make_cube_ply(cad, size=60.0)

    bank_dir = str(root / "templates")
    render_object_bank(cad, bank_dir, level=0, obj_id=1)

    verts, colors, faces = load_ply(cad)
    from scipy.spatial.transform import Rotation

    scene_poses = []
    for i in range(2):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.from_euler("xyz", [0.4 + 0.3 * i, 0.2, 0.5]).as_matrix()
        T[:3, 3] = [10.0, -5.0, 450.0 + 40 * i]  # mm
        scene_poses.append(T)
    rgba, depth = render_views(verts, colors, faces, np.stack(scene_poses), K)
    return {
        "bank_dir": bank_dir,
        "scene_rgba": rgba,
        "scene_depth": depth,
        "scene_poses": scene_poses,
    }


@pytest.fixture(scope="module")
def bop_tree(tmp_path_factory, cube_assets):
    """data_dir/<ds>/test/... + detections, reference layout
    (provider/bop_test_dataset.py contracts)."""
    root = tmp_path_factory.mktemp("bop")
    ds = "fakeds"
    scene_dir = root / ds / "test" / "000001"
    (scene_dir / "rgb").mkdir(parents=True)
    cam = {}
    dets = []
    targets = []
    for img_id, (rgba, pose) in enumerate(
        zip(cube_assets["scene_rgba"], cube_assets["scene_poses"])
    ):
        imageio.imwrite(scene_dir / "rgb" / f"{img_id:06d}.png", rgba[..., :3])
        cam[str(img_id)] = {"cam_K": K.reshape(-1).tolist(), "depth_scale": 1.0}
        mask = (rgba[..., 3] > 0).astype(np.uint8)
        ys, xs = np.where(mask)
        dets.append({
            "scene_id": 1, "image_id": img_id, "category_id": 1,
            "bbox": [int(xs.min()), int(ys.min()),
                     int(xs.max() - xs.min()), int(ys.max() - ys.min())],
            "score": 0.9, "time": 0.05,
            "segmentation": encode_rle(mask),
        })
        targets.append({"scene_id": 1, "im_id": img_id, "obj_id": 1, "inst_count": 1})
    with open(scene_dir / "scene_camera.json", "w") as f:
        json.dump(cam, f)
    with open(root / ds / "test_targets_bop19.json", "w") as f:
        json.dump(targets, f)
    det_path = str(root / "dets.json")
    with open(det_path, "w") as f:
        json.dump(dets, f)
    return {"data_dir": str(root), "dataset": ds, "det_path": det_path}


class TestBOPEvalDriver:
    def test_end_to_end_csv(self, bop_tree, cube_assets, tmp_path):
        import jax
        import jax.numpy as jnp

        from picopose_tpu.data.bop import BOPTestDataset
        from picopose_tpu.eval.runner import evaluate_dataset
        from picopose_tpu.models import PicoPose

        ds = BOPTestDataset(
            bop_tree["data_dir"], bop_tree["dataset"], bop_tree["det_path"],
            n_template_view=6,
        )
        assert len(ds) == 2
        rec = ds.load_image(0)
        assert len(rec.instances) == 1
        inst = rec.instances[0]
        assert inst.rgb.shape == (224, 224, 3)
        assert inst.mask.sum() > 100

        model = PicoPose(
            vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7),
            compute_dtype=jnp.float32,
        )
        imgs = jnp.zeros((1, 224, 224, 3))
        variables = model.init(
            jax.random.PRNGKey(0), imgs, jnp.ones((1, 224, 224)), True
        )
        csv = evaluate_dataset(
            model, variables, ds, cube_assets["bank_dir"],
            str(tmp_path / "out.csv"), jax.random.PRNGKey(0),
            hyp=2, batch_size=2, pnp_iters=16, progress=False,
        )
        lines = open(csv).read().strip().split("\n")
        assert len(lines) == 2
        cols = lines[0].split(",")
        assert len(cols) == 7  # scene,im,obj,score,R,t,time
        assert len(cols[4].split()) == 9 and len(cols[5].split()) == 3
        R = np.array(cols[4].split(), float).reshape(3, 3)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)


class TestRunTestCLI:
    def test_cli_end_to_end(self, bop_tree, cube_assets, tmp_path):
        """run_test.py as a subprocess over the fake tree (random init)."""
        import shutil
        import subprocess

        root = tmp_path / "cli"
        (root / "dets").mkdir(parents=True)
        shutil.copy(bop_tree["det_path"], root / "dets" / "fakeds.json")
        tdir = root / "templates" / "fakeds"
        tdir.parent.mkdir(parents=True, exist_ok=True)
        shutil.copytree(cube_assets["bank_dir"], tdir)

        env = dict(os.environ)
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        env["PICOPOSE_FORCE_CPU"] = "1"
        import sys as _sys

        r = subprocess.run(
            [
                _sys.executable, "run_test.py",
                "--dataset", "fakeds",
                "--batch", "2",
                "--version_id", "77",
                "--set",
                f"test_dataset.data_dir={bop_tree['data_dir']}",
                f"test_dataset.template_dir={root / 'templates'}",
                f"test_dataset.detection_dir={root / 'dets'}",
                "test_dataset.n_template_view=6",
                "model.vit_type=dinov2_vits14",
                "model.blocks_to_take=[1,3,5,7]",
                "model.compute_dtype=float32",
                "model.hypothesis=2",
            ],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
            env=env, timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        csv = os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "log", "picopose", "version_77", "fakeds_eval",
            "picopose-stage3-2hyp_fakeds-test.csv",
        )
        assert os.path.exists(csv), r.stdout[-2000:]
        assert len(open(csv).read().strip().split("\n")) == 2


@pytest.fixture(scope="module")
def megapose_tree(tmp_path_factory, cube_assets):
    """MegaPose-GSO webdataset-layout training shards + template bank
    (provider/training_dataset.py contracts)."""
    root = tmp_path_factory.mktemp("mp")
    web = root / "MegaPose-GSO" / "train_pbr_web"
    shard = web / "shard-000000"
    shard.mkdir(parents=True)

    key_to_shard = {}
    for i, (rgba, depth, pose) in enumerate(
        zip(cube_assets["scene_rgba"], cube_assets["scene_depth"],
            cube_assets["scene_poses"])
    ):
        key = f"{i:08d}"
        key_to_shard[key] = 0
        base = shard / key
        imageio.imwrite(str(base) + ".rgb.jpg", rgba[..., :3])
        imageio.imwrite(str(base) + ".depth.png", depth.astype(np.uint16))
        mask = (rgba[..., 3] > 0).astype(np.uint8)
        with open(str(base) + ".mask_visib.json", "w") as f:
            json.dump({"0": encode_rle(mask)}, f)
        with open(str(base) + ".gt.json", "w") as f:
            json.dump([{
                "obj_id": 1,
                "cam_R_m2c": pose[:3, :3].reshape(-1).tolist(),
                "cam_t_m2c": pose[:3, 3].reshape(-1).tolist(),  # mm
            }], f)
        with open(str(base) + ".gt_info.json", "w") as f:
            json.dump([{
                "px_count_valid": int(mask.sum()), "visib_fract": 1.0,
            }], f)
        with open(str(base) + ".camera.json", "w") as f:
            json.dump({"cam_K": K.reshape(-1).tolist(), "depth_scale": 1.0}, f)
    with open(web / "key_to_shard.json", "w") as f:
        json.dump(key_to_shard, f)

    # template bank in the training layout (x10 mm scale like GSO banks:
    # loader multiplies depth/pose by 0.1/1000, training_dataset.py:294-298)
    tdir = root / "MegaPose-Templates" / "GSO"
    tdir.mkdir(parents=True)
    import shutil

    shutil.copytree(
        os.path.join(cube_assets["bank_dir"], "000001"), tdir / "000001"
    )
    os.makedirs(tdir / "object_poses", exist_ok=True)
    poses = np.load(
        os.path.join(cube_assets["bank_dir"], "object_poses", "000001.npy")
    ).copy()
    poses[:, :3, 3] *= 10.0  # so that x0.1 restores mm -> matches depth x10
    np.save(tdir / "object_poses" / "000001.npy", poses)
    # scale depth PNGs by 10 (stored depth*10 like GSO banks)
    for f10 in os.listdir(tdir / "000001"):
        if f10.endswith("_depth.png"):
            p = str(tdir / "000001" / f10)
            d = imageio.imread(p).astype(np.float64) * 10.0
            imageio.imwrite(p, np.clip(d, 0, 65535).astype(np.uint16))
    return str(root)


class TestTrainingLoop:
    def test_run_training_smoke(self, megapose_tree, tmp_path, monkeypatch):
        """Three steps of the real training loop (prefetch threads, logger,
        epoch checkpointing) over the fake shard tree."""
        import jax.numpy as jnp

        from picopose_tpu.models import PicoPose
        from picopose_tpu.train.loop import run_training
        from picopose_tpu.utils.config import load_config

        cfg = load_config(None, [
            f"train_dataset.data_dir={megapose_tree}",
            "train_dataset.min_px_count_visib=100",
            "train_dataloader.bs=1",
            "train_dataloader.num_workers=2",
            "lr_scheduler.max_iters=9",
            "trainer.training_epoch=3",
            "trainer.iters_to_print=1",
            "trainer.n_devices=1",
        ])
        # the 162-view default search table exceeds the 42-view fake bank;
        # point the dataset at the bank's own table
        import numpy as np_

        table = np_.load(os.path.join(
            megapose_tree, "MegaPose-Templates", "GSO", "object_poses",
            "000001.npy",
        ))
        import picopose_tpu.train.loop as loop_mod

        orig = loop_mod.MegaPoseTrainingDataset

        def patched(*a, **k):
            k["pose_table"] = table
            return orig(*a, **k)

        monkeypatch.setattr(loop_mod, "MegaPoseTrainingDataset", patched)

        model = PicoPose(
            vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7),
            compute_dtype=jnp.float32,
        )
        log_dir = str(tmp_path / "log")
        run_training(cfg, model, log_dir, max_steps=3)
        assert os.path.exists(os.path.join(log_dir, "training_logger.log"))
        ckpts = os.listdir(os.path.join(log_dir, "checkpoints"))
        assert len(ckpts) >= 1


class TestMegaPoseTrainingData:
    def test_sample_and_train_step(self, megapose_tree):
        import jax
        import jax.numpy as jnp

        from picopose_tpu.data.megapose import MegaPoseTrainingDataset, collate
        from picopose_tpu.models import PicoPose
        from picopose_tpu.train.step import init_state, make_optimizer, train_step

        # nearest-view search table must match the bank's view order/count
        table = np.load(
            os.path.join(
                megapose_tree, "MegaPose-Templates", "GSO",
                "object_poses", "000001.npy",
            )
        )
        ds = MegaPoseTrainingDataset(
            megapose_tree, min_px_count_visib=100, seed=0,
            pose_table=table,
        )
        assert len(ds.samples) == 2
        s = ds.get(0)
        assert s is not None
        assert s["real_rgb"].shape == (224, 224, 3)
        assert s["tem_rgb"].shape == (224, 224, 3)
        assert np.isfinite(s["tem_pose"]).all()
        # template pose z in meters, cube at ~0.45-0.5 m scale after x0.1/1000
        assert 0.01 < abs(s["tem_pose"][2, 3]) < 10.0

        batch = collate([ds.get(0), ds.get(1)])
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        model = PicoPose(
            vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7),
            compute_dtype=jnp.float32,
        )
        tx = make_optimizer(max_iters=100)
        state = init_state(model, tx, jax.random.PRNGKey(0))
        state2, losses = train_step(model, tx, state, jb, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["loss"]))
        assert int(state2.step) == 1


class TestProcessLoader:
    def test_mp_prefetch_batches(self, megapose_tree):
        """Process-pool batch producer: right count/shapes, deterministic
        per (seed, epoch) epoch subset, template cache exactness."""
        from picopose_tpu.train.loop import mp_prefetch_batches

        table = np.load(os.path.join(
            megapose_tree, "MegaPose-Templates", "GSO",
            "object_poses", "000001.npy",
        ))
        kw = dict(
            data_dir=megapose_tree, min_px_count_visib=100,
            pose_table=table, augment_real=False,
        )
        run1 = list(mp_prefetch_batches(kw, 2, steps=3, workers=2, seed=7))
        assert len(run1) == 3
        for b in run1:
            assert b["real_rgb"].shape == (2, 224, 224, 3)
            assert b["tem_rgb"].shape == (2, 224, 224, 3)
        # without aug the stream is a pure function of (seed, epoch)
        run2 = list(mp_prefetch_batches(kw, 2, steps=3, workers=2, seed=7))
        for b1, b2 in zip(run1, run2):
            for k in b1:
                np.testing.assert_array_equal(b1[k], b2[k])
        # different epoch -> different subset draw (may coincide on a
        # 2-sample tree only if the rng picks identically; just check it runs)
        run3 = list(
            mp_prefetch_batches(kw, 2, steps=1, workers=2, seed=7, epoch=1)
        )
        assert run3[0]["real_rgb"].shape == (2, 224, 224, 3)

    def test_template_cache_exact(self, megapose_tree):
        """Cached template samples are bit-identical to uncached loads."""
        from picopose_tpu.data.megapose import MegaPoseTrainingDataset

        table = np.load(os.path.join(
            megapose_tree, "MegaPose-Templates", "GSO",
            "object_poses", "000001.npy",
        ))
        kw = dict(
            min_px_count_visib=100, pose_table=table, augment_real=False,
        )
        ds_c = MegaPoseTrainingDataset(megapose_tree, seed=3, **kw)
        ds_u = MegaPoseTrainingDataset(
            megapose_tree, seed=3, cache_templates=0, **kw
        )
        for i in [0, 1, 0, 1, 0]:  # revisits hit the cache in ds_c
            a, b = ds_c.get(i), ds_u.get(i)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)


class TestDevicePrefetch:
    def test_uploads_ahead_and_propagates_errors(self):
        """device_prefetch: order-preserving sharded uploads with a depth-2
        queue; producer exceptions surface in the consumer (train/loop.py)."""
        import jax

        from picopose_tpu.parallel.mesh import make_mesh
        from picopose_tpu.train.loop import device_prefetch

        mesh = make_mesh(n_data=1)
        batches = iter(
            [{"a": np.full((4, 8), i, np.float32)} for i in range(5)]
        )
        out = list(device_prefetch(batches, mesh))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert isinstance(b["a"], jax.Array)
            assert b["a"].shape == (4, 8)
            assert float(b["a"][0, 0]) == float(i)

        def bad():
            yield {"a": np.ones((2, 2), np.float32)}
            raise RuntimeError("producer boom")

        with pytest.raises(RuntimeError, match="producer boom"):
            list(device_prefetch(bad(), mesh))
