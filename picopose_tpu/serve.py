"""Programmatic inference API: a persistent pose estimator for serving.

The reference only exposes a CLI over BOP trees (run_test.py); production
use needs a library surface — load once, register object template banks,
then call `estimate(rgb, K, detections)` per frame.  This wraps the same
one-program TPU pipeline (eval/pipeline.py) behind that surface:

    est = PoseEstimator(checkpoint="model.ckpt")          # or orbax dir
    est.register_object(1, "templates/ycbv")              # builds the bank
    poses = est.estimate(rgb, K, [
        {"obj_id": 1, "mask": mask},                      # or RLE / bbox
    ])
    poses[0].R, poses[0].t, poses[0].score

Crops/batches are padded to a fixed `max_batch` so repeated calls reuse
the single compiled executable (XLA retraces on shape change); detections
for several objects in one call are grouped per object bank, exactly like
the offline runner (eval/runner.py).

Multi-chip serving: pass `devices=jax.local_devices()` (or any subset) and
object banks are placed round-robin across them with a model replica per
chip — HBM capacity for resident banks scales linearly, and because jax
dispatch is async, per-object batches for banks on different chips execute
concurrently.  Single jitted program per chip, no collectives.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Mapping, Sequence

import numpy as np

from picopose_tpu.data.crops import (
    crop_and_normalize_rgb,
    crop_matrix,
    crop_mask,
    grid_pts2d,
    mask_square_bbox,
    square_bbox,
)
from picopose_tpu.data.rle import rle_to_mask


def _to_numpy_typed(x) -> np.ndarray:
    """Device array -> numpy, with bf16 stored as raw uint16 bits (numpy
    has no bfloat16; the dtype round-trips via _from_numpy_typed)."""
    import jax.numpy as jnp

    if x.dtype == jnp.bfloat16:
        import jax

        raw = np.asarray(jax.lax.bitcast_convert_type(x, jnp.uint16))
        return raw.view([("bf16", np.uint16)])
    return np.asarray(x)


def _from_numpy_typed(a: np.ndarray):
    import jax
    import jax.numpy as jnp

    if a.dtype.names == ("bf16",):
        raw = jnp.asarray(a.view(np.uint16))
        return jax.lax.bitcast_convert_type(raw, jnp.bfloat16)
    return a


@dataclasses.dataclass
class PoseResult:
    """Best-hypothesis pose for one detection (camera frame, meters)."""

    obj_id: int
    R: np.ndarray              # (3, 3)
    t: np.ndarray              # (3,) meters
    score: float               # PnP inlier ratio of the winning hypothesis
    success: bool              # PnP converged (else stage-2 fallback pose)
    template_score: float      # stage-1 matching score of that hypothesis


class PoseEstimator:
    """Persistent single-process estimator around the jitted pipeline."""

    def __init__(
        self,
        checkpoint: str | None = None,
        variables: Mapping[str, Any] | None = None,
        vit_type: str = "dinov2_vitl14",
        blocks_to_take: Sequence[int] = (5, 11, 17, 23),
        compute_dtype: str = "bfloat16",
        hyp: int = 5,
        n_template_view: int = 162,
        pnp_iters: int = 150,
        stage3_topk: int | None = None,
        quantize_stage3: bool = False,
        max_batch: int = 16,
        img_size: int = 224,
        pts_size: int = 64,
        min_mask_px: int = 8,
        rgb_mask_flag: bool = False,
        seed: int = 0,
        devices: Sequence[Any] | None = None,
        device_preprocess: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        from picopose_tpu.models import PicoPose

        self._jnp = jnp
        self.model = PicoPose(
            vit_type=vit_type,
            blocks_to_take=tuple(blocks_to_take),
            compute_dtype=compute_dtype,
            quantize_stage3=quantize_stage3,
        )
        self.hyp = hyp
        self.n_template_view = n_template_view
        self.pnp_iters = pnp_iters
        self.stage3_topk = stage3_topk
        self.max_batch = max_batch
        self.img_size = img_size
        self.pts_size = pts_size
        self.min_mask_px = min_mask_px
        self.rgb_mask_flag = rgb_mask_flag
        # device_preprocess=True moves crop/resize/normalize into a jit
        # stage (ops/preprocess.py): the host uploads ONE frame + masks per
        # chunk instead of cropping per detection with cv2/C++ — one fewer
        # host hop per frame (BASELINE north star).  Host path stays the
        # default; parity <=1e-3 pinned in tests/test_preprocess.py and
        # tests/test_serve.py.
        self.device_preprocess = device_preprocess
        self._key = jax.random.PRNGKey(seed)
        self._banks: dict[int, Any] = {}
        # multi-chip: round-robin bank placement + one model replica per
        # device.  None = single default device (replicas dict stays lazy).
        self._devices = list(devices) if devices else None
        self._bank_device: dict[int, Any] = {}
        self._var_replicas: dict[Any, Any] = {}

        if variables is not None:
            self.variables = variables
        elif checkpoint is not None:
            from picopose_tpu.models.dinov2 import VIT_CONFIGS
            from picopose_tpu.utils.checkpoint import load_any

            restored = load_any(checkpoint, depth=VIT_CONFIGS[vit_type].depth)
            # an orbax TRAINING checkpoint restores the whole TrainState;
            # keep only the model variables (same unwrap as run_test.py)
            self.variables = {
                "params": restored["params"],
                "batch_stats": restored.get("batch_stats", {}),
            }
        else:
            warnings.warn("PoseEstimator with RANDOM weights (no checkpoint)")
            imgs = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
            self.variables = self.model.init(
                jax.random.PRNGKey(0), imgs, jnp.ones((1, img_size, img_size)), True
            )
        if jnp.dtype(self.model.compute_dtype) == jnp.bfloat16:
            # bitwise-identical bf16 weight storage (utils/precast.py)
            from picopose_tpu.utils.precast import precast_inference_params

            self.variables = precast_inference_params(self.variables)

    # ---- object registration -------------------------------------------

    def _next_device(self):
        """Round-robin placement device for the next bank (None = default)."""
        if not self._devices:
            return None
        return self._devices[len(self._banks) % len(self._devices)]

    def _vars_on(self, dev):
        """Model replica on `dev` (lazily materialized, one per chip)."""
        if dev is None:
            return self.variables
        if dev not in self._var_replicas:
            import jax

            self._var_replicas[dev] = jax.device_put(self.variables, dev)
        return self._var_replicas[dev]

    def _put(self, x, dev):
        if dev is None:
            return self._jnp.asarray(x)
        import jax

        return jax.device_put(self._jnp.asarray(x), dev)

    def register_object(self, obj_id: int, template_dir: str) -> None:
        """Build and cache the template bank from a rendered-template dir
        (layout: <dir>/<obj:06d>/*.png + <dir>/object_poses/<obj:06d>.npy,
        the reference's run_test.py:120-134 bank source)."""
        from picopose_tpu.data.bop import load_template_views
        from picopose_tpu.eval.pipeline import build_bank

        tem = load_template_views(
            template_dir, obj_id, self.n_template_view,
            self.img_size, self.pts_size, self.rgb_mask_flag,
        )
        dev = self._next_device()
        self._banks[obj_id] = build_bank(
            self.model, self._vars_on(dev),
            self._put(tem["tem_rgb"], dev), self._put(tem["tem_mask"], dev),
            self._put(tem["tem_pts3d"], dev), self._put(tem["tem_pose"], dev),
            self._put(tem["tem_K"], dev), self._put(tem["tem_M"], dev),
        )
        self._bank_device[obj_id] = dev

    def register_bank(self, obj_id: int, bank) -> None:
        """Cache a prebuilt TemplateBank (e.g. shared across processes)."""
        dev = self._next_device()
        if dev is not None:
            import jax

            bank = jax.device_put(bank, dev)
        self._banks[obj_id] = bank
        self._bank_device[obj_id] = dev

    @property
    def objects(self) -> list[int]:
        return sorted(self._banks)

    # ---- bank persistence (skip the per-object ViT pass on restart) ------

    def save_banks(self, directory: str) -> None:
        """Persist every registered bank as <dir>/bank_<obj:06d>.npz.

        Banks are checkpoint-dependent (they cache backbone + DPT
        activations); re-export after loading different weights."""
        import os

        os.makedirs(directory, exist_ok=True)
        for obj_id, bank in self._banks.items():
            arrs: dict[str, np.ndarray] = {}
            for field in ("mask", "pts3d", "pose", "K", "M"):
                arrs[field] = np.asarray(getattr(bank, field))
            for i, f in enumerate(bank.feats):
                # bf16 has no numpy dtype: store raw uint16 + a dtype tag
                arrs[f"feats_{i}"] = _to_numpy_typed(f)
            if bank.dpt is not None:
                for i, d in enumerate(bank.dpt):
                    arrs[f"dpt_{i}"] = _to_numpy_typed(d)
            np.savez(
                os.path.join(directory, f"bank_{obj_id:06d}.npz"), **arrs
            )

    def load_banks(self, directory: str) -> list[int]:
        """Load every bank_<obj>.npz in `directory`; returns the obj ids."""
        import glob
        import os
        import re

        from picopose_tpu.eval.pipeline import TemplateBank

        jnp = self._jnp
        loaded = []
        for path in sorted(glob.glob(os.path.join(directory, "bank_*.npz"))):
            m = re.search(r"bank_(\d+)\.npz$", path)
            if not m:
                continue
            obj_id = int(m.group(1))
            z = np.load(path)
            feats = tuple(
                jnp.asarray(_from_numpy_typed(z[f"feats_{i}"]))
                for i in range(sum(1 for k in z.files if k.startswith("feats_")))
            )
            n_dpt = sum(1 for k in z.files if k.startswith("dpt_"))
            dpt = (
                tuple(
                    jnp.asarray(_from_numpy_typed(z[f"dpt_{i}"]))
                    for i in range(n_dpt)
                )
                if n_dpt
                else None
            )
            bank = TemplateBank(
                feats=feats,
                mask=jnp.asarray(z["mask"]),
                pts3d=jnp.asarray(z["pts3d"]),
                pose=jnp.asarray(z["pose"]),
                K=jnp.asarray(z["K"]),
                M=jnp.asarray(z["M"]),
                dpt=dpt,
            )
            dev = self._next_device()
            if dev is not None:
                import jax

                bank = jax.device_put(bank, dev)
            self._banks[obj_id] = bank
            self._bank_device[obj_id] = dev
            loaded.append(obj_id)
        return loaded

    # ---- inference -------------------------------------------------------

    def _decode(self, rgb: np.ndarray, K: np.ndarray, det: Mapping[str, Any]):
        """One detection dict -> model-ready crop (the reference's
        mask-bbox rules, bop_test_dataset.py:146-209 / data/bop.py)."""
        H, W = rgb.shape[:2]
        mask = det.get("mask")
        if mask is None and "segmentation" in det:
            mask = rle_to_mask(det["segmentation"])
        if mask is not None and mask.sum() > self.min_mask_px:
            bbox = mask_square_bbox(mask.astype(np.uint8))
        else:
            if "bbox" not in det:
                raise ValueError("detection needs a usable 'mask'/'segmentation' or 'bbox'")
            bx = det["bbox"]  # xywh, CNOS convention
            bbox = square_bbox((bx[1], bx[1] + bx[3], bx[0], bx[0] + bx[2]), (H, W))
            if mask is None:
                mask = np.zeros((H, W), np.uint8)
                mask[bbox[0]:bbox[1], bbox[2]:bbox[3]] = 1
        M = crop_matrix(bbox, self.img_size)
        return {
            "rgb": crop_and_normalize_rgb(
                rgb, bbox, self.img_size, mask, self.rgb_mask_flag
            ),
            "mask": crop_mask(mask, bbox, self.img_size),
            "M": M,
            "K": K.astype(np.float32),
            "pts2d": grid_pts2d(M, self.img_size, self.pts_size),
        }

    def _decode_mask(self, H: int, W: int, det: Mapping[str, Any]):
        """Detection -> (mask, raw yxyx bbox, use_bbox) for the on-device
        preprocessing stage — only the RLE/rect decode stays on host; the
        same mask-vs-box selection rules as _decode."""
        mask = det.get("mask")
        if mask is None and "segmentation" in det:
            mask = rle_to_mask(det["segmentation"])
        if mask is not None and mask.sum() > self.min_mask_px:
            return mask.astype(np.uint8), (0, 0, 0, 0), False
        if "bbox" not in det:
            raise ValueError(
                "detection needs a usable 'mask'/'segmentation' or 'bbox'"
            )
        bx = det["bbox"]  # xywh, CNOS convention
        raw = (bx[1], bx[1] + bx[3], bx[0], bx[0] + bx[2])
        if mask is None:
            sq = square_bbox(raw, (H, W))
            mask = np.zeros((H, W), np.uint8)
            mask[sq[0]:sq[1], sq[2]:sq[3]] = 1
        return mask.astype(np.uint8), raw, True

    def _device_batch(self, rgb, K, dets, pad: int, dev):
        """Chunk batch via the jitted preprocess stage (ops/preprocess.py)."""
        from picopose_tpu.ops.preprocess import preprocess_frame

        H, W = rgb.shape[:2]
        trip = [self._decode_mask(H, W, d) for d in dets]
        masks = np.stack([t[0] for t in trip])
        bboxes = np.asarray([t[1] for t in trip], np.int32)
        use_bbox = np.asarray([t[2] for t in trip], bool)
        if pad:
            masks = np.concatenate([masks, np.repeat(masks[-1:], pad, 0)])
            bboxes = np.concatenate([bboxes, np.repeat(bboxes[-1:], pad, 0)])
            use_bbox = np.concatenate(
                [use_bbox, np.repeat(use_bbox[-1:], pad, 0)]
            )
        batch = preprocess_frame(
            self._put(rgb, dev), self._put(masks, dev),
            bboxes=self._put(bboxes, dev), use_bbox=self._put(use_bbox, dev),
            out=self.img_size, pts=self.pts_size,
            mask_rgb=self.rgb_mask_flag,
        )
        batch["real_K"] = self._put(
            np.repeat(K.astype(np.float32)[None], len(dets) + pad, 0), dev
        )
        return batch

    def estimate(
        self,
        rgb: np.ndarray,
        K: np.ndarray,
        detections: Sequence[Mapping[str, Any]],
    ) -> list[PoseResult]:
        """Estimate a pose per detection on one (H, W, 3) uint8 RGB frame.

        Each detection: {"obj_id": int (or "category_id"),
        "mask": (H, W) binary | "segmentation": RLE dict | "bbox": xywh,
        optional "score"}.  Returns results in input order."""
        import jax

        from picopose_tpu.eval.pipeline import run_batch_jit

        jnp = self._jnp
        rgb = np.ascontiguousarray(rgb)
        per_obj: dict[int, list[int]] = {}
        for i, det in enumerate(detections):
            obj = int(det.get("obj_id", det.get("category_id", -1)))
            if obj not in self._banks:
                raise KeyError(
                    f"object {obj} not registered (have {self.objects})"
                )
            per_obj.setdefault(obj, []).append(i)

        results: list[PoseResult | None] = [None] * len(detections)
        # dispatch every chunk first (async; chunks whose banks live on
        # different chips execute concurrently), then fetch
        pending: list[tuple[list[int], int, Any]] = []
        for obj, idxs in per_obj.items():
            bank = self._banks[obj]
            dev = self._bank_device.get(obj)
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s : s + self.max_batch]
                pad = self.max_batch - len(chunk)
                if self.device_preprocess:
                    batch = self._device_batch(
                        rgb, K, [detections[i] for i in chunk], pad, dev
                    )
                else:
                    insts = [
                        self._decode(rgb, K, detections[i]) for i in chunk
                    ]
                    batch = {}
                    for name in ("rgb", "mask", "M", "K", "pts2d"):
                        arr = np.stack([inst[name] for inst in insts])
                        if pad:
                            arr = np.concatenate(
                                [arr, np.repeat(arr[-1:], pad, axis=0)], axis=0
                            )
                        batch[f"real_{name}"] = self._put(arr, dev)
                self._key, sub = jax.random.split(self._key)
                out = run_batch_jit(
                    self.model, self._vars_on(dev), batch, bank, sub,
                    hyp=self.hyp, pnp_iters=self.pnp_iters,
                    stage3_topk=self.stage3_topk,
                )
                pending.append((chunk, obj, out))
        for chunk, obj, out in pending:
            out = jax.tree.map(np.asarray, out)
            for bi, i in enumerate(chunk):
                results[i] = PoseResult(
                    obj_id=obj,
                    R=out.R[bi, 0],
                    t=out.t[bi, 0],
                    score=float(out.inlier_ratio[bi, 0]),
                    success=bool(out.pnp_success[bi, 0]),
                    template_score=float(out.template_score[bi, 0]),
                )
        return results  # type: ignore[return-value]
