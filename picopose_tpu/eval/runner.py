"""BOP evaluation driver: dataset sweep -> poses -> bop19 CSV.

Equivalent of run_test.py:103-221, restructured for TPU efficiency:

  * instances are grouped BY OBJECT across the whole dataset and processed
    in fixed-size padded batches (XLA wants static shapes; the reference
    iterates image-by-image with ragged instance counts, run_test.py:145-159);
  * one TemplateBank per object, built once (all 4 feature levels), and
    dropped after its group is processed (bounds HBM across many-object
    datasets like tless/hb);
  * per-image time = sum of its instances' amortized batch time + CNOS
    seg_time, matching the reference's accounting (run_test.py:188-193).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np

from picopose_tpu.data.bop import BOPTestDataset, load_template_views
from picopose_tpu.eval.bop_csv import format_row, write_csv
from picopose_tpu.eval.pipeline import build_bank, run_batch_jit


@dataclass
class InstanceRef:
    image_index: int
    instance_index: int


def evaluate_dataset(
    model,
    variables,
    dataset: BOPTestDataset,
    template_dir: str,
    save_path: str,
    key,
    hyp: int = 5,
    batch_size: int = 16,
    pnp_iters: int = 150,
    progress: bool = True,
    use_mesh: bool | None = None,
) -> str:
    """Run the full dataset; returns the CSV path.

    With multiple local devices (use_mesh=None auto-detects), batches are
    sharded over the mesh 'data' axis and the bank/params replicated — the
    same one-program pipeline runs data-parallel across the slice.
    """
    import jax
    import jax.numpy as jnp

    from picopose_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    if use_mesh is None:
        use_mesh = jax.device_count() > 1
    mesh = make_mesh() if use_mesh else None
    if mesh is not None:
        # round batches up to a multiple of the data axis
        n_data = mesh.shape["data"]
        batch_size = ((batch_size + n_data - 1) // n_data) * n_data
        variables = jax.device_put(variables, replicated(mesh))

    t_load0 = time.perf_counter()
    images = [dataset.load_image(i) for i in range(len(dataset))]
    if progress:
        print(
            f"[{dataset.dataset}] decoded {len(images)} images "
            f"({sum(len(im.instances) for im in images)} instances) "
            f"in {time.perf_counter() - t_load0:.1f}s"
        )

    # group instance refs by object
    by_obj: dict[int, list[InstanceRef]] = {}
    for ii, im in enumerate(images):
        for k, inst in enumerate(im.instances):
            by_obj.setdefault(inst.obj_id, []).append(InstanceRef(ii, k))

    results: dict[tuple[int, int], dict] = {}
    image_model_time = np.zeros(len(images))

    for obj_id, refs in sorted(by_obj.items()):
        t0 = time.perf_counter()
        tem = load_template_views(
            template_dir, obj_id, dataset.n_template_view,
            dataset.img_size, dataset.pts_size, dataset.rgb_mask_flag,
        )
        bank = build_bank(
            model, variables,
            jnp.asarray(tem["tem_rgb"]), jnp.asarray(tem["tem_mask"]),
            jnp.asarray(tem["tem_pts3d"]), jnp.asarray(tem["tem_pose"]),
            jnp.asarray(tem["tem_K"]), jnp.asarray(tem["tem_M"]),
        )
        if mesh is not None:
            bank = jax.device_put(bank, replicated(mesh))
        if progress:
            print(
                f"[{dataset.dataset}] obj {obj_id}: bank "
                f"({dataset.n_template_view} views) in "
                f"{time.perf_counter() - t0:.1f}s; {len(refs)} instances"
            )

        for s in range(0, len(refs), batch_size):
            chunk = refs[s : s + batch_size]
            B = len(chunk)
            pad = batch_size - B
            insts = [images[r.image_index].instances[r.instance_index] for r in chunk]

            def stack(attr):
                arr = np.stack([getattr(i, attr) for i in insts])
                if pad:
                    arr = np.concatenate(
                        [arr, np.repeat(arr[-1:], pad, axis=0)], axis=0
                    )
                return jnp.asarray(arr)

            batch = {
                "real_rgb": stack("rgb"),
                "real_mask": stack("mask"),
                "real_M": stack("M"),
                "real_K": stack("K"),
                "real_pts2d": stack("pts2d"),
            }
            if mesh is not None:
                bsh = batch_sharding(mesh)
                batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
            key, sub = jax.random.split(key)
            tb0 = time.perf_counter()
            out = run_batch_jit(
                model, variables, batch, bank, sub, hyp=hyp, pnp_iters=pnp_iters
            )
            out = jax.tree.map(np.asarray, out)
            dt = time.perf_counter() - tb0
            for bi, r in enumerate(chunk):
                results[(r.image_index, r.instance_index)] = {
                    "R": out.R[bi, 0], "t": out.t[bi, 0],
                    "inlier_ratio": out.inlier_ratio[bi, 0],
                }
                image_model_time[r.image_index] += dt / batch_size
        del bank

    # ---- CSV
    rows = []
    total_time = 0.0
    for ii, im in enumerate(images):
        img_time = image_model_time[ii] + im.seg_time
        total_time += img_time
        for k, inst in enumerate(im.instances):
            res = results[(ii, k)]
            rows.append(
                format_row(
                    im.scene_id, im.img_id, inst.obj_id, inst.score,
                    res["R"], res["t"], img_time,
                )
            )
    if progress and images:
        print(f"[{dataset.dataset}] mean per-image time {total_time / len(images):.3f}s")

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    write_csv(save_path, rows)
    return save_path
