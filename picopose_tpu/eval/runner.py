"""BOP evaluation driver: dataset sweep -> poses -> bop19 CSV.

Equivalent of run_test.py:103-221, restructured for TPU efficiency:

  * instances are grouped BY OBJECT across the whole dataset (metadata only,
    no decode) and processed in fixed-size padded batches (XLA wants static
    shapes; the reference iterates image-by-image with ragged instance
    counts, run_test.py:145-159);
  * host decode STREAMS: a background thread pool produces assembled padded
    batches into a bounded queue while the device runs the previous batch —
    the same overlap the reference gets from DataLoader workers
    (config/base.yaml:75) — with a byte-capped LRU of decoded full images
    absorbing the multi-object-per-image repeats. Memory is bounded by
    (queue depth x batch bytes) + the cache budget, never by dataset size;
  * one TemplateBank per object, built once (all 4 feature levels), and
    dropped after its group is processed (bounds HBM across many-object
    datasets like tless/hb);
  * per-image time = sum of its instances' amortized batch time + CNOS
    seg_time, matching the reference's accounting (run_test.py:188-193);
    batch time is divided by the REAL instance count, not the padded size.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
import time
from collections import OrderedDict

import numpy as np

from picopose_tpu.data.bop import BOPTestDataset, load_template_views
from picopose_tpu.eval.bop_csv import format_row, write_csv
from picopose_tpu.eval.pipeline import build_bank, run_batch_jit

_BATCH_KEYS = ("rgb", "mask", "M", "K", "pts2d")


class RawImageCache:
    """Byte-capped LRU of decoded full images (rgb uint8 + K).

    Images on BOP contain several target objects (all 8 on lmo), and the
    object-major sweep revisits each image once per object it contains; the
    cache turns those revisits into hits instead of repeated JPEG decodes.
    """

    def __init__(self, dataset: BOPTestDataset, budget_bytes: int = 2 << 30):
        self.dataset = dataset
        self.budget = budget_bytes
        self._store: OrderedDict[int, tuple] = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, index: int):
        with self._lock:
            if index in self._store:
                self._store.move_to_end(index)
                self.hits += 1
                return self._store[index]
        rgb, K = self.dataset.load_raw(index)  # decode outside the lock
        with self._lock:
            if index not in self._store:
                self.misses += 1
                self._store[index] = (rgb, K)
                self._bytes += rgb.nbytes
                while self._bytes > self.budget and len(self._store) > 1:
                    _, (old, _k) = self._store.popitem(last=False)
                    self._bytes -= old.nbytes
            return self._store[index]


def _stream_batches(
    dataset: BOPTestDataset,
    cache: RawImageCache,
    refs: list[tuple[int, int, dict]],
    batch_size: int,
    workers: int = 8,
    depth: int = 3,
):
    """Yield (chunk_refs, B, padded numpy batch) with background decode."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def decode(ref):
        img_idx, _inst_idx, det = ref
        rgb, K = cache.get(img_idx)
        return dataset.decode_instance(rgb, K, det)

    def produce():
        try:
            with cf.ThreadPoolExecutor(workers) as pool:
                for s in range(0, len(refs), batch_size):
                    if stop.is_set():
                        return
                    chunk = refs[s : s + batch_size]
                    insts = list(pool.map(decode, chunk))
                    B = len(chunk)
                    pad = batch_size - B
                    batch = {}
                    for name in _BATCH_KEYS:
                        arr = np.stack([getattr(i, name) for i in insts])
                        if pad:
                            arr = np.concatenate(
                                [arr, np.repeat(arr[-1:], pad, axis=0)], axis=0
                            )
                        batch[f"real_{name}"] = arr
                    q.put((chunk, B, batch))
            q.put(None)
        except BaseException as e:  # surface producer errors in the consumer
            q.put(e)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


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
    stage3_topk: int | None = None,
    progress: bool = True,
    use_mesh: bool | None = None,
    decode_workers: int = 8,
    cache_bytes: int = 2 << 30,
) -> str:
    """Run the full dataset; returns the CSV path.

    With multiple local devices (use_mesh=None auto-detects), batches are
    sharded over the mesh 'data' axis and the bank/params replicated — the
    same one-program pipeline runs data-parallel across the slice.
    """
    import jax
    import jax.numpy as jnp

    from picopose_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from picopose_tpu.utils.precast import precast_inference_params

    if jnp.dtype(model.compute_dtype) == jnp.bfloat16:
        # store bf16-consumed weights as bf16 in HBM (bitwise-identical
        # outputs, half the weight traffic — utils/precast.py)
        variables = precast_inference_params(variables)

    if use_mesh is None:
        use_mesh = jax.device_count() > 1
    mesh = make_mesh() if use_mesh else None
    bsh = None
    if mesh is not None:
        # round batches up to a multiple of the data axis
        n_data = mesh.shape["data"]
        batch_size = ((batch_size + n_data - 1) // n_data) * n_data
        variables = jax.device_put(variables, replicated(mesh))
        bsh = batch_sharding(mesh)

    # ---- metadata pass: group instance refs by object, no pixel decode
    n_images = len(dataset)
    metas = [dataset.image_meta(i) for i in range(n_images)]
    dets_per_image = [dataset.dets(i) for i in range(n_images)]
    by_obj: dict[int, list[tuple[int, int, dict]]] = {}
    for ii, dets in enumerate(dets_per_image):
        for k, det in enumerate(dets):
            by_obj.setdefault(det["category_id"], []).append((ii, k, det))
    if progress:
        n_inst = sum(len(d) for d in dets_per_image)
        print(
            f"[{dataset.dataset}] {n_images} images, {n_inst} instances, "
            f"{len(by_obj)} objects (streaming decode, {decode_workers} workers)"
        )

    cache = RawImageCache(dataset, budget_bytes=cache_bytes)
    results: dict[tuple[int, int], dict] = {}
    image_model_time = np.zeros(n_images)

    for obj_id, refs in sorted(by_obj.items()):
        t0 = time.perf_counter()
        stream = _stream_batches(
            dataset, cache, refs, batch_size, workers=decode_workers
        )
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

        def _drain(pending, mark):
            """Fetch a dispatched batch's outputs and record its results.

            dt is the steady-state inter-drain time (decode + dispatch +
            device + fetch, overlapped), amortized over REAL instances —
            padding is replicated work, not work the padded instances
            would have cost."""
            chunk, B, out = pending
            out = jax.tree.map(np.asarray, out)
            now = time.perf_counter()
            dt = now - mark
            for bi, (img_idx, inst_idx, _det) in enumerate(chunk):
                results[(img_idx, inst_idx)] = {
                    "R": out.R[bi, 0], "t": out.t[bi, 0],
                    "inlier_ratio": out.inlier_ratio[bi, 0],
                }
                image_model_time[img_idx] += dt / B
            return now

        # Software pipeline, depth 2: dispatch batch i, then fetch batch
        # i-2 — the host round-trip of materializing previous results
        # overlaps the device executing the two in-flight batches, so
        # fetch-latency jitter hides entirely under device execution (the
        # reference gets the same overlap from CUDA async dispatch +
        # DataLoader workers, run_test.py:141-159).
        pending: list = []
        mark = time.perf_counter()
        for chunk, B, batch in stream:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if bsh is not None:
                batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
            key, sub = jax.random.split(key)
            out = run_batch_jit(
                model, variables, batch, bank, sub, hyp=hyp,
                pnp_iters=pnp_iters, stage3_topk=stage3_topk,
            )
            pending.append((chunk, B, out))
            if len(pending) > 2:
                mark = _drain(pending.pop(0), mark)
        for p in pending:
            mark = _drain(p, mark)
        del bank

    if progress:
        tot = cache.hits + cache.misses
        print(
            f"[{dataset.dataset}] image cache: {cache.hits}/{tot} hits "
            f"({cache.misses} decodes for {n_images} images)"
        )

    # ---- CSV (from metadata; crops are long gone)
    rows = []
    total_time = 0.0
    for ii, meta in enumerate(metas):
        img_time = image_model_time[ii] + meta.seg_time
        total_time += img_time
        for k, det in enumerate(dets_per_image[ii]):
            res = results[(ii, k)]
            rows.append(
                format_row(
                    meta.scene_id, meta.img_id, det["category_id"],
                    det["score"], res["R"], res["t"], img_time,
                )
            )
    if progress and n_images:
        print(f"[{dataset.dataset}] mean per-image time {total_time / n_images:.3f}s")

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    write_csv(save_path, rows)
    return save_path
