"""Host input-pipeline benchmark: can the loader feed the chips?

Measures MegaPoseTrainingDataset end-to-end sample production (json decode,
RLE, jpg/png decode, color aug, crop+CLIP-normalize, template load) under
several execution models and compares against the training step's
consumption rate:

    required samples/s = chips * per_chip_batch / step_seconds

The reference feeds 4 GPUs from 10 DataLoader worker PROCESSES
(config/base.yaml:55, provider/training_dataset.py); our trainer uses a
thread pool (train/loop.py::prefetch_batches).  PIL Enhance ops and json
decode hold the GIL, so this bench A/Bs threads vs processes and the C++
fastpath vs the numpy fallbacks (PICOPOSE_NO_FASTPATH) to show where the
host ceiling is.

    python tools/loader_bench.py --data_dir /tmp/ar_world_r4/mp \
        --bs 32 --chips 8 --step_ms 863

Emits one JSON line (tools-bench convention).
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DS = None


def _proc_init(data_dir: str, augment: bool, no_fastpath: bool):
    global _DS
    if no_fastpath:
        os.environ["PICOPOSE_NO_FASTPATH"] = "1"
    from picopose_tpu.data.megapose import MegaPoseTrainingDataset

    # cache_templates=0: on a small bench tree every template would hit the
    # LRU, overstating throughput vs real MegaPose (~1k objects, cap 64)
    _DS = MegaPoseTrainingDataset(
        data_dir, augment_real=augment, seed=os.getpid() % 10000,
        cache_templates=0,
    )
    _DS.reset()


def _proc_get(i: int) -> bool:
    # return only validity: the REAL pipeline pays sample pickling too, but
    # a production process-pool design would batch in the worker and ship
    # one collated array (cheap) — measure the compute ceiling here and
    # report IPC separately via the 'procs_ipc' arm.
    return _DS.get(i) is not None


def _proc_get_ipc(i: int):
    return _DS.get(i)


def timed_serial(ds, n: int) -> float:
    t0 = time.perf_counter()
    ok = sum(ds.get(i) is not None for i in range(n))
    dt = time.perf_counter() - t0
    assert ok == n
    return n / dt


def timed_threads(ds, n: int, workers: int) -> float:
    with cf.ThreadPoolExecutor(workers) as pool:
        t0 = time.perf_counter()
        res = list(pool.map(ds.get, range(n)))
        dt = time.perf_counter() - t0
    assert all(r is not None for r in res)
    return n / dt


def timed_procs(data_dir, n: int, workers: int, augment: bool,
                no_fastpath: bool, ipc: bool) -> float:
    fn = _proc_get_ipc if ipc else _proc_get
    with cf.ProcessPoolExecutor(
        workers, initializer=_proc_init,
        initargs=(data_dir, augment, no_fastpath),
    ) as pool:
        # warm the workers (dataset construction off the clock)
        list(pool.map(fn, range(workers)))
        t0 = time.perf_counter()
        res = list(pool.map(fn, range(n), chunksize=4))
        dt = time.perf_counter() - t0
    assert all(r is not None and r is not False for r in res)
    return n / dt


def timed_procs_batched(data_dir, bs: int, steps: int, workers: int,
                        augment: bool) -> float:
    """The process-backend production path: train/loop.py
    mp_prefetch_batches — workers collate whole batches, one pickle each."""
    from picopose_tpu.train.loop import mp_prefetch_batches

    ds_kwargs = dict(data_dir=data_dir, augment_real=augment,
                     cache_templates=0)
    # time the WHOLE run including pool spin-up + per-worker dataset
    # construction: a warmup-discard scheme over-counts here because the
    # producer prefills workers+depth batches concurrently with the batch
    # being discarded, so the "timed" region would just drain finished work
    t0 = time.perf_counter()
    got = 0
    for b in mp_prefetch_batches(ds_kwargs, bs, steps, workers=workers):
        got += len(next(iter(b.values())))
    dt = time.perf_counter() - t0
    assert got == steps * bs
    return got / dt


def timed_prefetch(ds, bs: int, steps: int, workers: int) -> float:
    """The production path: train/loop.py prefetch_batches incl. collate."""
    from picopose_tpu.train.loop import prefetch_batches

    it = prefetch_batches(ds, bs, steps + 1, workers=workers)
    next(it)  # warmup batch (thread spin-up)
    t0 = time.perf_counter()
    got = 0
    for b in it:
        got += len(next(iter(b.values())))
    dt = time.perf_counter() - t0
    assert got == steps * bs
    return got / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True,
                    help="MegaPose tree root (e.g. <world>/mp)")
    ap.add_argument("--bs", type=int, default=32, help="per-chip batch")
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--step_ms", type=float, default=863.0,
                    help="measured per-step wall ms at --bs (docs/PERF.md: "
                         "863 ms for ViT-L batch-32 remat on v5e)")
    ap.add_argument("--n", type=int, default=256,
                    help="samples per measured arm")
    ap.add_argument("--workers", type=int, default=10,
                    help="pool width (reference: num_workers=10)")
    ap.add_argument("--augment", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--host_cores", type=int, default=112,
                    help="vCPUs on the target TPU host for the projection "
                         "arm (v5e-8 hosts: 112)")
    args = ap.parse_args()

    from picopose_tpu.data.megapose import MegaPoseTrainingDataset
    from picopose_tpu.native import fastpath

    def make_ds(augment=args.augment, cache=0):
        ds = MegaPoseTrainingDataset(
            args.data_dir, augment_real=augment, seed=0,
            cache_templates=cache,
        )
        ds.reset()
        return ds

    n, w = args.n, args.workers
    r = {}
    r["serial"] = timed_serial(make_ds(), min(n, 64))
    # the cache-on arm shows the LRU's ceiling effect; on a small bench
    # tree it is an upper bound (real MegaPose: ~1k objects vs cap 64)
    r["serial_cached_templates"] = timed_serial(make_ds(cache=64), min(n, 64))
    if fastpath.accelerated():
        os.environ["PICOPOSE_NO_FASTPATH"] = "1"
        r["serial_no_fastpath"] = timed_serial(make_ds(), min(n, 64))
        del os.environ["PICOPOSE_NO_FASTPATH"]
    r["serial_no_aug"] = timed_serial(make_ds(augment=False), min(n, 64))
    r["threads"] = timed_threads(make_ds(), n, w)
    r["procs"] = timed_procs(args.data_dir, n, w, args.augment, False, False)
    r["procs_ipc"] = timed_procs(args.data_dir, n, w, args.augment,
                                 False, True)
    if fastpath.accelerated():
        r["procs_no_fastpath"] = timed_procs(
            args.data_dir, n, w, args.augment, True, False
        )
    r["prefetch_batches"] = timed_prefetch(
        make_ds(), args.bs, max(2, n // args.bs), w
    )
    r["procs_batched"] = timed_procs_batched(
        args.data_dir, args.bs, max(2, n // args.bs), w, args.augment
    )

    required = args.chips * args.bs / (args.step_ms / 1000.0)
    best = max(r.values())
    # the scaling arms can only show speedup when the box HAS cores; on a
    # 1-core dev box the meaningful capacity number is per-core serial rate
    # x host cores (TPU hosts: v5e-8 ~112 vCPU) via the process backend.
    # projected_* assumes the procs backend scales with workers up to the
    # host core count (workers are share-nothing: private dataset replica,
    # one collated pickle per batch) — measured directly when cores > 1.
    cores = os.cpu_count() or 1
    per_core = r["serial"]
    measured_scaled = cores > 1
    projected = per_core * min(args.workers, args.host_cores)
    out = {
        "metric": "loader_samples_per_sec",
        "value": round(best if measured_scaled else projected, 2),
        "unit": "samples/s",
        "vs_baseline": round(
            (best if measured_scaled else projected) / required, 3
        ),
        "required_samples_per_sec": round(required, 1),
        "projected_tpu_host_samples_per_sec": round(projected, 2),
        "projection": not measured_scaled,
        "best_arm": max(r, key=r.get),
        "arms": {k: round(v, 2) for k, v in r.items()},
        "host_cores": cores,
        "per_core_samples_per_sec": round(per_core, 2),
        "cores_required": round(required / per_core, 1),
        "workers": w,
        "chips": args.chips,
        "bs": args.bs,
        "step_ms": args.step_ms,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
