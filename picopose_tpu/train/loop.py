"""The training loop: data prefetch, sharded steps, checkpoints, logging.

Equivalent of run_train.py:49-131 + the PL Trainer behaviors the reference
relies on (epoch-start dataset.reset(), per-step LR schedule, per-epoch
checkpoints keeping all, resume) — without Lightning:

  * host loading runs in a thread pool with a bounded prefetch queue
    (replacing DataLoader num_workers=10, config/base.yaml:55);
  * the step is ONE jitted program sharded over the mesh 'data' axis
    (replacing NCCL DDP);
  * orbax checkpoints per epoch; `resume` restores the latest.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Iterator

import jax
import numpy as np

from picopose_tpu.data.megapose import MegaPoseTrainingDataset, collate
from picopose_tpu.parallel.mesh import make_mesh, shard_batch
from picopose_tpu.parallel.shardings import shard_state, state_shardings
from picopose_tpu.train.step import init_state, make_optimizer, make_train_step
from picopose_tpu.utils import checkpoint as ckpt
from picopose_tpu.utils.logging import TrainLogger


def prefetch_batches(
    dataset: MegaPoseTrainingDataset,
    batch_size: int,
    steps: int,
    workers: int = 10,
    depth: int = 2,
) -> Iterator[dict[str, np.ndarray]]:
    """Threaded batch producer with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    # retry indices come from the dataset's own rng when available so the
    # whole epoch stream is reproducible (reference keeps retries inside the
    # seeded Dataset too, training_dataset.py:126-135)
    rng = getattr(dataset, "rng", None) or np.random.default_rng(0)

    def produce():
        with cf.ThreadPoolExecutor(workers) as pool:
            idx = 0
            for _ in range(steps):
                if stop.is_set():
                    return
                futs = [pool.submit(dataset.get, idx + j) for j in range(batch_size)]
                idx += batch_size
                samples = [f.result() for f in futs]
                samples = [s for s in samples if s is not None]
                while len(samples) < batch_size:  # extremely rare
                    s = dataset.get(int(rng.integers(1 << 30)))
                    if s is not None:
                        samples.append(s)
                q.put(collate(samples))
        q.put(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            b = q.get()
            if b is None:
                return
            yield b
    finally:
        stop.set()


def device_prefetch(
    batches: Iterator[dict[str, np.ndarray]], mesh, depth: int = 2
) -> Iterator[dict]:
    """Upload batches to device `depth` ahead of consumption.

    A synchronous shard_batch in the step loop serializes ~10-15 MB of
    host->device copies into every step gap; on a remote-attached device
    (the development tunnel) that upload latency dominated the measured
    step time (~2 s/iter wall vs ~0.4 s of device work).  One uploader
    thread with a bounded queue keeps copies under compute — the same
    depth-2 discipline as the eval runner's dispatch/fetch pipeline.
    jax.device_put is thread-safe; shard_batch takes the mesh explicitly
    so the (thread-local) mesh context is not needed here."""
    q: queue.Queue = queue.Queue(maxsize=depth)

    def produce():
        try:
            for b in batches:
                q.put(
                    shard_batch(
                        {k: jax.numpy.asarray(v) for k, v in b.items()}, mesh
                    )
                )
            q.put(None)
        except BaseException as e:  # surface in the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


_W_DS = None
_W_SEED = 0
_W_EPOCH = 0


def _mp_init(ds_kwargs: dict, seed: int, epoch: int):
    """Worker initializer: build a private dataset whose epoch SUBSET matches
    every other worker's (rng seeded by (seed, epoch) for reset)."""
    global _W_DS, _W_SEED, _W_EPOCH
    _W_DS = MegaPoseTrainingDataset(seed=seed, **ds_kwargs)
    _W_DS.rng = np.random.default_rng([seed, epoch])
    _W_DS.reset()
    _W_SEED, _W_EPOCH = seed, epoch


def _mp_batch(args: tuple[int, int]) -> dict[str, np.ndarray]:
    """Produce ONE collated batch in the worker and ship it as a single
    pickle — per-sample IPC costs ~30% (tools/loader_bench.py procs_ipc arm);
    one contiguous array per key amortizes it away.

    The per-sample draws (instance pick, aug, retries, template view) are
    reseeded from (seed, epoch, start): batch `start` is bit-identical no
    matter which worker runs it or in what order — a STRONGER contract than
    torch DataLoader worker processes, whose streams depend on scheduling."""
    start, bs = args
    _W_DS.rng = np.random.default_rng([_W_SEED, _W_EPOCH, start])
    samples = []
    for j in range(bs):
        s = _W_DS.get(start + j)
        if s is not None:
            samples.append(s)
    while len(samples) < bs:  # extremely rare
        s = _W_DS.get(int(_W_DS.rng.integers(1 << 30)))
        if s is not None:
            samples.append(s)
    return collate(samples)


def mp_prefetch_batches(
    ds_kwargs: dict,
    batch_size: int,
    steps: int,
    workers: int = 10,
    depth: int = 2,
    seed: int = 0,
    epoch: int = 0,
) -> Iterator[dict[str, np.ndarray]]:
    """Process-pool batch producer: each worker owns a dataset replica and
    emits whole collated batches.  This is the scaling backend for hosts with
    many cores — json decode, PIL color aug and png/jpg decode hold the GIL,
    so the thread path tops out at ~1 core (measured: tools/loader_bench.py).

    ds_kwargs are MegaPoseTrainingDataset kwargs minus seed.  Batches come
    back in order; up to workers+depth are in flight.

    The pool uses the 'spawn' start method: the trainer has a live TPU
    client (tunnel sockets + runtime threads) by the time the first epoch
    starts, and fork()ing that state into workers is undefined — spawned
    workers re-import cleanly and never touch jax."""
    import concurrent.futures as _cf
    import multiprocessing as _mp

    with _cf.ProcessPoolExecutor(
        workers, mp_context=_mp.get_context("spawn"),
        initializer=_mp_init, initargs=(ds_kwargs, seed, epoch),
    ) as pool:
        inflight: list = []
        nxt = 0
        for _ in range(min(steps, workers + depth)):
            inflight.append(pool.submit(_mp_batch, (nxt, batch_size)))
            nxt += batch_size
        done = 0
        while done < steps:
            fut = inflight.pop(0)
            if done + len(inflight) + 1 < steps:
                inflight.append(pool.submit(_mp_batch, (nxt, batch_size)))
                nxt += batch_size
            yield fut.result()
            done += 1


def _graft_tree(old, new, what: str, subset: bool = False):
    """Return `old`'s pytree filled with `new`'s leaves, matched by key path.

    `new` is a (possibly nested) plain-dict tree.  With subset=False every
    leaf of `old` must be covered; with subset=True only the paths present
    in `new` are replaced.  Raises ValueError on unknown paths or shape
    mismatches (e.g. a checkpoint for a different vit_type)."""
    import flax

    flat_new = flax.traverse_util.flatten_dict(flax.core.unfreeze(new))
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(old)

    def pkey(path):
        return tuple(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )

    old_paths = [pkey(p) for p, _ in paths_leaves]
    old_set = set(old_paths)
    extra = [k for k in flat_new if tuple(map(str, k)) not in old_set]
    missing = (
        [] if subset else [k for k in old_paths if k not in flat_new]
    )
    if missing or extra:
        raise ValueError(
            f"{what}: checkpoint layout mismatch (missing "
            f"{missing[:3]}{'…' if len(missing) > 3 else ''}, unexpected "
            f"{extra[:3]}{'…' if len(extra) > 3 else ''})"
        )
    leaves = []
    for (path, v), kp in zip(paths_leaves, old_paths):
        if kp not in flat_new:
            leaves.append(v)
            continue
        nv = flat_new[kp]
        if tuple(np.shape(nv)) != tuple(np.shape(v)):
            raise ValueError(
                f"{what}: shape mismatch at {'/'.join(kp)}: checkpoint "
                f"{tuple(np.shape(nv))} vs model {tuple(np.shape(v))}"
            )
        leaves.append(jax.numpy.asarray(nv, dtype=v.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def warm_start(state, path: str, num_levels: int = 3):
    """Initialize model weights from a checkpoint before training starts.

    Covers the reference's two pretrained entry points: a FULL PicoPose
    checkpoint — an orbax step dir or the reference's Lightning .ckpt,
    ported (run_test.py:240-245 load semantics) — or raw torch-hub DINOv2
    BACKBONE weights (.pth), the reference's `pretrained: True` warm start
    (model/stage1/feature_extractor.py:27,73-77); the backbone case leaves
    every non-ViT parameter at its fresh init.  Optimizer state and the
    step counter stay fresh either way; layouts and shapes are validated
    so a checkpoint for a different vit_type fails loudly."""
    import os

    vit = state.params["feature_extractor"]["dinov2"]
    depth = sum(1 for k in vit if str(k).startswith("blocks_"))

    backbone_only = False
    if os.path.isdir(path):
        variables = ckpt.load_any(path, depth=depth)
    else:
        from picopose_tpu.utils.torch_port import (
            load_torch_checkpoint,
            port_dinov2,
            port_picopose,
            to_numpy_state_dict,
        )

        raw = load_torch_checkpoint(path)
        sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
        keys = [str(k) for k in sd]
        if any(
            k.startswith(("network.", "feature_extractor.")) for k in keys
        ):
            variables = port_picopose(raw, depth=depth, num_levels=num_levels)
        elif any(k.startswith("patch_embed.proj.") for k in keys):
            backbone_only = True
            try:
                ported = port_dinov2(
                    to_numpy_state_dict(sd), depth, strict=True
                )["dinov2"]
            except ValueError as e:
                raise ValueError(f"{path}: {e}") from None
            variables = {
                "params": {"feature_extractor": {"dinov2": ported}}
            }
        else:
            raise ValueError(
                f"{path}: neither a PicoPose checkpoint nor DINOv2 backbone "
                "weights (no recognizable keys)"
            )

    params = _graft_tree(
        state.params, variables["params"],
        "warm_start params", subset=backbone_only,
    )
    stats = state.batch_stats
    new_stats = variables.get("batch_stats")
    if new_stats and jax.tree_util.tree_leaves(stats):
        stats = _graft_tree(stats, new_stats, "warm_start batch_stats")
    return state._replace(params=params, batch_stats=stats)


def run_training(
    cfg,
    model,
    log_dir: str,
    resume: bool = False,
    max_steps: int | None = None,
) -> None:
    tx = make_optimizer(
        base_lr=cfg.optimizer.lr,
        max_iters=cfg.lr_scheduler.max_iters,
        warmup_iters=cfg.lr_scheduler.warmup_iters,
        warmup_factor=cfg.lr_scheduler.warmup_factor,
        betas=tuple(cfg.optimizer.betas),
        eps=cfg.optimizer.eps,
        weight_decay=cfg.optimizer.weight_decay,
        opt_type=cfg.optimizer.type,
        schedule_type=cfg.lr_scheduler.type,
        grad_accum=cfg.trainer.grad_accum,
    )
    sched = __import__(
        "picopose_tpu.train.step", fromlist=["warmup_cosine_schedule"]
    ).warmup_cosine_schedule(
        cfg.optimizer.lr, cfg.lr_scheduler.max_iters,
        cfg.lr_scheduler.warmup_iters, cfg.lr_scheduler.warmup_factor,
    )

    n_dev = cfg.trainer.n_devices
    n_model = cfg.trainer.n_model
    mesh = make_mesh(
        n_data=None if n_dev == -1 else n_dev, n_model=n_model
    )
    state = init_state(
        model, tx, jax.random.PRNGKey(cfg.trainer.rd_seed),
        batch_size=1, crop=cfg.train_dataset.img_size,
    )
    mgr = ckpt.manager(log_dir)
    # weight warm start (trainer.init_checkpoint): pretrained DINOv2
    # backbone or a full checkpoint to fine-tune; skipped when resuming
    # (the orbax restore below overrides everything anyway)
    init_ckpt = getattr(cfg.trainer, "init_checkpoint", None)
    if init_ckpt and not (resume and mgr.latest_step() is not None):
        state = warm_start(
            state, str(init_ckpt), num_levels=cfg.model.num_levels
        )
        print(f"warm-started model weights from {init_ckpt}")
    # parallel mode (trainer.parallel): 'ddp' replicates state (the
    # reference's NCCL-DDP semantics); 'fsdp'/'tp'/'fsdp_tp' shard
    # parameters + optimizer moments over the mesh (parallel/shardings.py)
    state = shard_state(state, mesh, cfg.trainer.parallel)
    step_fn = make_train_step(
        model, tx,
        state_shardings(mesh, state, cfg.trainer.parallel), mesh,
    )

    if resume and mgr.latest_step() is not None:
        state = ckpt.restore(mgr, None, state)
        print(f"resumed from step {int(state.step)}")

    ds_kwargs = dict(
        data_dir=cfg.train_dataset.data_dir,
        img_size=cfg.train_dataset.img_size,
        min_visib_fract=cfg.train_dataset.min_visib_fract,
        min_px_count_visib=cfg.train_dataset.min_px_count_visib,
        augment_real=cfg.train_dataset.augment_real,
        rgb_mask_flag=cfg.train_dataset.rgb_mask_flag,
    )
    dataset = MegaPoseTrainingDataset(seed=cfg.trainer.rd_seed, **ds_kwargs)
    backend = getattr(cfg.train_dataloader, "backend", "auto")
    if backend == "auto":
        # procs is the documented default for multi-core (TPU) hosts; the
        # measured arms behind this choice are in docs/DATA.md
        backend = "procs" if (os.cpu_count() or 1) >= 8 else "threads"
    use_procs = backend == "procs"

    bs = cfg.train_dataloader.bs * mesh.shape["data"]
    iters_per_epoch = cfg.lr_scheduler.max_iters // cfg.trainer.training_epoch
    logger = TrainLogger(log_dir, every=cfg.trainer.iters_to_print)
    key = jax.random.PRNGKey(cfg.trainer.rd_seed + 1)

    step = int(state.step)
    total = max_steps or cfg.lr_scheduler.max_iters
    with mesh:
        for epoch in range(cfg.trainer.training_epoch):
            if step >= total:
                break
            dataset.reset()  # epoch resampling (utils/lite.py:29-31)
            n_steps = min(iters_per_epoch, total - step)
            if use_procs:
                batches = mp_prefetch_batches(
                    ds_kwargs, bs, steps=n_steps,
                    workers=cfg.train_dataloader.num_workers,
                    seed=cfg.trainer.rd_seed, epoch=epoch,
                )
            else:
                batches = prefetch_batches(
                    dataset, bs, steps=n_steps,
                    workers=cfg.train_dataloader.num_workers,
                )
            for sharded in device_prefetch(batches, mesh):
                key, sub = jax.random.split(key)
                state, losses = step_fn(state, sharded, sub)
                step += 1
                # deferred logging: no host sync until the print boundary
                # (reference cadence: utils/logging.py:149-155).  With
                # grad_accum the schedule advances once per effective step.
                logger.step_async(
                    step, losses,
                    float(sched(step // cfg.trainer.grad_accum)),
                )
                if step >= total:
                    break
            logger.epoch(epoch, step)
            cadence = getattr(cfg.trainer, "ckpt_every_epochs", 1)
            if (
                (epoch + 1) % max(cadence, 1) == 0
                or step >= total
                or epoch == cfg.trainer.training_epoch - 1
            ):
                ckpt.save(mgr, step, state)
        mgr.wait_until_finished()
