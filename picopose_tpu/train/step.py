"""The jitted training step: forward (all three stages) + losses + update.

Equivalent of the reference's Lite.training_step / training_step_end +
Net.forward_train (utils/lite.py:33-39, model/picopose.py:114-137) and the
optimizer setup in run_train.py:77-91, compiled into one pjit-sharded XLA
program: batch sharded over the mesh 'data' axis, parameters replicated,
gradient all-reduce inserted by XLA.

Optimizer (run_train.py:79 / config/base.yaml:9-20): AdamW lr 1e-5, betas
(0.5, 0.999), eps 1e-6, weight-decay 5e-4; warmup-cosine over 400k steps
(warmup 1000 iters, factor 1e-3).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from picopose_tpu.geom.affine import (
    gt_translation_scale_inplane,
    mmul,
    relative_affine,
)
from picopose_tpu.models.correspondence import init_correspondences
from picopose_tpu.train.augment import perturb_affine
from picopose_tpu.train.keypoints import sample_keypoints
from picopose_tpu.train.losses import (
    flow_level_loss,
    info_nce_loss,
    stage2_loss,
    total_loss,
)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def warmup_cosine_schedule(
    base_lr: float,
    max_iters: int,
    warmup_iters: int = 1000,
    warmup_factor: float = 1e-3,
) -> optax.Schedule:
    """lr(i) = base * wf(i) * 0.5 * (1 + cos(pi * i / max_iters)), linear
    warmup wf from `warmup_factor` to 1 (utils/lr_scheduler.py:306-345,
    409-433 — note the cosine phase starts at 0, not after warmup)."""

    def schedule(i):
        i = jnp.asarray(i, jnp.float32)
        alpha = jnp.clip(i / warmup_iters, 0.0, 1.0)
        wf = warmup_factor * (1.0 - alpha) + alpha
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * i / max_iters))
        return base_lr * wf * cos

    return schedule


def poly_schedule(
    base_lr: float, max_iters: int, power: float = 0.9
) -> optax.Schedule:
    """PolyLR (utils/lr_scheduler.py PolyLR; present but unused upstream)."""

    def schedule(i):
        i = jnp.asarray(i, jnp.float32)
        return base_lr * (1.0 - jnp.clip(i / max_iters, 0.0, 1.0)) ** power

    return schedule


def step_schedule(
    base_lr: float, step_size: int, gamma: float = 0.1
) -> optax.Schedule:
    """StepLR (utils/lr_scheduler.py StepLR; present but unused upstream)."""

    def schedule(i):
        return base_lr * gamma ** jnp.floor(
            jnp.asarray(i, jnp.float32) / step_size
        )

    return schedule


def make_optimizer(
    base_lr: float = 1e-5,
    max_iters: int = 400_000,
    warmup_iters: int = 1000,
    warmup_factor: float = 1e-3,
    betas: tuple[float, float] = (0.5, 0.999),
    eps: float = 1e-6,
    weight_decay: float = 5e-4,
    opt_type: str = "AdamW",
    schedule_type: str = "WarmupCosineLR",
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """Optimizer factory covering the reference's choices
    (run_train.py:78-83: AdamW / Adam / SGD; config/base.yaml:9-20).

    grad_accum > 1 wraps the optimizer in optax.MultiSteps: gradients
    accumulate over k micro-batches and the update (and the LR schedule)
    advances once per k — effective batch = k × global batch without the
    HBM of the larger batch.  Beyond the reference (which has no
    accumulation; PL's accumulate_grad_batches is never configured).
    `max_iters` then counts EFFECTIVE optimizer steps.
    """
    if schedule_type == "WarmupCosineLR":
        lr = warmup_cosine_schedule(base_lr, max_iters, warmup_iters, warmup_factor)
    elif schedule_type == "PolyLR":
        lr = poly_schedule(base_lr, max_iters)
    elif schedule_type == "StepLR":
        lr = step_schedule(base_lr, max_iters // 3)
    else:
        raise ValueError(f"unknown lr_scheduler type {schedule_type}")

    if opt_type == "AdamW":
        tx = optax.adamw(
            lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
        )
    elif opt_type == "Adam":
        tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif opt_type == "SGD":
        tx = optax.sgd(lr, momentum=betas[0])
    else:
        raise ValueError(f"unknown optimizer type {opt_type}")
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def forward_train(model, params, batch_stats, batch, key):
    """All three stages + losses on a training batch.

    batch keys (see provider/training_dataset.py:153-170 for the reference
    contract; NHWC here): real_rgb, real_mask, real_M, real_K, real_pose,
    real_full_depth, and the tem_* counterparts (tem depth in meters).
    Returns (loss_dict, new_batch_stats).
    """
    variables = {"params": params, "batch_stats": batch_stats}
    k_aug, _ = jax.random.split(key)

    # GT keypoint correspondences (model/picopose.py:29-50):
    # src=template, tar=real; T maps src camera frame -> tar camera frame.
    real_pose, tem_pose = batch["real_pose"], batch["tem_pose"]
    T_tem2real = mmul(real_pose, jnp.linalg.inv(tem_pose))
    kp = sample_keypoints(
        src_mask=batch["tem_mask"], src_M=batch["tem_M"], src_K=batch["tem_K"],
        src_depth=batch["tem_full_depth"],
        tar_mask=batch["real_mask"], tar_M=batch["real_M"], tar_K=batch["real_K"],
        T_src2tar=T_tem2real,
        tar_depth=batch["real_full_depth"],
        crop=batch["tem_mask"].shape[1],
    )
    losses = {}
    mutated = batch_stats

    # ---- stage 1
    feats_real, mut = model.apply(
        {"params": params, "batch_stats": mutated},
        batch["real_rgb"], method=model.features, mutable=["batch_stats"],
    )
    mutated = mut["batch_stats"]
    feats_tem, mut = model.apply(
        {"params": params, "batch_stats": mutated},
        batch["tem_rgb"], method=model.features, mutable=["batch_stats"],
    )
    mutated = mut["batch_stats"]
    losses["loss_info"] = info_nce_loss(
        feats_tem[-1], feats_real[-1], kp.src_pts, kp.tar_pts, kp.valid
    )

    # ---- stage 2
    (translation, scale, inplane), mut = model.apply(
        {"params": params, "batch_stats": mutated},
        feats_tem[-1], feats_real[-1], batch["tem_mask"],
        method=model.stage2, mutable=["batch_stats"],
    )
    mutated = mut["batch_stats"]
    gt_trans, gt_scale, gt_inplane = gt_translation_scale_inplane(
        batch["tem_K"], batch["real_K"], batch["tem_pose"], batch["real_pose"],
        batch["tem_M"], batch["real_M"],
    )
    l_t, l_s, l_i = stage2_loss(
        translation, scale, inplane, gt_trans, gt_scale, gt_inplane
    )
    losses["loss_2d_trans"], losses["loss_scale"], losses["loss_inplane"] = l_t, l_s, l_i

    # ---- stage 3: noisy-GT affine init (model/picopose.py:131-135)
    gt_Ms = relative_affine(
        batch["tem_K"], batch["real_K"], batch["tem_pose"], batch["real_pose"],
        batch["tem_M"], batch["real_M"],
    )
    noisy_Ms = jax.lax.stop_gradient(perturb_affine(k_aug, gt_Ms))
    init_flow, init_cert = init_correspondences(
        noisy_Ms, batch["tem_mask"], grid=feats_tem[-1].shape[1]
    )
    (flows, certs), mut = model.apply(
        {"params": params, "batch_stats": mutated},
        feats_tem, feats_real, init_flow, init_cert, True,
        method=model.stage3, mutable=["batch_stats"],
    )
    mutated = mut["batch_stats"]
    for lvl, (f, c) in enumerate(zip(flows, certs)):
        lf, lc = flow_level_loss(f, c, kp.tar_pts, kp.valid)
        losses[f"loss_flow{lvl}"] = lf
        losses[f"loss_certainty{lvl}"] = lc

    losses["loss"] = total_loss(losses)
    return losses, mutated


@functools.partial(jax.jit, static_argnames=("model", "tx"), donate_argnums=(2,))
def train_step(model, tx, state: TrainState, batch, key):
    """One optimizer step.  Returns (new_state, loss_dict)."""

    def loss_fn(params):
        losses, new_stats = forward_train(
            model, params, state.batch_stats, batch, key
        )
        return losses["loss"], (losses, new_stats)

    grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        TrainState(state.step + 1, new_params, new_stats, new_opt),
        losses,
    )


def make_train_step(model, tx, state_shardings=None, mesh=None):
    """Jit the step with explicit output shardings.

    With `state_shardings` (a TrainState-shaped NamedSharding tree from
    parallel/shardings.py) the updated state is pinned to the same layout
    every step — required for fsdp/tp modes, where XLA's propagation from
    donated inputs is not otherwise guaranteed to round-trip the sharded
    layout.  Loss scalars are pinned replicated.  Signature of the returned
    fn: (state, batch, key) -> (new_state, losses).
    """

    def _step(state: TrainState, batch, key):
        def loss_fn(params):
            losses, new_stats = forward_train(
                model, params, state.batch_stats, batch, key
            )
            return losses["loss"], (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, new_params, new_stats, new_opt),
            losses,
        )

    if state_shardings is None:
        return jax.jit(_step, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec

    assert mesh is not None, "mesh required alongside state_shardings"
    rep = NamedSharding(mesh, PartitionSpec())
    return jax.jit(
        _step, donate_argnums=(0,), out_shardings=(state_shardings, rep)
    )


def init_state(model, tx, key, batch_size: int = 2, crop: int = 224) -> TrainState:
    imgs = jnp.zeros((batch_size, crop, crop, 3), jnp.float32)
    masks = jnp.ones((batch_size, crop, crop), jnp.float32)
    variables = model.init(key, imgs, masks, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        jnp.zeros((), jnp.int32), params, batch_stats, tx.init(params)
    )
