"""Configuration: dataclasses + YAML, mirroring config/base.yaml keys.

The reference uses OmegaConf with CLI-arg mutation (run_test.py:85-98,
run_train.py:134-140); here a typed dataclass tree is loaded from the same
YAML shape (configs/base.yaml) with dotted-path overrides.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class TrainerConfig:
    rd_seed: int = 0
    training_epoch: int = 10
    iters_to_print: int = 100
    n_devices: int = -1  # -1: all local devices (the 'data' mesh axis)
    # parameter/optimizer sharding: ddp | fsdp | tp | fsdp_tp
    # (parallel/shardings.py; the reference is ddp-only, base.yaml:5-7)
    parallel: str = "ddp"
    n_model: int = 1  # size of the 'model' mesh axis (tp modes)
    # accumulate gradients over k micro-batches before each optimizer
    # step (optax.MultiSteps; 1 = off, the reference's behavior)
    grad_accum: int = 1
    # weight warm start before training: a full PicoPose checkpoint
    # (orbax step dir or reference .ckpt) or raw torch-hub DINOv2
    # backbone weights — the reference's stage1 `pretrained: True`
    # (train/loop.py::warm_start).  None = random init.
    init_checkpoint: str | None = None
    # checkpoint every N epochs (the final epoch always saves).  1 =
    # the reference's per-epoch cadence (save_top_k=-1, keep all); a
    # short-epoch run (synthetic overfit loops) pays ~10 s of orbax
    # save wait + ~0.7 GB disk PER EPOCH at cadence 1.
    ckpt_every_epochs: int = 1


@dataclass
class OptimizerConfig:
    type: str = "AdamW"
    lr: float = 1e-5
    betas: tuple[float, float] = (0.5, 0.999)
    eps: float = 1e-6
    weight_decay: float = 5e-4


@dataclass
class LRSchedulerConfig:
    type: str = "WarmupCosineLR"
    max_iters: int = 400_000
    warmup_factor: float = 1e-3
    warmup_iters: int = 1000


@dataclass
class ModelConfig:
    hypothesis: int = 5
    vit_type: str = "dinov2_vitl14"
    blocks_to_take: tuple[int, ...] = (5, 11, 17, 23)
    num_levels: int = 3
    radius: int = 4
    compute_dtype: str = "bfloat16"
    # opt-in serving speed mode: run stage 3 + PnP only on the top-k
    # MATCHING hypotheses (None = reference-faithful: all of them).
    # Changes hypothesis-ranking semantics — see eval/pipeline.py.
    stage3_topk: int | None = None
    # rematerialize ViT blocks in the backward pass: fits a batch-32
    # ViT-L training step in one 16 GB chip (18.3 GB without) for ~1
    # extra forward of FLOPs.  No effect on inference.
    remat_vit: bool = False
    # opt-in int8-MXU stage-3 convs (dynamic symmetric quantization,
    # ops/qconv.py).  ~1% conv-output error vs the reference's float
    # convs; OFF until A/B'd on real BOP data (same policy as
    # PICOPOSE_MATCH_INT8).
    quantize_stage3: bool = False
    # fused flow+mask XHead conv stacks (identical params/math, fewer
    # passes over the shared input — models/flow.py::_fused_xheads).
    # On by default; set false to run the reference-shaped unfused stacks.
    fuse_xheads: bool = True


@dataclass
class TrainDatasetConfig:
    data_dir: str = "data/MegaPose-Training-Data"
    img_size: int = 224
    min_visib_fract: float = 0.3
    min_px_count_visib: int = 1024
    rgb_mask_flag: bool = False
    augment_real: bool = True


@dataclass
class TestDatasetConfig:
    data_dir: str = "data/BOP_Datasets"
    template_dir: str = "data/BOP_Datasets/templates"
    detection_dir: str = "data/bop23_default_detections_for_task4/cnos-fastsam"
    img_size: int = 224
    minimum_n_point: int = 8
    rgb_mask_flag: bool = False
    seg_filter_score: float = 0.0
    n_template_view: int = 162
    pts_size: int = 64


@dataclass
class DataloaderConfig:
    bs: int = 8
    num_workers: int = 10
    shuffle: bool = True
    drop_last: bool = True
    # 'threads' (in-process pool, exactly reproducible stream), 'procs'
    # (worker processes producing whole collated batches — the scaling
    # backend for GIL-bound decode/augment, mirroring the reference's
    # DataLoader num_workers processes, config/base.yaml:55), or 'auto'
    # (default): procs when the host has the cores for it (>= 8, i.e. any
    # real TPU host — v5e-8 hosts have 112 vCPU), threads on small dev
    # boxes where process spin-up outweighs GIL relief.  Measured arms in
    # docs/DATA.md (tools/loader_bench.py).
    backend: str = "auto"


@dataclass
class Config:
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train_dataset: TrainDatasetConfig = field(default_factory=TrainDatasetConfig)
    test_dataset: TestDatasetConfig = field(default_factory=TestDatasetConfig)
    train_dataloader: DataloaderConfig = field(default_factory=DataloaderConfig)
    test_dataloader: DataloaderConfig = field(
        default_factory=lambda: DataloaderConfig(bs=4, shuffle=False, drop_last=False)
    )


def _merge(dc: Any, data: dict) -> Any:
    if not dataclasses.is_dataclass(dc):
        return data
    names = {f.name: f for f in dataclasses.fields(dc)}
    updates = {}
    for k, v in (data or {}).items():
        if k not in names:
            continue
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            updates[k] = _merge(cur, v)
        elif isinstance(cur, tuple) and isinstance(v, list):
            updates[k] = tuple(v)
        else:
            updates[k] = v
    return dataclasses.replace(dc, **updates)


def load_config(path: str | None = None, overrides: list[str] | None = None) -> Config:
    """Load YAML config + 'a.b.c=value' overrides."""
    cfg = Config()
    if path:
        with open(path) as f:
            cfg = _merge(cfg, yaml.safe_load(f) or {})
    for ov in overrides or []:
        key, _, val = ov.partition("=")
        parts = key.strip().split(".")
        node: dict = {}
        leaf = node
        for p in parts[:-1]:
            leaf[p] = {}
            leaf = leaf[p]
        leaf[parts[-1]] = yaml.safe_load(val)
        cfg = _merge(cfg, node)
    return cfg
