"""Export picopose_tpu parameter trees as reference PyTorch checkpoints.

The exact inverse of utils/torch_port.py: a TPU-trained `PicoPose`
variables dict becomes a state dict keyed like the reference `Net`
(model/picopose.py attribute names), optionally wrapped in a
PyTorch-Lightning-style checkpoint (`{"state_dict": {"network.<k>": ...}}`)
that the reference's `Lite.load_from_checkpoint` path consumes
(run_test.py:240-245).

Layout rules (inverses of the porter's, torch_port.py:12-18):
  * Dense: weight = kernel.T;
  * Conv:  weight = kernel.transpose(3, 2, 0, 1)          (HWIO -> OIHW);
  * ConvTranspose: weight = kernel[::-1, ::-1].transpose(2, 3, 0, 1);
  * BatchNorm: running stats come from batch_stats; `num_batches_tracked`
    is emitted as 0 (torch buffer, never used in eval).
  * AffineRegressor.fc1: our NHWC flatten is permuted back to torch's
    NCHW flatten.

Keys for modules that exist in the reference but are DEAD at runtime
(DPT refinenet1/output convs — dpt.py:270, ViT mask_token/final norm,
RAFT ConvGRU/decoder) are not emitted: load with `strict=False`; the
round-trip and reference-forward tests (tests/test_torch_export.py) prove
every live key is present and correctly laid out.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _dense(out, k, tree):
    out[f"{k}.weight"] = _np(tree["kernel"]).T.copy()
    if "bias" in tree:
        out[f"{k}.bias"] = _np(tree["bias"]).copy()


def _conv(out, k, tree):
    out[f"{k}.weight"] = _np(tree["kernel"]).transpose(3, 2, 0, 1).copy()
    if "bias" in tree:
        out[f"{k}.bias"] = _np(tree["bias"]).copy()


def _convT(out, k, tree):
    kernel = _np(tree["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1).copy()
    out[f"{k}.weight"] = kernel
    if "bias" in tree:
        out[f"{k}.bias"] = _np(tree["bias"]).copy()


def _ln(out, k, tree):
    out[f"{k}.weight"] = _np(tree["scale"]).copy()
    out[f"{k}.bias"] = _np(tree["bias"]).copy()


def _bn(out, k, params, stats):
    out[f"{k}.weight"] = _np(params["scale"]).copy()
    out[f"{k}.bias"] = _np(params["bias"]).copy()
    out[f"{k}.running_mean"] = _np(stats["mean"]).copy()
    out[f"{k}.running_var"] = _np(stats["var"]).copy()
    out[f"{k}.num_batches_tracked"] = np.array(0, dtype=np.int64)


def export_dinov2(tree: Mapping[str, Any], prefix: str = "") -> dict:
    """flax {'dinov2': ...} subtree -> torch DINOv2 state dict keys."""
    t = tree["dinov2"]
    p = prefix
    out: dict[str, np.ndarray] = {
        f"{p}cls_token": _np(t["cls_token"]).copy(),
        f"{p}pos_embed": _np(t["pos_embed"]).copy(),
    }
    _conv(out, f"{p}patch_embed.proj", t["patch_embed"])
    depth = sum(1 for k in t if k.startswith("blocks_"))
    for i in range(depth):
        blk = t[f"blocks_{i}"]
        b = f"{p}blocks.{i}"
        _ln(out, f"{b}.norm1", blk["norm1"])
        _dense(out, f"{b}.attn.qkv", blk["attn"]["qkv"])
        _dense(out, f"{b}.attn.proj", blk["attn"]["proj"])
        out[f"{b}.ls1.gamma"] = _np(blk["ls1"]["gamma"]).copy()
        _ln(out, f"{b}.norm2", blk["norm2"])
        out[f"{b}.ls2.gamma"] = _np(blk["ls2"]["gamma"]).copy()
        mlp = blk["mlp"]
        if "fc1" in mlp:
            _dense(out, f"{b}.mlp.fc1", mlp["fc1"])
            _dense(out, f"{b}.mlp.fc2", mlp["fc2"])
        else:  # SwiGLU (vit_giant2)
            _dense(out, f"{b}.mlp.w12", mlp["w12"])
            _dense(out, f"{b}.mlp.w3", mlp["w3"])
    return out


def _export_affine_regressor(tree, p) -> dict:
    out: dict[str, np.ndarray] = {}
    _conv(out, f"{p}.features.0", tree["conv0"])
    out[f"{p}.features.1.weight"] = _np(tree["gn0"]["scale"]).copy()
    out[f"{p}.features.1.bias"] = _np(tree["gn0"]["bias"]).copy()
    _conv(out, f"{p}.features.3", tree["conv1"])
    out[f"{p}.features.4.weight"] = _np(tree["gn1"]["scale"]).copy()
    out[f"{p}.features.4.bias"] = _np(tree["gn1"]["bias"]).copy()
    # fc1: our kernel rows are NHWC-flat (8, 8, C); torch expects (C, 8, 8)
    kernel = _np(tree["fc1"]["kernel"])  # (8*8*C, out)
    C = _np(tree["conv1"]["kernel"]).shape[-1]
    w = kernel.T.reshape(-1, 8, 8, C).transpose(0, 3, 1, 2)
    out[f"{p}.fc1.weight"] = w.reshape(w.shape[0], -1).copy()
    out[f"{p}.fc1.bias"] = _np(tree["fc1"]["bias"]).copy()
    _dense(out, f"{p}.fc2", tree["fc2"])
    for head in ("translation_predictor", "scale_predictor", "inplane_predictor"):
        for j in (0, 2, 4):
            _dense(out, f"{p}.{head}.{j}", tree[f"{head}_{j}"])
    return out


def _export_dpt(params, stats, p) -> dict:
    out: dict[str, np.ndarray] = {}
    for i in range(4):
        _conv(out, f"{p}.projects.{i}", params[f"projects_{i}"])
        _conv(out, f"{p}.scratch.layer{i + 1}_rn", params[f"layer{i + 1}_rn"])
    _convT(out, f"{p}.resize_layers.0", params["resize_0"])
    _convT(out, f"{p}.resize_layers.1", params["resize_1"])
    _conv(out, f"{p}.resize_layers.3", params["resize_3"])
    for rn in (2, 3, 4):
        rp, rs = params[f"refinenet{rn}"], stats[f"refinenet{rn}"]
        for unit in ("resConfUnit1", "resConfUnit2"):
            if unit not in rp:
                # refinenet4 takes a single input, so its resConfUnit1 is
                # dead in the reference (dpt.py FeatureFusionBlock with one
                # arg) and never built in our model; ported trees carry it
                # (torch constructs it), model-init trees don't.
                continue
            base = f"{p}.scratch.refinenet{rn}.{unit}"
            for c in ("conv1", "conv2"):
                _conv(out, f"{base}.{c}", rp[unit][c])
            for b in ("bn1", "bn2"):
                _bn(out, f"{base}.{b}", rp[unit][b], rs[unit][b])
        _conv(out, f"{p}.scratch.refinenet{rn}.out_conv", rp["out_conv"])
    return out


def _export_flow_decoder(params, stats, p, num_levels=3) -> dict:
    out: dict[str, np.ndarray] = {}
    for l in range(num_levels):
        _conv(out, f"{p}.proj.{l}.0", params[f"proj_{l}_conv"])
        _bn(out, f"{p}.proj.{l}.1", params[f"proj_{l}_bn"], stats[f"proj_{l}_bn"])
        enc = params[f"encoder_{l}"]
        for name, i in (("corr_net_0", 0), ("corr_net_1", 1)):
            _conv(out, f"{p}.encoder.{l}.corr_net.{i}.conv", enc[name])
        for name, i in (("flow_net_0", 0), ("flow_net_1", 1)):
            _conv(out, f"{p}.encoder.{l}.flow_net.{i}.conv", enc[name])
        _conv(out, f"{p}.encoder.{l}.out_net.0.conv", enc["out_net_0"])
        for kind, mod in (("flow_pred", "flow_pred"), ("mask_pred", "mask_pred")):
            head = params[f"{kind}_{l}"]
            _conv(out, f"{p}.{mod}.{l}.layers.0.conv", head["layers_0"])
            _conv(out, f"{p}.{mod}.{l}.layers.1.conv", head["layers_1"])
            _conv(out, f"{p}.{mod}.{l}.predict_layer", head["predict"])
    return out


def export_picopose(variables: Mapping[str, Any], num_levels: int = 3) -> dict:
    """PicoPose variables -> reference `Net` state dict (numpy values).

    Inverse of torch_port.port_picopose; round-trip identity is pinned in
    tests/test_torch_export.py."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: dict[str, np.ndarray] = {}
    out.update(
        export_dinov2(
            params["feature_extractor"], prefix="feature_extractor.dinov2."
        )
    )
    out.update(_export_affine_regressor(params["affine_regressor"], "affine_regressor"))
    out.update(
        _export_dpt(params["dpt_head"], stats["dpt_head"], "offset_regressor.dpt_head")
    )
    out.update(
        _export_flow_decoder(
            params["flow_decoder"],
            stats["flow_decoder"],
            "offset_regressor.flow_decoder",
            num_levels,
        )
    )
    return out


def save_torch_checkpoint(
    variables: Mapping[str, Any], path: str, lightning: bool = True
) -> None:
    """Write a reference-loadable .ckpt (host-side, lazy torch import).

    lightning=True wraps keys as `network.<k>` under 'state_dict', the
    layout `Lite.load_from_checkpoint` expects (utils/lite.py via
    run_test.py:240-245); load into the reference with strict=False (dead
    reference modules are not emitted — module docstring)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          export_picopose(variables).items()}
    if lightning:
        torch.save({"state_dict": {f"network.{k}": v for k, v in sd.items()}}, path)
    else:
        torch.save(sd, path)
