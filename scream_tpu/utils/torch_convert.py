"""Convert reference PyTorch checkpoints (`.pth`) into flax parameter trees.

A user of the reference downloads ``params/point-generator.pth`` /
``kitti-generator.pth`` / ``dem-generator.pth`` / ``discriminator.pth``
(`/root/reference/train_3d_match.py:30-31`, `evaluate_3d_match.py:190`) and
loads them with ``net.load_state_dict``. This module maps those state_dicts
onto this package's flax modules so the same weights drive the TPU path:

  * ``PointTransformer`` (`/root/reference/models/pointnet.py:8-36`) ->
    :class:`scream_tpu.models.point_transformer.PointTransformer`
  * ``DEMTransformer`` (`:103-133`) -> :class:`DEMTransformer`
  * ``NLayerDiscriminator`` (`/root/reference/models/gan.py:15-62`) ->
    :class:`scream_tpu.models.gan.PatchDiscriminator`

Layout rules:
  * ``nn.Linear`` weight ``(out, in)``        -> flax ``kernel`` = W.T
  * ``nn.Conv1d``  weight ``(out, in, 1)``    -> flax Dense ``kernel`` = W[:, :, 0].T
    (the reference's kernel-size-1 Conv1d over points IS a per-point Dense)
  * ``nn.Conv2d``  weight ``(out, in, kh, kw)`` -> flax Conv ``kernel`` =
    transpose to ``(kh, kw, in, out)``
  * ``nn.LayerNorm`` / ``nn.BatchNorm2d`` ``weight``/``bias`` -> ``scale``/``bias``;
    BatchNorm running stats -> the flax ``batch_stats`` collection.

Module-name map (reference -> here):
  * ``stem.{i}``            -> ``trunk/stem_{i}`` (shared stem)
  * ``stem_dsm.{i}``        -> ``trunk/stem_src_{i}``; ``stem_dem.{i}`` -> ``trunk/stem_tgt_{i}``
  * ``cross.{2i}``          -> ``trunk/cross_self_{i}`` (plain MHAttention)
  * ``cross.{2i+1}.layer``  -> ``trunk/cross_attn_{i}`` (CrossAttention wrapper)
  * ``coor_mlp.{0,2,4}``    -> ``trunk/head_{0,1,out}``
  * MHAttention leaves: ``q/k/v_proj, merge`` -> same; ``mlp.0/2`` ->
    ``ffn_in/ffn_out``; ``norm1/norm2`` -> same.

The renderer (``generator.*``) holds no parameters (its pixel grid is a plain
attribute), and ``pe_func`` is parameter-free, so the state_dicts above are
covered completely.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor | ndarray -> float32 ndarray (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _conv1d_as_dense(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{key}.weight"])  # (out, in, 1)
    if w.ndim != 3 or w.shape[-1] != 1:
        raise ValueError(f"{key}: expected kernel-size-1 Conv1d, got {w.shape}")
    out = {"kernel": w[:, :, 0].T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _norm(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _attention_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference ``MHAttention`` under ``prefix`` -> AttentionBlock params
    (`/root/reference/models/transformer.py:47-72`)."""
    return {
        "q_proj": _linear(sd, f"{prefix}.q_proj"),
        "k_proj": _linear(sd, f"{prefix}.k_proj"),
        "v_proj": _linear(sd, f"{prefix}.v_proj"),
        "merge": _linear(sd, f"{prefix}.merge"),
        "ffn_in": _linear(sd, f"{prefix}.mlp.0"),
        "ffn_out": _linear(sd, f"{prefix}.mlp.2"),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
    }


def _trunk_common(sd: Mapping[str, Any], n_cross: int) -> Dict[str, Any]:
    trunk: Dict[str, Any] = {
        "embedding": _conv1d_as_dense(sd, "embedding"),
        "pre_norm": _norm(sd, "pre_norm"),
        "head_0": _conv1d_as_dense(sd, "coor_mlp.0"),
        "head_1": _conv1d_as_dense(sd, "coor_mlp.2"),
        "head_out": _conv1d_as_dense(sd, "coor_mlp.4"),
    }
    for i in range(n_cross):
        # Even cross entries are plain MHAttention (self), odd are
        # CrossAttention wrapping MHAttention at ``.layer``
        # (`/root/reference/models/pointnet.py:22-25,53-57`).
        trunk[f"cross_self_{i}"] = _attention_block(sd, f"cross.{2 * i}")
        trunk[f"cross_attn_{i}"] = _attention_block(sd, f"cross.{2 * i + 1}.layer")
    return trunk


def _infer_layer_count(sd: Mapping[str, Any], fmt: str) -> int:
    n = 0
    while f"{fmt % n}.q_proj.weight" in sd:
        n += 1
    return n


def _infer_cross_count(sd: Mapping[str, Any]) -> int:
    """Cross blocks come in (MHAttention, CrossAttention) pairs; the odd
    entries nest their weights under ``.layer``
    (`/root/reference/models/pointnet.py:22-25`)."""
    n = 0
    while (f"cross.{2 * n}.q_proj.weight" in sd
           and f"cross.{2 * n + 1}.layer.q_proj.weight" in sd):
        n += 1
    return n


def convert_point_transformer(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ``PointTransformer.state_dict()`` -> flax params for
    :class:`scream_tpu.models.point_transformer.PointTransformer`."""
    n_self = _infer_layer_count(sd, "stem.%d")
    n_cross = _infer_cross_count(sd)
    if n_self == 0 or n_cross == 0:
        raise ValueError(
            "state_dict has no stem./cross. attention layers — not a "
            f"PointTransformer checkpoint? (keys: {sorted(sd)[:5]}...)"
        )
    trunk = _trunk_common(sd, n_cross)
    for i in range(n_self):
        trunk[f"stem_{i}"] = _attention_block(sd, f"stem.{i}")
    return {"trunk": trunk}


def convert_dem_transformer(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ``DEMTransformer.state_dict()`` -> flax params for
    :class:`scream_tpu.models.point_transformer.DEMTransformer`."""
    n_self = _infer_layer_count(sd, "stem_dsm.%d")
    n_cross = _infer_cross_count(sd)
    if n_self == 0 or n_cross == 0:
        raise ValueError(
            "state_dict has no stem_dsm./cross. attention layers — not a "
            f"DEMTransformer checkpoint? (keys: {sorted(sd)[:5]}...)"
        )
    trunk = _trunk_common(sd, n_cross)
    for i in range(n_self):
        trunk[f"stem_src_{i}"] = _attention_block(sd, f"stem_dsm.{i}")
        trunk[f"stem_tgt_{i}"] = _attention_block(sd, f"stem_dem.{i}")
    return {"trunk": trunk}


def convert_discriminator(
    sd: Mapping[str, Any], n_layers: int = 3
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference ``NLayerDiscriminator.state_dict()`` -> (params, batch_stats)
    for :class:`scream_tpu.models.gan.PatchDiscriminator`.

    The reference builds a flat ``main`` Sequential
    (`/root/reference/models/gan.py:39-62`): conv indices 0, 3n-1 (n=1..L-1),
    3L-1, 3L+2; BatchNorms one index after their conv. The checkpoint may be
    a raw state_dict or wrapped by ``AdversarialLoss`` (keys prefixed
    ``discriminator.main.``, `/root/reference/loss.py:19-24`).
    """
    if any(k.startswith("discriminator.") for k in sd):
        sd = {k[len("discriminator."):]: v for k, v in sd.items()
              if k.startswith("discriminator.")}

    def conv2d(idx: int) -> Dict[str, np.ndarray]:
        w = _np(sd[f"main.{idx}.weight"])  # (out, in, kh, kw)
        out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        if f"main.{idx}.bias" in sd:
            out["bias"] = _np(sd[f"main.{idx}.bias"])
        return out

    params: Dict[str, Any] = {"conv_0": conv2d(0)}
    stats: Dict[str, Any] = {}
    for n in range(1, n_layers):
        params[f"conv_{n}"] = conv2d(3 * n - 1)
        params[f"bn_{n}"] = _norm(sd, f"main.{3 * n}")
        stats[f"bn_{n}"] = {
            "mean": _np(sd[f"main.{3 * n}.running_mean"]),
            "var": _np(sd[f"main.{3 * n}.running_var"]),
        }
    params[f"conv_{n_layers}"] = conv2d(3 * n_layers - 1)
    params[f"bn_{n_layers}"] = _norm(sd, f"main.{3 * n_layers}")
    stats[f"bn_{n_layers}"] = {
        "mean": _np(sd[f"main.{3 * n_layers}.running_mean"]),
        "var": _np(sd[f"main.{3 * n_layers}.running_var"]),
    }
    params["conv_out"] = conv2d(3 * n_layers + 2)
    return params, stats


_CONVERTERS = {
    "point": convert_point_transformer,
    "dem": convert_dem_transformer,
}


def convert_torch_checkpoint(pth_path: str, out_dir: str, model: str = "point") -> Dict[str, Any]:
    """Load a reference ``.pth`` and save it as an orbax params directory.

    ``model``: "point" (point-generator.pth / kitti-generator.pth), "dem"
    (dem-generator.pth) or "disc" (discriminator.pth; saves
    ``{"params": ..., "batch_stats": ...}``). Returns the converted tree.
    Usage: ``python -m scream_tpu convert --pth params/point-generator.pth
    --out checkpoints/point --model point``.
    """
    import torch

    from scream_tpu.utils.checkpoint import save_params

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if model == "disc":
        params, stats = convert_discriminator(sd)
        tree: Dict[str, Any] = {"params": params, "batch_stats": stats}
    elif model in _CONVERTERS:
        tree = _CONVERTERS[model](sd)
    else:
        raise ValueError(f"model must be point|dem|disc, got {model!r}")
    save_params(out_dir, tree)
    return tree
