"""Device meshes and sharding helpers.

The reference has no parallelism at all — one pinned GPU, batch 1, no
torch.distributed (SURVEY.md §2.5). This layer is the framework's own
first-class scaling story, the TPU idiom: a named `jax.sharding.Mesh` over
ICI-connected chips, `NamedSharding` annotations, and XLA-inserted
collectives — no NCCL/MPI analogue needed.

Axes:
  * ``data`` — registration pairs (the batch dimension). The natural
    replacement for the reference's bs=1 Python loop; gradients all-reduce
    over ICI automatically under jit.
  * ``seq`` — points within a cloud (sequence parallelism). Linear attention
    reduces over the sequence with a single psum of the tiny KV matrix
    (see `scream_tpu/parallel/sp.py`), so clouds larger than one chip's HBM
    shard cleanly.
  * ``model`` — attention heads / FFN hidden features (tensor parallelism,
    Megatron column/row recipe — see `scream_tpu/parallel/tp.py`).
  * ``pipe`` — layer stages (pipeline parallelism over microbatches — see
    `scream_tpu/parallel/pp.py`).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_seq: int = 1,
    devices: Optional[Sequence] = None,
    n_model: int = 1,
    n_pipe: int = 1,
) -> Mesh:
    """A ``(data, seq[, model])`` or ``(data, pipe)`` mesh over the devices.

    Defaults to all devices on the data axis. The axis product must fit the
    device count. ``model``/``pipe`` axes are only added when > 1 so
    existing 2-axis callers are unaffected; ``pipe`` composes with ``data``
    only (GPipe stages — `parallel/pp_flagship.py`).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_seq * n_model * n_pipe)
    if n_data < 1 or n_seq < 1 or n_model < 1 or n_pipe < 1:
        raise ValueError(
            f"mesh axes must be >= 1, got data={n_data} seq={n_seq} "
            f"model={n_model} pipe={n_pipe}"
        )
    if n_pipe > 1 and (n_seq > 1 or n_model > 1):
        raise ValueError("pipe composes with data only")
    need = n_data * n_seq * n_model * n_pipe
    if need > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_seq}x{n_model}x{n_pipe} needs {need} "
            f"devices, found {len(devices)}"
        )
    # An explicit smaller mesh uses the leading device subset (e.g.
    # `--mesh data=4` on an 8-chip host trains on 4 chips).
    devices = devices[:need]
    if n_pipe > 1:
        arr = np.asarray(devices).reshape(n_data, n_pipe)
        return Mesh(arr, ("data", "pipe"))
    if n_model > 1:
        arr = np.asarray(devices).reshape(n_data, n_seq, n_model)
        return Mesh(arr, ("data", "seq", "model"))
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, ("data", "seq"))


def parse_mesh_spec(spec: str, devices: Optional[Sequence] = None) -> Mesh:
    """Parse the CLI mesh flag: ``"data=4"``, ``"data=4,seq=2"``, ``"auto"``.

    ``auto`` puts every device on the data axis; ``data`` may be omitted when
    ``seq`` is given (the remainder of the device count is used). This is the
    single user-facing knob behind ``python -m scream_tpu train ... --mesh``.
    """
    if spec in ("auto", "all"):
        return make_mesh(devices=devices)
    kv = {}
    for part in spec.split(","):
        if "=" not in part:
            raise ValueError(
                f"bad mesh spec {spec!r}: expected comma-separated axis=N "
                "entries, e.g. 'data=4' or 'data=4,seq=2'"
            )
        k, v = part.split("=", 1)
        kv[k.strip()] = int(v)
    n_data = kv.pop("data", None)
    n_seq = kv.pop("seq", 1)
    n_model = kv.pop("model", 1)
    n_pipe = kv.pop("pipe", 1)
    if kv:
        raise ValueError(
            f"unknown mesh axes {sorted(kv)} in {spec!r}; the trainer path "
            "supports data, seq, model and pipe (expert parallelism is a "
            "library API, scream_tpu.parallel)"
        )
    if n_seq > 1 and n_model > 1:
        raise ValueError(
            f"mesh spec {spec!r}: the trainer path combines model= with "
            "data= only (seq x model 3-D training is a library-API "
            "composition, not a one-flag preset)"
        )
    if n_pipe > 1 and (n_seq > 1 or n_model > 1):
        raise ValueError(
            f"mesh spec {spec!r}: pipe= composes with data= only"
        )
    return make_mesh(n_data=n_data, n_seq=n_seq, n_model=n_model,
                     n_pipe=n_pipe, devices=devices)


def is_data_only(mesh: Mesh) -> bool:
    """True when every non-``data`` axis has size 1 — the mesh shards only
    the pair batch. The fused Pallas kernels stay enabled for such meshes
    (their batch-dim ``custom_partitioning`` runs the kernel per shard, see
    `scream_tpu/ops/partitioning.py`); any seq/model sharding falls back to
    the unfused XLA graph, which GSPMD can propagate through."""
    return all(n == 1 for name, n in mesh.shape.items() if name != "data")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Device-put a host batch with every array sharded on its leading dim.

    The batch size must divide the ``data`` axis size; the loaders produce
    fixed batch sizes so this is a static property.
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        arr = jnp.asarray(v)
        assert arr.shape[0] % mesh.shape["data"] == 0, (
            f"batch dim {arr.shape[0]} of '{k}' not divisible by data axis "
            f"{mesh.shape['data']}"
        )
        out[k] = jax.device_put(arr, sh)
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def to_device_maybe_sharded(batch, mesh: Optional[Mesh], skip=()) -> Dict:
    """Host batch -> device arrays, batch-sharded over the ``data`` axis when
    a mesh is given and the batch size divides it.

    The single shard-or-fallback policy for the trainer and eval paths: a
    trailing partial batch (drop_last=False loaders) falls back to
    single-device placement — same shapes, so no recompilation beyond the
    sharding variant. ``skip`` names host-only sidecar keys left off the
    device entirely.
    """
    arrays = {k: jnp.asarray(v) for k, v in batch.items() if k not in skip}
    if mesh is not None:
        b = next(iter(arrays.values())).shape[0]
        if b % mesh.shape["data"] == 0:
            return shard_batch(arrays, mesh)
    return arrays
