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
) -> Mesh:
    """A ``(data, seq[, model])`` mesh over the available devices.

    Defaults to all devices on the data axis. ``n_data * n_seq * n_model``
    must equal the device count used. The ``model`` axis is only added when
    ``n_model > 1`` so existing 2-axis callers are unaffected.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_seq * n_model)
    assert n_data * n_seq * n_model == len(devices), (
        f"mesh {n_data}x{n_seq}x{n_model} != {len(devices)} devices"
    )
    if n_model > 1:
        arr = np.asarray(devices).reshape(n_data, n_seq, n_model)
        return Mesh(arr, ("data", "seq", "model"))
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, ("data", "seq"))


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
