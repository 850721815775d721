"""Pipeline parallelism: GPipe-style microbatch schedule over a ``pipe`` axis.

The reference is a single-GPU repo (SURVEY.md §2.5); this is the framework's
capability layer for models whose *layer stack* outgrows one chip. The
implementation is the idiomatic TPU pipeline: every device holds one stage's
parameters (the stage dimension of a stacked param pytree is sharded over the
``pipe`` mesh axis), activations flow stage-to-stage with a single
`lax.ppermute` per schedule tick, and the whole schedule is one `lax.scan`
inside one `shard_map` — so XLA sees a static program and overlaps the
ppermute with the next tick's compute.

Schedule: plain GPipe fill-and-drain. For ``n_micro`` microbatches and
``n_stages`` stages the scan runs ``n_micro + n_stages - 1`` ticks; stage 0
feeds a fresh microbatch every tick, the last stage emits a finished
microbatch from tick ``n_stages - 1`` on. Bubble fraction =
``(n_stages-1) / (n_micro + n_stages - 1)`` — pick ``n_micro >> n_stages``.

Training (:func:`pipeline_train_step`) differentiates straight through the
pipelined forward: the transpose of the forward scan IS the reverse GPipe
schedule (each `ppermute` transposes to the inverted ring permutation), so
the backward pass drains microbatch cotangents stage-to-stage with the same
overlap, and each device accumulates gradients for exactly its own stage's
parameters — GPipe microbatch grad accumulation without a hand-written
backward schedule. ``remat=True`` wraps the stage in `jax.checkpoint`,
trading one extra stage forward per tick for O(1) activation memory per
microbatch (the GPipe paper's rematerialization).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_pipeline_mesh(n_stages: int, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D ``(pipe,)`` mesh of ``n_stages`` devices."""
    devices = list(devices if devices is not None else jax.devices())[:n_stages]
    assert len(devices) == n_stages, (
        f"need {n_stages} devices for {n_stages} stages, have {len(devices)}"
    )
    return Mesh(np.asarray(devices), ("pipe",))


def stack_stage_params(stage_params_list):
    """Stack per-stage param pytrees along a new leading stage axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *stage_params_list
    )


def pipeline_parallel_apply(
    stage_fn: Callable,
    stacked_params,
    microbatches,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
):
    """Run ``n_micro`` microbatches through ``n_stages`` pipelined stages.

    Args:
      stage_fn: ``stage_fn(params_i, x) -> y`` where ``y`` has the same
        pytree structure and shapes as ``x`` (a homogeneous layer stack —
        the transformer-block case).
      stacked_params: param pytree with a leading ``n_stages`` axis on every
        leaf (see :func:`stack_stage_params`); sharded one-stage-per-device
        over ``axis``.
      microbatches: input pytree with a leading ``n_micro`` axis on every
        leaf; replicated to every stage (stage 0 consumes it).
      mesh: a mesh containing the ``axis`` dimension (usually
        :func:`make_pipeline_mesh`).
      data_axis: optional second mesh axis sharding every microbatch's BATCH
        dim (leaf dim 1, after the leading ``n_micro`` axis) — the
        ``(data, pipe)`` composition: each data row runs its own pipeline
        over its batch shard; no cross-axis collectives are added (the
        ppermute and the final psum stay on ``axis``).

    Returns the output pytree with leading ``n_micro`` axis — microbatch j's
    result after all ``n_stages`` stages, identical to applying the stages
    sequentially (tested leaf-exact on the virtual CPU mesh).
    """
    n_stages = mesh.shape[axis]
    n_micro = jax.tree_util.tree_leaves(microbatches)[0].shape[0]
    ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def body(params_local, mb_local):
        # Local stage params: leading stage axis has local size 1.
        params_i = jax.tree_util.tree_map(lambda x: x[0], params_local)
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == n_stages - 1

        def tick(carry, t):
            act = carry
            # During the n_stages-1 drain ticks (t >= n_micro) stage 0 has no
            # fresh input; the clip re-feeds the last microbatch and its
            # (discarded) outputs ripple down the pipe. That recompute never
            # reaches the emitted output slice below — it is wasted work, but
            # a lax.cond skip would cost a branch in every tick for at most
            # n_stages-1 spare stage evaluations per call.
            mb_idx = jnp.clip(t, 0, n_micro - 1)
            mb = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, mb_idx, 0, False),
                mb_local,
            )
            inp = jax.tree_util.tree_map(
                lambda fresh, recv: jnp.where(is_first, fresh, recv), mb, act
            )
            out = stage_fn(params_i, inp)
            nxt = jax.tree_util.tree_map(
                lambda y: jax.lax.ppermute(y, axis, perm), out
            )
            return nxt, out

        zero = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x[0]), mb_local
        )
        _, emitted = jax.lax.scan(tick, zero, jnp.arange(ticks))
        # The last stage's emissions from tick n_stages-1 on are the finished
        # microbatches; psum-broadcast them so the output is replicated.
        done = jax.tree_util.tree_map(
            lambda e: jax.lax.dynamic_slice_in_dim(e, n_stages - 1, n_micro, 0),
            emitted,
        )
        return jax.tree_util.tree_map(
            lambda d: jax.lax.psum(
                jnp.where(is_last, d, jnp.zeros_like(d)), axis
            ),
            done,
        )

    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    mb_p = P() if data_axis is None else P(None, data_axis)
    mb_specs = jax.tree_util.tree_map(lambda _: mb_p, microbatches)
    out_specs = jax.tree_util.tree_map(lambda _: mb_p, microbatches)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, mb_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(stacked_params, microbatches)


def pipeline_parallel_grads(
    stage_fn: Callable,
    loss_fn: Callable,
    stacked_params,
    microbatches,
    targets,
    mesh: Mesh,
    axis: str = "pipe",
    remat: bool = False,
):
    """Loss and per-stage parameter gradients through the GPipe pipeline.

    ``loss_fn(preds, targets) -> scalar`` sees the full ``n_micro``-leading
    prediction pytree; make it a mean over microbatches for gradients
    identical to one large-batch step (GPipe grad accumulation). The returned
    grads carry the same leading stage axis (and ``P(axis)`` sharding) as
    ``stacked_params`` — each device only materializes its own stage's slice.

    Gradient exactness: the drain-tick recompute in the forward (stage 0
    re-feeding the last microbatch once fresh inputs run out) never reaches
    the emitted output slice, so those paths receive zero cotangent and the
    gradient equals the sequential stack's exactly (tested leaf-exact on the
    virtual CPU mesh).
    """
    fn = jax.checkpoint(stage_fn) if remat else stage_fn

    def loss_of(p):
        preds = pipeline_parallel_apply(fn, p, microbatches, mesh, axis)
        return loss_fn(preds, targets)

    return jax.value_and_grad(loss_of)(stacked_params)


def pipeline_train_step(
    stage_fn: Callable,
    loss_fn: Callable,
    optimizer,
    stacked_params,
    opt_state,
    microbatches,
    targets,
    mesh: Mesh,
    axis: str = "pipe",
    remat: bool = False,
):
    """One pipelined training step: forward, reverse-GPipe backward, optax
    update. Returns ``(new_params, new_opt_state, loss)``.

    The optimizer update is elementwise, so optimizer moments inherit the
    per-stage ``P(axis)`` sharding of the gradients — each device holds only
    its stage's Adam moments (the PP analogue of `tp.py`'s cached
    optimizer-moment sharding). Jit the whole step with ``stage_fn`` /
    ``loss_fn`` / ``optimizer`` closed over or static.
    """
    import optax

    loss, grads = pipeline_parallel_grads(
        stage_fn, loss_fn, stacked_params, microbatches, targets, mesh,
        axis=axis, remat=remat,
    )
    updates, opt_state = optimizer.update(grads, opt_state, stacked_params)
    return optax.apply_updates(stacked_params, updates), opt_state, loss
