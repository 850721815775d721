"""Multiway registration: N scans -> one global frame (pose-graph sync).

Beyond the reference (which registers exactly one pair per invocation and
offers no scan-to-map story): given pairwise relative poses from the GT-free
serving path (:func:`scream_tpu.pipeline.register_pairs`), recover absolute
poses for every scan by synchronizing the pose graph — chain composition
accumulates drift linearly, synchronization averages it across every edge
and loop closure.

Conventions. A pairwise measurement for edge ``(i, j)`` is the serving
path's output ``T_ij``: ``p_j = R_ij p_i + t_ij`` (maps scan ``i`` into scan
``j``'s frame). Absolute poses map scans into the world frame,
``p_w = R_i p_i + t_i``, with the gauge fixed at ``T_0 = I``. Consistency:
``R_i = R_j R_ij`` and ``t_i = R_j t_ij + t_j``.

Algorithm (standard, chosen for being jit-friendly dense linear algebra —
no data-dependent sparsity, no host solver hops):

1. **Init** by composing measurements along a BFS spanning tree from node 0
   (host-side graph walk; the graph is tiny — tens of scans).
2. **Chordal rotation averaging**: fixed-point sweeps of
   ``R_i <- proj_SO3( sum_j w_ij R_j R_ij + sum_j w_ji R_j R_ji^T )``
   (both edge directions contribute), with the SVD projection of
   `geometry.kabsch`'s det-correction form. A `lax.fori_loop` over sweeps;
   each sweep is one dense (E, 3, 3) einsum + segment-sum + batched SVD —
   MXU/VPU-friendly, no scalar graph loops.
3. **Translation synchronization**: the constraints ``t_i - t_j =
   R_j t_ij`` (with ``t_0 = 0``) form a weighted linear least-squares
   system solved in closed form via the normal equations on a dense
   ``3(N-1)`` system — exact, one `jnp.linalg.solve`.

The result minimizes the same chordal/L2 objectives Open3D's
``global_optimization`` (Choi et al. posegraph) targets for the rotation
part; it is a synchronization (no per-point re-ICP), so it composes with
any pairwise engine.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MultiwayResult(NamedTuple):
    poses: np.ndarray        # (N, 4, 4) absolute scan->world transforms
    edges: List[Tuple[int, int]]  # the pairwise edges actually used
    edge_fitness: np.ndarray  # (E,) pairwise ICP fitness (the edge weights)


def _project_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation(s) to ``(..., 3, 3)`` in Frobenius norm (SVD with
    det correction — same construction as `geometry.kabsch`)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.broadcast_to(jnp.eye(3), M.shape).copy()
    D = D.at[..., 2, 2].set(det)
    return U @ D @ Vt


def _spanning_tree_init(n: int, edges, rel: np.ndarray) -> np.ndarray:
    """BFS-compose measurements from node 0 -> (N, 4, 4) initial poses.

    Host-side: the graph is tens of nodes and this runs once. Unreachable
    nodes (disconnected graph) raise — synchronization is undefined there.
    """
    adj = {k: [] for k in range(n)}
    for e, (i, j) in enumerate(edges):
        adj[i].append((j, e, False))  # forward: T_ij maps i -> j
        adj[j].append((i, e, True))   # reverse: use inv(T_ij)
    poses = [None] * n
    poses[0] = np.eye(4, dtype=np.float32)
    queue = [0]
    while queue:
        i = queue.pop(0)
        for j, e, rev in adj[i]:
            if poses[j] is not None:
                continue
            T = rel[e]
            T = np.linalg.inv(T) if rev else T
            # p_i-frame -> p_j-frame is T (forward); absolute: T_j = T_i T^-1
            # from R_i = R_j R_ij  =>  T_j = T_i @ inv(T_ij).
            poses[j] = (poses[i] @ np.linalg.inv(T)).astype(np.float32)
            queue.append(j)
    missing = [k for k, p in enumerate(poses) if p is None]
    if missing:
        raise ValueError(
            f"pose graph is disconnected: scans {missing} share no edge "
            "path with scan 0 — add edges covering them")
    return np.stack(poses)


def synchronize_poses(
    n: int,
    edges: Sequence[Tuple[int, int]],
    rel_transforms,
    weights=None,
    sweeps: int = 100,
) -> np.ndarray:
    """Absolute poses ``(N, 4, 4)`` from pairwise measurements.

    Args:
      n: number of scans (nodes).
      edges: ``(i, j)`` per measurement, 0-indexed.
      rel_transforms: ``(E, 4, 4)`` with ``p_j = R p_i + t`` per edge.
      weights: ``(E,)`` nonnegative edge confidences (pairwise ICP fitness);
        defaults to uniform. Zero-weight edges are ignored (but still count
        for connectivity via the spanning-tree init).
      sweeps: damped-Jacobi chordal sweeps (cheap: one einsum pair +
        batched 3x3 SVD each; 100 is far past convergence for tens of
        scans).

    Gauge: ``poses[0] == eye(4)`` exactly.
    """
    rel = np.asarray(rel_transforms, np.float32).reshape(-1, 4, 4)
    edges = [(int(i), int(j)) for i, j in edges]
    E = len(edges)
    if rel.shape[0] != E:
        raise ValueError(f"{E} edges but {rel.shape[0]} transforms")
    if n <= 1:
        return np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    if E == 0:
        # Same contract as any other disconnected graph — returning N
        # identities would look like a (silently wrong) result.
        raise ValueError(
            f"pose graph is disconnected: {n} scans share no edges")
    w = (np.ones(E, np.float32) if weights is None
         else np.asarray(weights, np.float32))
    if w.shape != (E,):
        raise ValueError(f"weights shape {w.shape} != ({E},)")

    init = _spanning_tree_init(n, edges, rel)
    src = jnp.asarray([i for i, _ in edges])
    dst = jnp.asarray([j for _, j in edges])
    R_rel = jnp.asarray(rel[:, :3, :3])
    t_rel = jnp.asarray(rel[:, :3, 3])
    w_j = jnp.asarray(w)

    # Per-node total incident weight, for the damping self-term below.
    deg = jnp.zeros((n,), jnp.float32).at[src].add(w_j).at[dst].add(w_j)

    # --- chordal rotation averaging (R_i = R_j R_ij), DAMPED Jacobi ---
    # Plain Jacobi on a bipartite graph (a pure scan chain) oscillates with
    # period 2 forever (even/odd nodes swap being wrong); averaging each
    # node's neighbor contributions WITH its own current rotation (weighted
    # by its incident weight) is the standard damping that makes the sweep
    # a contraction. Costs ~2x the sweeps; each sweep is one einsum pair +
    # a batched 3x3 SVD.
    def sweep(_, R):
        # Forward contribution to node i: w * R_j @ R_ij.
        contrib_i = w_j[:, None, None] * jnp.einsum(
            "ejk,ekl->ejl", R[dst], R_rel)
        # Reverse contribution to node j: from R_j = R_i R_ij^T.
        contrib_j = w_j[:, None, None] * jnp.einsum(
            "ejk,elk->ejl", R[src], R_rel)
        acc = deg[:, None, None] * R  # damping self-term
        acc = acc.at[src].add(contrib_i)
        acc = acc.at[dst].add(contrib_j)
        # Zero-incident-weight nodes keep their current estimate.
        keep = jnp.sum(jnp.abs(acc), axis=(1, 2), keepdims=True) < 1e-12
        return _project_so3(jnp.where(keep, R, acc))

    R_abs = jax.lax.fori_loop(0, sweeps, sweep, jnp.asarray(init[:, :3, :3]))
    # The chordal objective is invariant under a global LEFT rotation
    # (R_i -> G R_i); fix the gauge once at the end: R_0 = I exactly.
    R_abs = jnp.einsum("kj,nkl->njl", R_abs[0], R_abs)
    R_abs = _project_so3(R_abs).at[0].set(jnp.eye(3))

    # --- translation synchronization: t_i - t_j = R_j t_ij, t_0 = 0 ---
    # Unknowns x = [t_1 ... t_{N-1}] in R^{3(N-1)}; per edge one 3-vector
    # residual. Dense weighted normal equations (the graph is tens of
    # nodes; 3(N-1) x 3(N-1) solve is trivial and exact).
    # Zero-weight edges keep an EPSILON row here: a node whose every
    # incident edge was down-weighted (all pairwise registrations failed a
    # min_fitness gate) must fall back to its measurement-derived
    # translation, not collapse to the ridge term's zero — epsilon rows are
    # ~1e-4 of a real edge (so well-constrained nodes are unaffected) and
    # ~1e4x the ridge (so epsilon-only nodes aren't shrunk toward zero).
    w_t = jnp.where(w_j > 0, w_j, 1e-4)
    rhs_e = jnp.einsum("ejk,ek->ej", R_abs[dst], t_rel)  # (E, 3)

    def row_block(node_idx):
        # Selection matrix for t_{node_idx} into the unknown vector
        # (node 0 is the fixed gauge -> zero block).
        sel = jnp.zeros((3, 3 * (n - 1)), jnp.float32)
        off = (node_idx - 1) * 3

        def place(s):
            return jax.lax.dynamic_update_slice(s, jnp.eye(3), (0, off))

        return jnp.where(node_idx > 0, place(sel), sel)

    blocks_i = jax.vmap(row_block)(src)   # (E, 3, 3(N-1))
    blocks_j = jax.vmap(row_block)(dst)
    A = (blocks_i - blocks_j) * jnp.sqrt(w_t)[:, None, None]
    b = rhs_e * jnp.sqrt(w_t)[:, None]
    A2 = A.reshape(-1, 3 * (n - 1))
    b2 = b.reshape(-1)
    AtA = A2.T @ A2 + 1e-8 * jnp.eye(3 * (n - 1))
    t_abs = jnp.linalg.solve(AtA, A2.T @ b2).reshape(n - 1, 3)
    t_abs = jnp.concatenate([jnp.zeros((1, 3), jnp.float32), t_abs])

    out = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    out[:, :3, :3] = np.asarray(R_abs)
    out[:, :3, 3] = np.asarray(t_abs)
    return out


def default_edges(n: int, window: int = 2) -> List[Tuple[int, int]]:
    """Sequential chain + skip connections up to ``window`` apart — the
    usual scan-stream topology (consecutive overlap strongest, skip edges
    provide the loop closures that stop drift accumulation)."""
    return [(i, j) for i in range(n) for j in range(i + 1, min(i + window + 1, n))]


def refine_to_map(
    clouds: Sequence[np.ndarray],
    poses: np.ndarray,
    icp_thresh: float,
    max_iteration: int = 30,
    rounds: int = 1,
) -> np.ndarray:
    """Scan-to-map ICP polish of synchronized poses.

    Each round re-registers every scan (at its current absolute pose)
    against the union of the OTHER scans in the world frame — pairwise
    measurements only see two scans at a time; the map constraint pulls all
    of them onto consensus geometry. A refinement is kept per scan only if
    its ICP fitness does not drop. Gauge preserved (scan 0 skipped).

    Pads the map to the training bucket ladder so a stream of calls reuses
    compiles. Cost per round: N bounded-NN ICPs against an (N-1)-scan map.
    """
    from scream_tpu.data.batching import pad_cloud
    from scream_tpu.geometry.icp import registration_icp
    from scream_tpu.pipeline.register import _default_capacity

    clouds = [np.asarray(c, np.float32) for c in clouds]
    n = len(clouds)
    poses = np.array(poses, np.float32)
    if n <= 1 or rounds < 1:
        return poses

    def to_world(k):
        R, t = poses[k, :3, :3], poses[k, :3, 3]
        return (clouds[k] @ R.T + t).astype(np.float32)

    scan_cap = _default_capacity(max(len(c) for c in clouds))
    map_cap = _default_capacity(sum(len(c) for c in clouds))
    for _ in range(rounds):
        world = [to_world(k) for k in range(n)]
        for k in range(1, n):  # scan 0 is the gauge
            m = np.concatenate([world[i] for i in range(n) if i != k])
            sp, sm = pad_cloud(world[k], scan_cap)
            mp, mm = pad_cloud(m, map_cap)
            sp, mp = jnp.asarray(sp), jnp.asarray(mp)
            sm, mm = jnp.asarray(sm), jnp.asarray(mm)
            # Baseline: fitness AT the current pose against this round's
            # map (max_iteration=0 measures without updating) — the gate
            # needs a real comparison point or a diverging first round
            # would be accepted unconditionally.
            base = registration_icp(sp, mp, icp_thresh, max_iteration=0,
                                    src_mask=sm, tgt_mask=mm)
            res = registration_icp(sp, mp, icp_thresh,
                                   max_iteration=max_iteration,
                                   src_mask=sm, tgt_mask=mm)
            if float(res.fitness) >= float(base.fitness):
                poses[k] = np.asarray(res.transformation) @ poses[k]
                world[k] = to_world(k)
    return poses


def register_multiway(
    apply_fn: Callable,
    params,
    clouds: Sequence[np.ndarray],
    edges: Optional[Sequence[Tuple[int, int]]] = None,
    sweeps: int = 100,
    min_fitness: float = 0.0,
    refine_rounds: int = 0,
    refine_icp_thresh: Optional[float] = None,
    **register_kwargs,
) -> MultiwayResult:
    """Align N raw scans into one global frame, GT-free.

    Pairwise poses come from the batched serving path
    (:func:`register_pairs` — ``register_kwargs`` forward to it: normalize,
    thresholds, passes, batch_size, mesh, ...), weighted by their ICP
    fitness, then synchronized (see module docstring). Edges default to
    :func:`default_edges` (chain + skip-2).

    ``min_fitness``: edges whose pairwise fitness falls below this keep
    their graph connectivity role but drop to (near-)zero weight in the
    synchronization — a failed pairwise registration should not drag
    well-constrained nodes, while a node whose EVERY edge failed still
    gets a best-effort pose from its own measurements (init rotation +
    epsilon-weighted translation rows) rather than a silent zero.

    ``refine_rounds``: optional :func:`refine_to_map` polish after the
    synchronization (scan-to-map ICP at ``refine_icp_thresh``, default the
    pairwise ``icp_thresh`` — pass either explicitly when the clouds are
    not unit-scale).

    Returns absolute ``poses`` with ``poses[0] = I``: apply as
    ``scan_k @ R_k.T + t_k`` to place every scan in scan 0's frame.
    """
    from scream_tpu.pipeline.register import register_pairs

    clouds = [np.asarray(c, np.float32) for c in clouds]
    n = len(clouds)
    if n == 0:
        return MultiwayResult(np.zeros((0, 4, 4), np.float32), [],
                              np.zeros((0,), np.float32))
    if n == 1:
        return MultiwayResult(np.eye(4, dtype=np.float32)[None], [],
                              np.zeros((0,), np.float32))
    if edges is None:
        edges = default_edges(n)
    edges = [(int(i), int(j)) for i, j in edges]
    if not edges:
        raise ValueError(f"no edges for {n} scans (window too small?)")
    for i, j in edges:
        if not (0 <= i < n and 0 <= j < n) or i == j:
            raise ValueError(f"bad edge ({i}, {j}) for {n} scans")

    results = register_pairs(
        apply_fn, params, [(clouds[i], clouds[j]) for i, j in edges],
        **register_kwargs,
    )
    rel = np.stack([r.transform for r in results])
    fit = np.asarray([r.fitness for r in results], np.float32)
    w = np.where(fit >= min_fitness, fit, 0.0).astype(np.float32)
    poses = synchronize_poses(n, edges, rel, weights=w, sweeps=sweeps)
    if refine_rounds > 0:
        thresh = (refine_icp_thresh if refine_icp_thresh is not None
                  else register_kwargs.get("icp_thresh", 0.1))
        poses = refine_to_map(clouds, poses, thresh, rounds=refine_rounds)
    return MultiwayResult(poses, edges, fit)
