"""Multiway registration: pose-graph synchronization recovers absolute scan
poses (scan-to-map — beyond the reference's one-pair-at-a-time scope)."""

import numpy as np
import pytest

from scream_tpu.pipeline import (
    default_edges,
    register_multiway,
    synchronize_poses,
)


def _random_poses(rng, n, rot_scale=0.6, trans_scale=2.0):
    from scipy.spatial.transform import Rotation

    T = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = Rotation.from_rotvec(
            rng.normal(size=3) * rot_scale).as_matrix()
        M[:3, 3] = rng.normal(size=3) * trans_scale
        T.append(M)
    return T


def _measurements(T, edges, rng=None, noise=0.0):
    from scipy.spatial.transform import Rotation

    rel = []
    for i, j in edges:
        M = np.linalg.inv(T[j]) @ T[i]  # T_i = T_j @ T_ij
        if noise:
            M[:3, :3] = Rotation.from_rotvec(
                rng.normal(size=3) * noise).as_matrix() @ M[:3, :3]
            M[:3, 3] += rng.normal(size=3) * noise
        rel.append(M.astype(np.float32))
    return np.stack(rel)


def _errors(P, T):
    rot = [np.rad2deg(np.arccos(np.clip(
        (np.trace(P[k][:3, :3] @ T[k][:3, :3].T) - 1) / 2, -1, 1)))
        for k in range(len(T))]
    tr = [np.linalg.norm(P[k][:3, 3] - T[k][:3, 3]) for k in range(len(T))]
    return max(rot), max(tr)


class TestSynchronizePoses:
    def test_exact_measurements_recover_poses(self):
        rng = np.random.default_rng(1)
        N = 7
        T = _random_poses(rng, N)
        edges = default_edges(N, window=2)
        poses = synchronize_poses(N, edges, _measurements(T, edges))
        rot_err, tr_err = _errors(poses, T)
        # fp32 SVD jitter accumulates ~1e-3 rad over the Jacobi sweeps;
        # exact recovery means "far below any protocol threshold".
        assert rot_err < 0.2 and tr_err < 0.01
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)  # gauge

    def test_noisy_sync_beats_chain_composition(self):
        """The selling point: loop-closure edges average the drift a chain
        accumulates linearly."""
        rng = np.random.default_rng(0)
        N = 8
        T = _random_poses(rng, N)
        edges = default_edges(N, window=2)
        rel = _measurements(T, edges, rng=rng, noise=0.02)
        poses = synchronize_poses(N, edges, rel)

        e_idx = {e: k for k, e in enumerate(edges)}
        chain = [np.eye(4, dtype=np.float32)]
        for k in range(1, N):
            chain.append((chain[-1]
                          @ np.linalg.inv(rel[e_idx[(k - 1, k)]])))
        sync_rot, sync_tr = _errors(poses, T)
        chain_rot, chain_tr = _errors(np.stack(chain), T)
        assert sync_rot < chain_rot
        assert sync_tr < chain_tr
        assert sync_rot < 5.0 and sync_tr < 0.25

    def test_zero_weight_edges_ignored_in_solve(self):
        """A garbage edge with weight 0 must not perturb the solution (it
        still counts for connectivity via the init)."""
        rng = np.random.default_rng(3)
        N = 5
        T = _random_poses(rng, N)
        edges = default_edges(N, window=1) + [(0, 4)]
        rel = _measurements(T, edges)
        rel[-1] = np.eye(4, dtype=np.float32)  # garbage loop closure
        w = np.ones(len(edges), np.float32)
        w[-1] = 0.0
        poses = synchronize_poses(N, edges, rel, weights=w)
        rot_err, tr_err = _errors(poses, T)
        assert rot_err < 0.2 and tr_err < 0.01

    def test_zero_weight_only_node_keeps_measurement_translation(self):
        """A node whose EVERY incident edge has weight 0 (all pairwise
        registrations failed a fitness gate) must fall back to its
        measurement-derived translation, not collapse to zero."""
        rng = np.random.default_rng(7)
        N = 4
        T = _random_poses(rng, N)
        edges = default_edges(N, window=1)
        rel = _measurements(T, edges)
        w = np.ones(len(edges), np.float32)
        w[-1] = 0.0  # node 3's ONLY edge
        poses = synchronize_poses(N, edges, rel, weights=w)
        # Exact measurements: even the epsilon-weighted node recovers.
        rot_err, tr_err = _errors(poses, T)
        assert rot_err < 0.2 and tr_err < 0.01
        assert np.linalg.norm(poses[3][:3, 3]) > 0.5  # not collapsed

    def test_disconnected_graph_raises(self):
        with pytest.raises(ValueError, match="disconnected"):
            synchronize_poses(4, [(0, 1), (2, 3)],
                              np.stack([np.eye(4, dtype=np.float32)] * 2))
        with pytest.raises(ValueError, match="disconnected"):
            synchronize_poses(3, [], np.zeros((0, 4, 4), np.float32))

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="transforms"):
            synchronize_poses(3, [(0, 1)],
                              np.stack([np.eye(4, dtype=np.float32)] * 2))
        with pytest.raises(ValueError, match="weights"):
            synchronize_poses(
                3, [(0, 1), (1, 2)],
                np.stack([np.eye(4, dtype=np.float32)] * 2),
                weights=np.ones(3, np.float32))

    def test_trivial_sizes(self):
        one = synchronize_poses(1, [], np.zeros((0, 4, 4), np.float32))
        np.testing.assert_allclose(one, np.eye(4)[None])


class TestRegisterMultiway:
    def test_end_to_end_scan_stream(self):
        """N views of one synthetic scene through the real serving path
        (identity model: ICP does the aligning) -> absolute poses map every
        scan back into scan 0's frame."""
        import jax
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(5)
        scene = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
        N = 4
        T_gt = [np.eye(4, dtype=np.float32)]
        for k in range(1, N):
            M = np.eye(4, dtype=np.float32)
            M[:3, :3] = Rotation.from_rotvec(
                rng.normal(size=3) * 0.06).as_matrix()
            M[:3, 3] = rng.normal(size=3) * 0.05
            T_gt.append(M)
        # scan k = scene in frame k: p_k such that p_w = R_k p_k + t_k.
        scans = []
        for k in range(N):
            inv = np.linalg.inv(T_gt[k])
            pts = scene[rng.choice(400, 300, replace=False)]
            scans.append((pts @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32))

        def identity_model(params, src, tgt, sm, tm, c):
            return src

        res = register_multiway(
            identity_model, None, scans, capacity=512, batch_size=4,
            icp_max_iter=30, icp_thresh=0.3, dis_thresh=10.0,
        )
        assert res.poses.shape == (N, 4, 4)
        assert len(res.edges) == len(res.edge_fitness)
        rot_err, tr_err = _errors(res.poses, T_gt)
        assert rot_err < 2.0 and tr_err < 0.05

    def test_refine_to_map_improves_noisy_sync(self):
        """Scan-to-map polish: perturb the synchronized poses, refine
        against the union map, recover."""
        from scipy.spatial.transform import Rotation

        from scream_tpu.pipeline import refine_to_map

        rng = np.random.default_rng(9)
        scene = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        N = 4
        T_gt = _random_poses(rng, N, rot_scale=0.1, trans_scale=0.1)
        scans = []
        for k in range(N):
            inv = np.linalg.inv(T_gt[k])
            pts = scene[rng.choice(500, 350, replace=False)]
            scans.append((pts @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32))
        noisy = np.stack(T_gt).copy()
        for k in range(1, N):
            noisy[k, :3, :3] = Rotation.from_rotvec(
                rng.normal(size=3) * 0.03).as_matrix() @ noisy[k, :3, :3]
            noisy[k, :3, 3] += rng.normal(size=3) * 0.03
        refined = refine_to_map(scans, noisy, icp_thresh=0.3, rounds=2)
        before_rot, before_tr = _errors(noisy, T_gt)
        after_rot, after_tr = _errors(refined, T_gt)
        # Monotone improvement; the floor is set by point-sampling bias
        # (each scan holds a different 70% subset, so point-to-point NN has
        # a small systematic pull at partial overlap) — measured 2.8 deg ->
        # 1.7 (r2) -> 0.85 (r8).
        assert after_rot < 0.75 * before_rot
        assert after_tr < 0.75 * before_tr
        np.testing.assert_allclose(refined[0], np.eye(4))  # gauge kept

    def test_refine_noop_cases(self):
        from scream_tpu.pipeline import refine_to_map

        P = np.eye(4, dtype=np.float32)[None]
        np.testing.assert_allclose(
            refine_to_map([np.zeros((4, 3), np.float32)], P, 0.1), P)

    def test_bad_edge_rejected(self):
        with pytest.raises(ValueError, match="bad edge"):
            register_multiway(lambda *a: None, None,
                              [np.zeros((4, 3)), np.zeros((4, 3))],
                              edges=[(0, 2)])

    def test_empty_and_single(self):
        res = register_multiway(lambda *a: None, None, [])
        assert res.poses.shape == (0, 4, 4)
        one = register_multiway(lambda *a: None, None,
                                [np.zeros((4, 3), np.float32)])
        np.testing.assert_allclose(one.poses, np.eye(4)[None])
        with pytest.raises(ValueError, match="no edges"):
            register_multiway(lambda *a: None, None,
                              [np.zeros((4, 3), np.float32)] * 2, edges=[])
