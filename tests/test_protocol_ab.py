"""A/B the eval-protocol BOOKKEEPING against the reference's own code.

`tests/test_torch_parity.py` proves module-level parity (attention, Kabsch,
renderer, ...), but the per-scene accumulation — the idx-gap>1 filter, the
RE=TE=0 zero-append for failed counted pairs, the median-vs-mean per scene,
the divide-by-8, the RMSE success gating, the KITTI success-rate denominators
— had only been self-tested. This module runs the REFERENCE'S OWN accumulation
code (`/root/reference/evaluate_3d_match.py:53-171` ``evaluate_loader`` and
`/root/reference/evaluate_kitti.py:23-103` ``evaluate``) on CPU over synthetic
predictions and asserts the protocol numbers match
``scream_tpu.eval.protocols`` on the identical inputs.

How the reference code is executed unmodified:
  * ``RMSE``/``evaluate_loader``/``evaluate`` are AST-extracted from the
    reference files (their module level constructs datasets from missing
    downloads, so a plain import is impossible) and exec'd with a prepared
    globals dict.
  * The real reference ``utils.py`` (square_distance, rigid_transform_3d,
    transformation_error, integrate_trans, processbar, to_o3d_pcd) is imported
    as a module with ``open3d``/``igraph`` stubbed in ``sys.modules``.
  * ``o3d.registration_icp`` is stubbed to return its ``init`` transform.
    The reference's keep-iff-both-improve gate then compares equal RE/TE and
    keeps the "refined" == initial transform; on our side ``icp_max_iter=0``
    makes ``registration_icp`` return ``init`` exactly (the while_loop body
    never runs) and the same gate keeps it. Both sides therefore score the
    pure Kabsch solution — the ICP *algorithm* is A/B'd separately in
    ``test_ops_voxel_icp.py``; here the subject is the metric bookkeeping.
  * ``nibabel.quaternions.mat2quat`` (not installed) is replaced by an
    independent scipy-based implementation with nibabel's w>=0 convention.

Tolerances: RR / success-rate are ratios of identical integer decisions and
must match exactly. RE/TE aggregates go through two independent fp32 SVDs
(torch CPU vs jax CPU); at an RE of ~1 degree a 1e-6 difference in tr(R^T R)
is amplified by d(acos)/dx ~ 1/sin(re) to ~1e-3 deg, so RE asserts use 2e-2
deg and TE 1e-4 — three orders of magnitude below what any bookkeeping bug
(wrong filter, wrong denominator, missing zero-append) produces.
"""

from __future__ import annotations

import ast
import io
import re as _regex
import sys
import types
from contextlib import contextmanager, redirect_stdout

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


# ---------------------------------------------------------------------------
# stubs + extraction machinery
# ---------------------------------------------------------------------------


def _mat2quat(r):
    """nibabel.quaternions.mat2quat semantics via scipy: (w,x,y,z), w >= 0."""
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(np.asarray(r, np.float64)).as_quat()  # x,y,z,w
    q = np.array([q[3], q[0], q[1], q[2]])
    return -q if q[0] < 0 else q


def _o3d_stub():
    """Just enough of the old flat open3d 0.7 API for utils.py + the eval
    drivers, with ``registration_icp`` returning its init transform."""

    def registration_icp(src, tgt, max_correspondence_distance=None,
                         init=None, estimation_method=None, criteria=None):
        return types.SimpleNamespace(transformation=np.asarray(init))

    class _PointCloud:
        pass

    utility = types.SimpleNamespace(Vector3dVector=lambda a: np.asarray(a))
    geometry = types.SimpleNamespace(PointCloud=_PointCloud)
    registration = types.SimpleNamespace(
        TransformationEstimationPointToPoint=lambda *a, **k: None,
        ICPConvergenceCriteria=lambda *a, **k: None,
    )
    return types.SimpleNamespace(
        registration_icp=registration_icp,
        utility=utility,
        geometry=geometry,
        registration=registration,
        PointCloud=_PointCloud,
    )


@pytest.fixture()
def ref_env(monkeypatch):
    """Reference utils.py loaded for real (open3d/igraph stubbed) plus the
    globals dict the extracted eval functions run under."""
    import importlib.util

    o3d = _o3d_stub()
    monkeypatch.setitem(sys.modules, "open3d", o3d)
    monkeypatch.setitem(sys.modules, "igraph", types.SimpleNamespace())

    spec = importlib.util.spec_from_file_location("_ref_utils", f"{REF}/utils.py")
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)

    g = {
        "np": np,
        "torch": torch,
        "o3d": o3d,
        "nq": types.SimpleNamespace(mat2quat=_mat2quat),
        "device": torch.device("cpu"),
        "processbar": ref_utils.processbar,
        "transformation_error": ref_utils.transformation_error,
        "square_distance": ref_utils.square_distance,
        "rigid_transform_3d": ref_utils.rigid_transform_3d,
        "to_o3d_pcd": ref_utils.to_o3d_pcd,
    }
    return g


def _extract(path, names, g):
    """Compile the named top-level functions/classes from ``path`` into ``g``."""
    with open(path) as f:
        tree = ast.parse(f.read())
    picked = [n for n in tree.body
              if isinstance(n, (ast.FunctionDef, ast.ClassDef))
              and n.name in set(names)]
    assert {n.name for n in picked} == set(names), (
        f"reference drifted: wanted {names} in {path}")
    mod = ast.Module(body=picked, type_ignores=[])
    exec(compile(mod, path, "exec"), g)
    return g


class _FakeNet:
    """Replays precomputed src_pred tensors in loader order; zero loss."""

    def __init__(self, preds):
        self._preds = [torch.as_tensor(p, dtype=torch.float32)[None] for p in preds]
        self._i = 0

    def __call__(self, *a, **k):
        p = self._preds[self._i]
        self._i += 1
        return p, None, None

    def loss(self, *a, **k):
        return torch.tensor(0.0)


class _RefLoader:
    """DataLoader stand-in: yields prebuilt bs=1 tuples; exposes .dataset."""

    def __init__(self, items):
        self._items = items
        self.dataset = items

    def __iter__(self):
        return iter(self._items)


# ---------------------------------------------------------------------------
# synthetic eval data (shared verbatim by both sides)
# ---------------------------------------------------------------------------


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * K @ K).astype(np.float32)


def _make_3dmatch_pairs(seed=0, n=48, m=64, s=0.5):
    """Synthetic normalized eval pairs with controlled success/failure.

    Failure pairs keep every NN correspondence valid (displacements well
    inside the 0.1 squared-distance threshold) but carry a covariance that
    amplifies the small rotation error far past the 0.2 RMSE gate — decisions
    are robust to fp32 cross-framework noise on both sides.
    """
    rng = np.random.default_rng(seed)
    pairs = []
    for scene in range(8):
        for j in range(4):
            src = (rng.uniform(-1, 1, (n, 3)) * 0.8).astype(np.float32)
            R = _rot(rng.normal(size=3), rng.uniform(5, 40))
            t = rng.uniform(-0.3, 0.3, (3, 1)).astype(np.float32)
            tgt = np.concatenate(
                [(R @ src.T + t).T,
                 rng.uniform(-1, 1, (m - n, 3)).astype(np.float32)], axis=0)
            c = rng.uniform(-1, 1, 3).astype(np.float32)
            fail = j % 2 == 1
            if fail:
                Rp = (R @ _rot(rng.normal(size=3), 2.0)).astype(np.float32)
                tp = (t + 0.04).astype(np.float32)
                info = np.diag([0.01, 1.0, 1.0, 200.0, 200.0, 200.0])
            else:
                Rp, tp = R, t
                info = np.eye(6)
            noise = rng.normal(0, 0.004, (n, 3)).astype(np.float32)
            src_pred = ((Rp @ src.T + tp).T + noise).astype(np.float32)
            # j==3: consecutive fragments (gap 1) -> filtered from per-scene
            # stats by the PREDATOR rule but still counted in the running RR.
            idx = (100 * scene + j, 100 * scene + j + (1 if j == 3 else 3))
            pairs.append(dict(
                src=src, tgt=tgt, rot=R, trans=t, s=float(s), c=c,
                idx=np.array(idx, np.int64), cov=info.astype(np.float64),
                scene=scene, src_pred=src_pred,
            ))
    return pairs


def _ref_items(pairs):
    items = []
    for p in pairs:
        items.append((
            torch.as_tensor(p["src"])[None],
            torch.as_tensor(p["tgt"])[None],
            torch.as_tensor(p["rot"])[None],
            torch.as_tensor(p["trans"])[None],
            torch.tensor([p["s"]]),
            torch.as_tensor(p["idx"])[None],
            torch.as_tensor(p["cov"])[None],
            torch.as_tensor(p["c"])[None],
            torch.tensor([p["scene"]]),
        ))
    return items


def _ours_batch(pairs):
    B = len(pairs)
    n = pairs[0]["src"].shape[0]
    m = pairs[0]["tgt"].shape[0]
    return {
        "src": np.stack([p["src"] for p in pairs]),
        "tgt": np.stack([p["tgt"] for p in pairs]),
        "src_mask": np.ones((B, n), bool),
        "tgt_mask": np.ones((B, m), bool),
        "rot": np.stack([p["rot"] for p in pairs]),
        "trans": np.stack([p["trans"] for p in pairs]),
        "scale": np.array([p["s"] for p in pairs], np.float32),
        "center": np.stack([p["c"] for p in pairs]),
        "covariance": np.stack([p["cov"] for p in pairs]).astype(np.float32),
        "idx": np.stack([p["idx"] for p in pairs]),
        "scene": np.array([p["scene"] for p in pairs], np.int64),
    }


def _echo_params(params, src, tgt, src_mask, tgt_mask, src_center):
    """apply_fn that returns the precomputed predictions threaded through
    ``params`` (NEVER via closure: apply_fn is a static jit arg)."""
    return params


# ---------------------------------------------------------------------------
# the A/B tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["match", "zero"])
def test_3dmatch_family_bookkeeping_matches_reference(ref_env, mode):
    import jax.numpy as jnp

    from scream_tpu.eval import protocols as P

    pairs = _make_3dmatch_pairs(seed=0)
    corr = "tgt" if mode == "match" else "src_pred"
    dis_thresh = 0.1 if mode == "match" else 0.2
    re_stat = "median" if mode == "match" else "mean"

    # --- reference side: its own evaluate_loader, verbatim -----------------
    g = _extract(f"{REF}/evaluate_3d_match.py", ["RMSE", "evaluate_loader"],
                 ref_env)
    net = _FakeNet([p["src_pred"] for p in pairs])
    with redirect_stdout(io.StringIO()):
        ref_loss, ref_rre, ref_rte, ref_rr = g["evaluate_loader"](
            net, _RefLoader(_ref_items(pairs)), corr=corr,
            dis_thresh=dis_thresh, re_static_method=re_stat)

    # --- our side: identical predictions through eval/protocols ------------
    batch = _ours_batch(pairs)
    preds = jnp.asarray(np.stack([p["src_pred"] for p in pairs]))
    out = P.evaluate_registration_per_scene(
        _echo_params, preds, [batch], dis_thresh=dis_thresh, corr=corr,
        icp_thresh=0.1, icp_max_iter=0, re_stat=re_stat)

    assert out["registration_recall"] == pytest.approx(ref_rr, abs=1e-12)
    assert out["rre"] == pytest.approx(ref_rre, abs=2e-2)
    assert out["rte"] == pytest.approx(ref_rte, abs=1e-4)
    # the data has real successes AND real failures or the A/B proves little
    assert 0.05 < ref_rr < 0.95


def test_3dmatch_bookkeeping_all_success_split(ref_env):
    """Degenerate split (every pair succeeds): medians cover no zero-appends."""
    import jax.numpy as jnp

    from scream_tpu.eval import protocols as P

    pairs = [p for p in _make_3dmatch_pairs(seed=1)]
    for p in pairs:  # neutralize the failure covariances
        p["cov"] = np.eye(6)
        # and the failure predictions: replay GT exactly + small noise
        rng = np.random.default_rng(int(p["idx"][0]))
        n = p["src"].shape[0]
        p["src_pred"] = (
            (p["rot"] @ p["src"].T + p["trans"]).T
            + rng.normal(0, 0.004, (n, 3))
        ).astype(np.float32)

    g = _extract(f"{REF}/evaluate_3d_match.py", ["RMSE", "evaluate_loader"],
                 ref_env)
    net = _FakeNet([p["src_pred"] for p in pairs])
    with redirect_stdout(io.StringIO()):
        _, ref_rre, ref_rte, ref_rr = g["evaluate_loader"](
            net, _RefLoader(_ref_items(pairs)), corr="tgt",
            dis_thresh=0.1, re_static_method="median")

    batch = _ours_batch(pairs)
    preds = jnp.asarray(np.stack([p["src_pred"] for p in pairs]))
    out = P.evaluate_registration_per_scene(
        _echo_params, preds, [batch], dis_thresh=0.1, corr="tgt",
        icp_thresh=0.1, icp_max_iter=0, re_stat="median")

    assert ref_rr == 1.0
    assert out["registration_recall"] == pytest.approx(ref_rr, abs=1e-12)
    assert out["rre"] == pytest.approx(ref_rre, abs=2e-2)
    assert out["rte"] == pytest.approx(ref_rte, abs=1e-4)


def test_kitti_bookkeeping_matches_reference(ref_env):
    """A/B `/root/reference/evaluate_kitti.py:23-103` (prints only -> parse
    its final line at its 5-decimal precision)."""
    import jax.numpy as jnp

    from scream_tpu.eval import protocols as P

    rng = np.random.default_rng(7)
    n, m, s = 48, 64, 0.5
    pairs = []
    for j in range(12):
        src = (rng.uniform(-1, 1, (n, 3)) * 0.8).astype(np.float32)
        R = _rot(rng.normal(size=3), rng.uniform(5, 40))
        t = rng.uniform(-0.3, 0.3, (3, 1)).astype(np.float32)
        tgt = np.concatenate(
            [(R @ src.T + t).T,
             rng.uniform(-1, 1, (m - n, 3)).astype(np.float32)], axis=0)
        c = rng.uniform(-1, 1, 3).astype(np.float32)
        if j % 3 == 2:
            # failure: predict each point at its NEIGHBOR's GT location.
            # corr="tgt" self-corrects consistent pose offsets (the NN
            # partners snap back to the true correspondents), so a real
            # failure needs WRONG partner assignments — Kabsch over the
            # shifted pairs yields an essentially arbitrary transform,
            # robustly past the RE<=5 deg gate on both sides.
            base = np.roll(src, 1, axis=0)
        else:
            base = src
        src_pred = ((R @ base.T + t).T
                    + rng.normal(0, 0.004, (n, 3))).astype(np.float32)
        pairs.append(dict(src=src, tgt=tgt, rot=R, trans=t, s=s, c=c,
                          idx=np.array([j, j + 3]), cov=np.eye(6),
                          scene=0, src_pred=src_pred))

    @contextmanager
    def _autocast():
        yield

    g = dict(ref_env)
    g["autocast"] = _autocast
    g = _extract(f"{REF}/evaluate_kitti.py", ["evaluate"], g)
    # the reference's evaluate() reads `net` as a module global
    net = g["net"] = _FakeNet([p["src_pred"] for p in pairs])
    items = [(torch.as_tensor(p["src"])[None], torch.as_tensor(p["tgt"])[None],
              torch.as_tensor(p["rot"])[None], torch.as_tensor(p["trans"])[None],
              torch.tensor([p["s"]]), torch.as_tensor(p["c"])[None])
             for p in pairs]
    buf = io.StringIO()
    with redirect_stdout(buf):
        g["evaluate"](_RefLoader(items), dis_thresh=1.5, icp_thresh=1.0)
    mt = _regex.search(
        r"test finish\s+loss: ([\d.+-eE]+)\s+rre: ([\d.+-eE]+)\s+"
        r"rte: ([\d.+-eE]+)\s+success rate: ([\d.+-eE]+)", buf.getvalue())
    assert mt, buf.getvalue()[-500:]
    ref_srre, ref_srte, ref_rate = (float(mt.group(2)), float(mt.group(3)),
                                    float(mt.group(4)))

    batch = _ours_batch(pairs)
    preds = jnp.asarray(np.stack([p["src_pred"] for p in pairs]))
    out = P.evaluate_kitti(
        _echo_params, preds, [batch], dis_thresh=1.5, icp_thresh=1.0,
        icp_max_iter=0, center_mode="neg_rt")

    # reference prints at 5 decimals; add the fp32 SVD angle slack on top
    assert out["success_rate"] == pytest.approx(ref_rate, abs=1e-5)
    assert out["success_rre"] == pytest.approx(ref_srre, abs=2e-2)
    assert out["success_rte"] == pytest.approx(ref_srte, abs=1e-4)
    assert 0.05 < ref_rate < 0.95


def test_open_gf_bookkeeping_matches_reference(ref_env):
    """A/B `/root/reference/evaluate_open_gf.py:25-76`: the reference's own
    ``ChamferDistance`` (squared distances, no sqrt, both-direction mean-sum)
    and ``evaluate_DEM_generation`` accumulation (per-item running means, the
    x1000 ``scale_factor``, the elementwise z-channel MAE/MSE pairing) vs
    ``scream_tpu.eval.protocols.evaluate_open_gf`` on identical synthetic
    DEM patches and identical precomputed predictions.

    The reference class's two guard branches are exercised directly below:
    ``f.shape[1] == 0`` returns literal int 0 (:25-29); the bare ``except``
    only prints — a caught error falls through to ``return d.mean()`` and
    raises NameError, so no fallback VALUE exists to reproduce (our side
    instead validates inputs up front: empty scenes raise,
    `eval/protocols.py`).
    """
    import jax.numpy as jnp

    from scream_tpu.eval import protocols as P

    rng = np.random.default_rng(21)
    B, n = 6, 64
    patches = []
    for i in range(B):
        dem = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        dsm = dem + rng.normal(0, 0.2, (n, 3)).astype(np.float32)
        coarse = dem[:: 8].copy()
        # prediction = GT + noise so chamfer/height losses are non-trivial
        pred = (dem + rng.normal(0, 0.05, (n, 3))).astype(np.float32)
        patches.append(dict(dsm=dsm, dem=dem, coarse=coarse, pred=pred))

    # --- reference side: exec its ChamferDistance + evaluate_DEM_generation
    g = dict(ref_env)
    g["nn"] = torch.nn
    g = _extract(f"{REF}/evaluate_open_gf.py",
                 ["ChamferDistance", "evaluate_DEM_generation"], g)
    chamfer_cls = g["ChamferDistance"]

    class _DemNet:
        def __init__(self, preds):
            self._preds = [torch.as_tensor(p)[None] for p in preds]
            self._i = 0

        def __call__(self, dsm, coarse, flag):
            p = self._preds[self._i]
            self._i += 1
            return p, None

    items = [(torch.as_tensor(p["dsm"])[None],
              torch.as_tensor(p["coarse"])[None],
              torch.as_tensor(p["dem"])[None],
              torch.zeros(1)) for p in patches]
    g["net"] = _DemNet([p["pred"] for p in patches])
    g["chamfer_fn"] = chamfer_cls()
    g["test_loader"] = _RefLoader(items)
    g["test_set"] = items
    buf = io.StringIO()
    with redirect_stdout(buf):
        ref_cd, ref_mae, ref_mse = g["evaluate_DEM_generation"]()

    # guard branch :25-29 — zero-point input returns literal 0
    empty = torch.zeros((1, 0, 3))
    assert g["chamfer_fn"](empty, torch.zeros((1, 4, 3))) == 0

    # --- our side: one batch through evaluate_open_gf with an echo apply_fn
    nc = patches[0]["coarse"].shape[0]
    batch = {
        "dsm": np.stack([p["dsm"] for p in patches]),
        "dem": np.stack([p["dem"] for p in patches]),
        "dem_coarse": np.stack([p["coarse"] for p in patches]),
        "dsm_mask": np.ones((B, n), bool),
        "dem_mask": np.ones((B, n), bool),
        "dem_coarse_mask": np.ones((B, nc), bool),
    }
    preds = jnp.asarray(np.stack([p["pred"] for p in patches]))

    def _echo_dem(params, dsm, coarse, dsm_mask, coarse_mask):
        return params

    out = P.evaluate_open_gf(_echo_dem, preds, [batch])

    # two independent fp32 square-distance pipelines (torch vs jax); the
    # decisions are identical so only reduction-order noise separates them
    assert out["n_patches"] == B
    assert out["chamfer_x1000"] == pytest.approx(ref_cd, rel=2e-4, abs=2e-4)
    assert out["height_mae_x1000"] == pytest.approx(ref_mae, rel=2e-4, abs=2e-4)
    assert out["height_mse_x1000"] == pytest.approx(ref_mse, rel=2e-4, abs=2e-4)
    assert ref_cd > 0.1 and ref_mae > 0.1  # non-trivial magnitudes
