"""Command-line interface: train / evaluate / preprocess / bench / visualize.

The reference has no CLI — every mode switch means editing module constants
or commenting ``__main__`` blocks (`/root/reference/train_3d_match.py:236-239`,
`/root/reference/evaluate_3d_match.py:193-195`, SURVEY.md §5). Here one typed
entry point drives all tasks off the dataclass presets in
`scream_tpu/config.py`:

    python -m scream_tpu train 3dmatch --root data --epochs 45
    python -m scream_tpu evaluate 3dlomatch --params checkpoints/best
    python -m scream_tpu preprocess kitti --root /data/kitti --out data
    python -m scream_tpu bench
    python -m scream_tpu visualize --split 3DMatch_test --root data --item 0

When the preprocessed data directory is absent, train/evaluate fall back to
the synthetic dataset so every command runs end-to-end out of the box.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import Optional

from scream_tpu.config import (
    RenderConfig,
    kitti_presets,
    opengf_presets,
    threedmatch_presets,
)

TASKS = {"3dmatch": threedmatch_presets, "kitti": kitti_presets, "opengf": opengf_presets}
EVAL_SPLITS = {
    "3dmatch": ("3DMatch_test", "unit_sphere"),
    "3dlomatch": ("3DLoMatch_test", "unit_sphere"),
    "3dzeromatch": ("3DZeroMatch_test", "unit_sphere"),
    "kitti": ("KITTI_test", "unit_cube"),
    "opengf": ("OpenGF_test", None),
}


def _buckets_for(cap: int, smallest: int = 256):
    """Canonical padding buckets up to ``cap``; ``cap`` itself is appended
    when it falls between canonical sizes so no cloud exceeds every bucket."""
    buckets = tuple(b for b in (256, 512, 1024, 2048, 4096, 8192, 16384)
                    if smallest <= b <= cap)
    if not buckets or buckets[-1] < cap:
        buckets = buckets + (cap,)
    return buckets


def _registration_loaders(task, data_cfg, train_cfg, root, synthetic_len=64,
                          multi_scale=False):
    from scream_tpu.data import (
        BucketedPairLoader,
        ConcatDataset,
        PairDataset,
        PairLoader,
        SyntheticPairDataset,
    )

    split_train = "3DMatch_train" if task == "3dmatch" else "KITTI_train"
    split_val = "3DMatch_val" if task == "3dmatch" else "KITTI_val"
    cap = data_cfg.max_points
    buckets = _buckets_for(cap)

    def synth_multi(augment, seed0):
        # Per-bucket synthetic pairs sized just under each capacity; training
        # mixes two overlap tiers (the recipe behind the shipped multi-scale
        # checkpoints, docs/TRAINING_DEMO.md).
        parts = []
        overlaps = (0.7, 0.85) if augment else (0.7,)
        length = synthetic_len if augment else max(synthetic_len // 4, 8)
        for k, b in enumerate(buckets):
            for j, ov in enumerate(overlaps):
                parts.append(SyntheticPairDataset(
                    length=length, n_src=b * 7 // 8, n_tgt=b * 15 // 16,
                    overlap=ov, normalize=data_cfg.normalize, augment=augment,
                    seed=seed0 + 10 * k + j,
                ))
        return ConcatDataset(parts)

    def make(split, augment):
        path = os.path.join(root, split)
        if os.path.isdir(path):
            ds = PairDataset(
                root, split, normalize=data_cfg.normalize, augment=augment,
                perturb_both_sides=data_cfg.perturb_both_sides,
                perturb_std=data_cfg.augment_perturb_std,
                jitter_std=data_cfg.augment_jitter_std,
                max_points=cap,
            )
        elif multi_scale:
            print(f"[cli] {path} not found; multi-scale synthetic pairs",
                  file=sys.stderr)
            ds = synth_multi(augment, seed0=10 if augment else 900)
            # Sizes are statically known per part; the default size probe
            # reaches them through ConcatDataset._unwrap -> size_hint with
            # no materialization.
            return BucketedPairLoader(
                ds, batch_size=train_cfg.batch_size, buckets=buckets,
                shuffle=augment, drop_last=augment,
            )
        else:
            print(f"[cli] {path} not found; using synthetic pairs", file=sys.stderr)
            ds = SyntheticPairDataset(
                length=synthetic_len, n_src=cap // 2, n_tgt=cap // 2,
                normalize=data_cfg.normalize, augment=augment,
            )
        if multi_scale:
            return BucketedPairLoader(
                ds, batch_size=train_cfg.batch_size, buckets=buckets,
                shuffle=augment, drop_last=augment,
            )
        return PairLoader(
            ds, batch_size=train_cfg.batch_size, src_capacity=cap,
            shuffle=augment, drop_last=augment,
        )

    return make(split_train, True), make(split_val, False)


def _apply_model_overrides(model_cfg, args):
    over = {}
    if getattr(args, "d_model", None):
        over["d_model"] = args.d_model
    if getattr(args, "self_layers", None):
        over["self_layers"] = args.self_layers
    if getattr(args, "cross_layers", None):
        over["cross_layers"] = args.cross_layers
    if getattr(args, "dtype", None):
        over["dtype"] = args.dtype
    return dataclasses.replace(model_cfg, **over) if over else model_cfg


def _parse_mesh(args):
    """``--mesh data=N[,seq=M]`` -> Mesh (or None when the flag is absent)."""
    spec = getattr(args, "mesh", None)
    if not spec:
        return None
    from scream_tpu.parallel import parse_mesh_spec

    return parse_mesh_spec(spec)


def _disable_unpartitionable_fusion(model_cfg, mesh):
    """Keep the fused Pallas kernels on for data-only meshes (their batch-dim
    custom_partitioning runs the kernel per shard — `ops/partitioning.py`);
    seq/model-sharded applies take the unfused XLA graph GSPMD can
    propagate through."""
    if mesh is None:
        return model_cfg
    from scream_tpu.parallel import is_data_only

    if is_data_only(mesh):
        return model_cfg
    return dataclasses.replace(model_cfg, fused_block_tail=False,
                               fused_attention=False)


def cmd_train(args):
    model_cfg, train_cfg, data_cfg, eval_cfg = TASKS[args.task]()
    model_cfg = _apply_model_overrides(model_cfg, args)
    mesh = _parse_mesh(args)
    model_cfg = _disable_unpartitionable_fusion(model_cfg, mesh)
    if mesh is not None and args.batch_size is None:
        # A sensible default: keep the reference per-device batch of 8.
        args.batch_size = 8 * mesh.shape["data"]
    if args.max_points:
        data_cfg = dataclasses.replace(data_cfg, max_points=args.max_points)
    if args.epochs:
        train_cfg = dataclasses.replace(train_cfg, epochs=args.epochs)
    if args.batch_size:
        train_cfg = dataclasses.replace(train_cfg, batch_size=args.batch_size)
    if args.gan:
        train_cfg = dataclasses.replace(train_cfg, use_gan=True)
    if getattr(args, "lr_d", None):
        # Discriminator LR override — the GAN-balance knob (a saturating D,
        # d_loss -> 0, starves the generator of gradient signal).
        train_cfg = dataclasses.replace(train_cfg, lr_d=args.lr_d)
    if getattr(args, "lr_g", None):
        train_cfg = dataclasses.replace(train_cfg, lr_g=args.lr_g)
    if getattr(args, "center_mode", None):
        # "none" trains WITHOUT the reference's GT src_center hint — the
        # recipe for checkpoints usable in GT-free register_pair.
        eval_cfg = dataclasses.replace(eval_cfg, center_mode=args.center_mode)
    if getattr(args, "normalize", None):
        data_cfg = dataclasses.replace(data_cfg, normalize=args.normalize)

    if args.task == "opengf":
        from scream_tpu.data import DEMLoader, OpenGFDataset
        from scream_tpu.data.synthetic import make_dem_patch
        from scream_tpu.train import DEMTrainer

        root = args.root
        if os.path.isdir(os.path.join(root, "OpenGF_train")):
            tr_ds = OpenGFDataset(root, "train")
            va_ds = OpenGFDataset(root, "val")
        else:
            print("[cli] OpenGF data not found; using synthetic patches", file=sys.stderr)
            import numpy as np

            class _Synth:
                def __init__(self, n):
                    self.n = n

                def __len__(self):
                    return self.n

                def __getitem__(self, i):
                    return make_dem_patch(np.random.default_rng(i),
                                          n_dsm=data_cfg.max_points // 4,
                                          n_dem=data_cfg.max_points // 4)

            tr_ds, va_ds = _Synth(32), _Synth(8)
        cap = data_cfg.max_points
        mk = lambda ds, sh: DEMLoader(ds, batch_size=train_cfg.batch_size,
                                      dsm_capacity=cap, dem_capacity=cap,
                                      coarse_capacity=max(cap // 8, 64),
                                      shuffle=sh, drop_last=sh)
        trainer = DEMTrainer(mk(tr_ds, True), mk(va_ds, False),
                             model_cfg=model_cfg, train_cfg=train_cfg,
                             checkpoint_dir=args.checkpoint_dir, mesh=mesh,
                             sample_img_dir=args.sample_img_dir)
    else:
        from scream_tpu.train import RegistrationTrainer

        train_loader, val_loader = _registration_loaders(
            args.task, data_cfg, train_cfg, args.root,
            multi_scale=getattr(args, "multi_scale", False),
            synthetic_len=getattr(args, "synthetic_pairs", None) or 64,
        )
        render_cfg = RenderConfig()
        if args.task == "kitti" and train_cfg.use_gan:
            # The reference switches the renderer for KITTI GAN training:
            # rho=48, single Ry(pi) back view
            # (`/root/reference/train_kitti.py:45-48`).
            from scream_tpu.config import kitti_gan_render_config

            render_cfg = kitti_gan_render_config()
        trainer = RegistrationTrainer(
            train_loader, val_loader,
            model_cfg=model_cfg, train_cfg=train_cfg, eval_cfg=eval_cfg,
            render_cfg=render_cfg,
            checkpoint_dir=args.checkpoint_dir,
            sample_img_dir=args.sample_img_dir,
            mesh=mesh,
        )
    trainer.init()
    state_dir = os.path.join(args.checkpoint_dir, "state")
    if getattr(args, "resume", False):
        if os.path.isdir(state_dir):
            trainer.restore_state(state_dir)
            print(f"[cli] resumed full train state from {state_dir}",
                  file=sys.stderr)
        else:
            print(f"[cli] --resume: no saved state at {state_dir}; "
                  "starting fresh", file=sys.stderr)
    elif getattr(args, "init_params", None):
        # Warm start: generator params from a shipped params-only orbax dir
        # (fresh optimizer/step — fine-tuning, not a full-state resume).
        from scream_tpu.utils.checkpoint import load_params

        trainer.state = trainer.state._replace(
            params=load_params(args.init_params, trainer.state.params))
        print(f"[cli] initialized generator params from {args.init_params}",
              file=sys.stderr)
    final = trainer.fit(profile_dir=args.profile_dir)
    print(json.dumps({"final_val": final}))


def _load_model_params(task, model_cfg, params_dir, sample_batch):
    import jax

    if task == "opengf":
        from scream_tpu.models.point_transformer import DEMTransformer

        model = DEMTransformer(model_cfg)
        init = model.init(
            jax.random.PRNGKey(0), sample_batch["dsm"], sample_batch["dem_coarse"],
            sample_batch["dsm_mask"], sample_batch["dem_coarse_mask"],
        )["params"]

        def apply_fn(params, dsm, coarse, dsm_mask, coarse_mask):
            return model.apply({"params": params}, dsm, coarse, dsm_mask, coarse_mask)
    else:
        import jax.numpy as jnp

        from scream_tpu.models.point_transformer import PointTransformer

        model = PointTransformer(model_cfg)
        init = model.init(
            jax.random.PRNGKey(0), sample_batch["src"], sample_batch["tgt"],
            sample_batch["src_mask"], sample_batch["tgt_mask"],
            jnp.swapaxes(sample_batch["trans"], -1, -2),
        )["params"]

        def apply_fn(params, src, tgt, src_mask, tgt_mask, src_center):
            return model.apply({"params": params}, src, tgt, src_mask, tgt_mask,
                               src_center)

    if params_dir:
        from scream_tpu.utils.checkpoint import load_params

        params = load_params(params_dir, init)
    else:
        print("[cli] no --params given; evaluating a randomly initialized model",
              file=sys.stderr)
        params = init
    return apply_fn, params


def cmd_evaluate(args):
    import jax.numpy as jnp

    task = "opengf" if args.protocol == "opengf" else (
        "kitti" if args.protocol == "kitti" else "3dmatch"
    )
    model_cfg, train_cfg, data_cfg, _ = TASKS[task]()
    from scream_tpu.config import eval_preset

    eval_cfg = eval_preset(args.protocol)
    over = {}
    for field in ("dis_thresh", "rmse_thresh", "icp_thresh", "icp_max_iter",
                  "re_stat", "center_mode"):
        v = getattr(args, field, None)
        if v is not None:
            over[field] = v
    if over:
        eval_cfg = dataclasses.replace(eval_cfg, **over)
    if args.icp_chunk is not None:
        # Fail before the multi-minute model/dataset load, not inside eval.
        if args.protocol != "kitti":
            raise SystemExit(
                "--experimental-icp-chunk applies to the kitti protocol "
                "only (the other "
                "protocols run ICP at the Open3D default budget of 30, "
                "where chunking measured slower — docs/DESIGN.md)")
        if args.icp_chunk < 1:
            raise SystemExit(
                f"--experimental-icp-chunk must be >= 1, got {args.icp_chunk}")
    model_cfg = _apply_model_overrides(model_cfg, args)
    mesh = _parse_mesh(args)
    model_cfg = _disable_unpartitionable_fusion(model_cfg, mesh)
    if args.max_points:
        data_cfg = dataclasses.replace(data_cfg, max_points=args.max_points)
    split, normalize = EVAL_SPLITS[args.protocol]
    root = args.root
    cap = data_cfg.max_points

    from scream_tpu.data import (
        DEMLoader,
        OpenGFDataset,
        PairDataset,
        PairLoader,
        SyntheticPairDataset,
    )
    from scream_tpu import eval as protocols

    if args.protocol == "opengf":
        if os.path.isdir(os.path.join(root, "OpenGF_test")):
            ds = OpenGFDataset(root, "test")
        else:
            print("[cli] OpenGF data not found; synthetic patches", file=sys.stderr)
            import numpy as np

            from scream_tpu.data.synthetic import make_dem_patch

            class _S:
                def __len__(self):
                    return 8

                def __getitem__(self, i):
                    return make_dem_patch(np.random.default_rng(i), 256, 256)

            ds = _S()
        loader = DEMLoader(ds, batch_size=args.batch_size, dsm_capacity=cap,
                           dem_capacity=cap, coarse_capacity=max(cap // 8, 64))
        batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
        apply_fn, params = _load_model_params("opengf", model_cfg, args.params, batch)
        out = protocols.evaluate_open_gf(apply_fn, params, loader, mesh=mesh)
    else:
        if os.path.isdir(os.path.join(root, split)):
            ds = PairDataset(root, split, normalize=normalize,
                             with_info=args.protocol.startswith("3d"),
                             max_points=cap)
        else:
            print(f"[cli] {split} not found; synthetic pairs", file=sys.stderr)
            ds = SyntheticPairDataset(length=16, n_src=cap // 2, n_tgt=cap // 2,
                                      normalize=normalize,
                                      with_info=args.protocol.startswith("3d"))
        if args.protocol == "kitti" and not isinstance(ds, SyntheticPairDataset):
            ds = protocols.SkipDataset(ds, (124, 142))
        if getattr(args, "cache_dir", None):
            # Pre-collated bucket-shard cache: batches stream as memmap
            # slices with zero per-item host work (the at-scale eval was
            # 25-30x loader-bound on small hosts — data/collated.py).
            # Built on first use; identical bucket ladder and padding as
            # --bucketed, so metrics are unchanged.
            from scream_tpu.data import collated_or_build

            loader = collated_or_build(
                ds, args.cache_dir, batch_size=args.batch_size,
                buckets=_buckets_for(cap, smallest=1024))
        elif args.bucketed:
            from scream_tpu.data import BucketedPairLoader

            buckets = _buckets_for(cap, smallest=1024)
            loader = BucketedPairLoader(ds, batch_size=args.batch_size,
                                        buckets=buckets)
        else:
            loader = PairLoader(ds, batch_size=args.batch_size, src_capacity=cap)
        batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
        apply_fn, params = _load_model_params(task, model_cfg, args.params, batch)

        if args.protocol == "kitti":
            out = protocols.evaluate_kitti(
                apply_fn, params, loader,
                dis_thresh=eval_cfg.dis_thresh, icp_thresh=eval_cfg.icp_thresh,
                icp_max_iter=eval_cfg.icp_max_iter,
                success_re_deg=eval_cfg.success_re_deg,
                success_te=eval_cfg.success_te,
                center_mode=eval_cfg.center_mode,
                mesh=mesh,
                icp_chunk=args.icp_chunk,
            )
        else:
            out = protocols.evaluate_registration(apply_fn, params, loader,
                                                  eval_cfg, mesh=mesh)
    print(json.dumps({k: v for k, v in out.items()}, default=float))


def cmd_preprocess(args):
    from scream_tpu.data import preprocess as pp

    if args.task == "collate":
        # Pre-build the bucket-shard cache for an already-preprocessed eval
        # split (same dataset construction as `evaluate --cache-dir`).
        from scream_tpu.data import PairDataset, build_collated_cache
        from scream_tpu import eval as protocols

        split, normalize = EVAL_SPLITS[args.protocol]
        if args.protocol == "opengf":
            raise SystemExit("preprocess collate supports the registration "
                             "protocols (the OpenGF eval is not loader-bound)")
        ds = PairDataset(args.root, split, normalize=normalize,
                         with_info=args.protocol.startswith("3d"),
                         max_points=args.max_points)
        if args.protocol == "kitti":
            ds = protocols.SkipDataset(ds, (124, 142))
        meta = build_collated_cache(
            ds, args.out, buckets=_buckets_for(args.max_points, smallest=1024))
        print(json.dumps(meta))
        return
    if args.task == "kitti":
        from scream_tpu.data.raw import KittiOdometry

        for mode in ("train", "val", "test"):
            ds = KittiOdometry(args.root, mode=mode)
            pairs = ((it["src"], it["tgt"], it["rot"], it["trans"])
                     for it in (ds[i] for i in range(len(ds))))
            n = pp.save_kitti_split(
                pairs, os.path.join(args.out, f"KITTI_{mode}"),
                # Reference test split drops dataset item 1
                # (`/root/reference/process_kitti.py:44-45`).
                skip_items=(1,) if mode == "test" else (),
            )
            print(f"KITTI_{mode}: {n} pairs")
    elif args.task == "3dmatch":
        from scream_tpu.data.raw import ThreeDMatchPredator

        pkl_dir = os.path.join(args.root, "indoor")
        for mode, pkl, out_split in (
            ("train", "train_info.pkl", "3DMatch_train"),
            ("val", "val_info.pkl", "3DMatch_val"),
        ):
            pkl_path = os.path.join(pkl_dir, pkl)
            if not os.path.exists(pkl_path):
                print(f"skip {mode}: {pkl_path} missing")
                continue
            ds = ThreeDMatchPredator(args.root, pkl_path)
            pairs = ((it["src"], it["tgt"], it["rot"], it["trans"], it["overlap_ind"])
                     for it in (ds[i] for i in range(len(ds))))
            n = pp.save_train_split(pairs, os.path.join(args.out, out_split))
            print(f"{out_split}: {n} pairs")
        # Test splits: 3DMatch_test from the 3DMatch metadata; 3DLoMatch +
        # 3DZeroMatch both from the 3DLoMatch metadata, with the redwood
        # idx/covariance/scene sidecars the per-scene protocol needs
        # (`/root/reference/process_3d_match.py:96-234`).
        for pkl, info_sub, split_kwargs in (
            ("3DMatch.pkl", "3DMatch",
             {"match_dir": os.path.join(args.out, "3DMatch_test")}),
            ("3DLoMatch.pkl", "3DLoMatch",
             {"lo_dir": os.path.join(args.out, "3DLoMatch_test"),
              "zero_dir": os.path.join(args.out, "3DZeroMatch_test")}),
        ):
            pkl_path = os.path.join(pkl_dir, pkl)
            if not os.path.exists(pkl_path):
                print(f"skip test splits from {pkl}: {pkl_path} missing")
                continue
            # The redwood covariance sidecars live at
            # <root>/info/{3DMatch,3DLoMatch}/<scene>/gt.info (the
            # reference opens them unconditionally per test pair,
            # `/root/reference/datasets/three_d_match.py:54-57,76-81`) —
            # without them the per-scene eval protocol cannot run, so a
            # missing info tree is a hard error, not a silent drop.
            info_dir = os.path.join(args.root, "info", info_sub)
            if not os.path.isdir(info_dir):
                raise SystemExit(
                    f"preprocess 3dmatch: {info_dir} missing — the test "
                    "splits need the redwood <scene>/gt.info covariance "
                    "files (reference layout datasets/3DMatch/info/"
                    f"{info_sub}/<scene>/gt.info)")
            ds = ThreeDMatchPredator(args.root, pkl_path, info_dir=info_dir)
            # Stream item dicts: save_test_splits takes pair fields AND
            # sidecar info from each dict in one pass (no materialization).
            counts = pp.save_test_splits(
                (ds[i] for i in range(len(ds))), **split_kwargs,
            )
            print(f"test splits from {pkl}: "
                  + " ".join(f"{k}={v}" for k, v in counts.items() if v))
    else:
        # OpenGF: .las/.laz scenes -> tiled [dsm | dem] patches
        # (`/root/reference/process_open_gf.py:13-261`). The canonical
        # S7/S8/S9 file names are tried first; otherwise every .las/.laz
        # under <root>/<split>/ is ingested.
        import glob

        from scream_tpu.data import las

        for split, canonical, stride, centers in (
            ("train", las.OPENGF_TRAIN_FILES, pp.OPENGF_TRAIN_STRIDE, False),
            ("val", las.OPENGF_VAL_FILES, None, False),
            ("test", las.OPENGF_TEST_FILES, None, True),
        ):
            paths = las._existing(args.root, canonical)
            if not paths:
                paths = sorted(
                    glob.glob(os.path.join(args.root, split, "*.la[sz]"))
                )
            if not paths:
                print(f"skip OpenGF_{split}: no .las/.laz under "
                      f"{os.path.join(args.root, split)}")
                continue

            def patches():
                for p in paths:
                    pts, cls = las.read_opengf_cloud(p)
                    yield from pp.tile_opengf_scene(pts, cls, stride=stride)

            n = pp.save_opengf_split(
                patches(), os.path.join(args.out, f"OpenGF_{split}"),
                save_centers=centers,
            )
            print(f"OpenGF_{split}: {n} patches from {len(paths)} scenes")


def cmd_register(args):
    """GT-free registration of two raw clouds — the user-facing "align these
    two scans" flow (see pipeline.register_pair; the reference has no
    GT-free path at all)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from scream_tpu.config import ModelConfig
    from scream_tpu.models.point_transformer import PointTransformer
    from scream_tpu.pipeline import (
        register_pair,
        register_pair_robust,
        register_pairs,
        register_pairs_robust,
    )
    from scream_tpu.utils.checkpoint import load_params

    def load_cloud(path, name):
        from scream_tpu.data.ply import load_cloud_any

        try:
            arr = load_cloud_any(path)
        except (ValueError, OSError) as e:
            raise SystemExit(f"{name}: {e}")
        if arr.ndim != 2 or arr.shape[1] != 3:
            raise SystemExit(f"{name}: expected an (N, 3) cloud "
                             f"(.npy/.ply/.las/.laz), got shape {arr.shape}")
        return arr

    scans = None
    if args.scans:
        if args.src or args.tgt or args.manifest:
            raise SystemExit("--scans is exclusive with --src/--tgt/--manifest")
        if args.robust:
            raise SystemExit(
                "--scans uses the batched serving path; --robust is a "
                "single-pair search (see pipeline.register_multiway)")
        if len(args.scans) < 2:
            raise SystemExit("--scans needs at least two clouds")
        if args.window < 1:
            raise SystemExit(f"--window must be >= 1, got {args.window}")
        scans = [load_cloud(p, f"scan {k}") for k, p in enumerate(args.scans)]

    manifest = None
    if args.manifest:
        if args.src or args.tgt:
            raise SystemExit("--manifest and --src/--tgt are exclusive")
        manifest = []
        with open(args.manifest) as f:
            for ln, line in enumerate(f, 1):
                parts = line.split()
                if not parts:
                    continue
                if len(parts) != 2:
                    raise SystemExit(
                        f"{args.manifest}:{ln}: expected 'src.npy tgt.npy'")
                manifest.append((load_cloud(parts[0], f"line {ln} src"),
                                 load_cloud(parts[1], f"line {ln} tgt")))
        if not manifest:
            raise SystemExit(f"{args.manifest}: no pairs")
    elif scans is None and not (args.src and args.tgt):
        raise SystemExit("need --src and --tgt (or --manifest / --scans)")
    elif scans is None:
        src = load_cloud(args.src, "src")
        tgt = load_cloud(args.tgt, "tgt")

    # Mesh validation BEFORE the model build / checkpoint load (same
    # fail-fast convention as evaluate --icp-chunk).
    if args.mesh and (manifest is None and scans is None or args.robust):
        raise SystemExit(
            "--mesh shards the batched manifest/scans paths only "
            "(single-pair and --robust dispatches are not sharded; see "
            "pipeline.register_pairs)")
    try:
        mesh = _parse_mesh(args)
        if mesh is not None and args.batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"--batch-size {args.batch_size} must divide by the mesh "
                f"data axis ({mesh.shape['data']})")
    except (ValueError, AssertionError) as e:
        raise SystemExit(f"--mesh: {e}")

    model_cfg = ModelConfig()
    normalize = args.normalize
    if args.params:
        # Shipped checkpoints carry a model_config.json sidecar so the right
        # architecture (and normalization convention) loads without flag
        # archaeology; explicit flags win.
        sidecar = os.path.join(args.params, "model_config.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                side = json.load(f)
            if normalize is None:
                normalize = side.pop("normalize", None)
            else:
                side.pop("normalize", None)
            model_cfg = dataclasses.replace(model_cfg, **side)
    normalize = normalize or "unit_sphere"
    model_cfg = _apply_model_overrides(model_cfg, args)
    model_cfg = _disable_unpartitionable_fusion(model_cfg, mesh)
    model = PointTransformer(model_cfg)
    z = jnp.zeros((1, 8, 3), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), z, z,
                      jnp.ones((1, 8), bool), jnp.ones((1, 8), bool),
                      jnp.zeros((1, 1, 3)))["params"]
    if args.params:
        params = load_params(args.params, init)
    else:
        print("[cli] no --params given; registering with a randomly "
              "initialized model", file=sys.stderr)
        params = init

    def apply_fn(p, s, t, sm, tm, c):
        return model.apply({"params": p}, s, t, sm, tm, c)

    if scans is not None:
        # Multiway: pairwise serving over chain+skip edges, then pose-graph
        # synchronization (chordal averaging + translation LLS) — N scans
        # into scan 0's frame, one JSON line per scan.
        from scream_tpu.pipeline import default_edges, register_multiway

        res = register_multiway(
            apply_fn, params, scans,
            edges=default_edges(len(scans), window=args.window),
            refine_rounds=args.refine_rounds,
            normalize=normalize, dis_thresh=args.dis_thresh,
            icp_thresh=args.icp_thresh, icp_max_iter=args.icp_max_iter,
            batch_size=args.batch_size, passes=args.passes, mesh=mesh,
        )
        for k, pose in enumerate(res.poses):
            print(json.dumps({"scan": k, "pose": pose.tolist()}))
        print(f"[cli] {len(res.edges)} pairwise edges, fitness "
              f"min/median {float(np.min(res.edge_fitness)):.3f}/"
              f"{float(np.median(res.edge_fitness)):.3f}", file=sys.stderr)
        if args.out:
            np.save(args.out, res.poses)
        return

    if manifest is not None:
        # Batched serving path: one compile per (capacity, batch) shape,
        # reused across the whole stream; one JSON line per pair. --robust
        # batches the multi-start search across the whole manifest
        # (pairs x seeds lanes: 3 forward stages total, not per pair).
        if args.robust:
            results = register_pairs_robust(
                apply_fn, params, manifest,
                normalize=normalize, dis_thresh=args.dis_thresh,
                icp_thresh=args.icp_thresh, icp_max_iter=args.icp_max_iter,
                starts=args.robust_starts,
            )
        else:
            results = register_pairs(
                apply_fn, params, manifest,
                normalize=normalize, dis_thresh=args.dis_thresh,
                icp_thresh=args.icp_thresh, icp_max_iter=args.icp_max_iter,
                batch_size=args.batch_size, passes=args.passes, mesh=mesh,
            )
        n_amb = 0
        for i, res in enumerate(results):
            line = {
                "pair": i,
                "transform": res.transform.tolist(),
                "fitness": res.fitness,
                "inlier_rmse": res.inlier_rmse,
                "n_corr": res.n_corr,
            }
            if args.robust:
                # Ambiguity channel: a small margin means a DISTINCT pose
                # scored nearly as well as the winner (near-symmetric
                # geometry) — the answer may be a symmetry flip.
                line["runner_up_fitness"] = res.runner_up_fitness
                line["score_margin"] = res.score_margin
                line["ambiguous"] = res.ambiguous
                n_amb += bool(res.ambiguous)
            print(json.dumps(line))
        if args.robust and n_amb:
            print(f"[cli] WARNING: {n_amb}/{len(results)} pair(s) flagged "
                  "ambiguous (a distinct pose scored within the "
                  "near-symmetry band of the winner — likely symmetric "
                  "geometry; inspect score_margin)", file=sys.stderr)
        if args.out:
            # Stacked (P, 4, 4) transforms, manifest order.
            np.save(args.out, np.stack([r.transform for r in results]))
        return
    if args.robust:
        res = register_pair_robust(
            apply_fn, params, src, tgt,
            normalize=normalize, dis_thresh=args.dis_thresh,
            icp_thresh=args.icp_thresh, icp_max_iter=args.icp_max_iter,
            starts=args.robust_starts,
        )
    else:
        res = register_pair(
            apply_fn, params, src, tgt,
            normalize=normalize, dis_thresh=args.dis_thresh,
            icp_thresh=args.icp_thresh, icp_max_iter=args.icp_max_iter,
            passes=args.passes,
        )
    out = {
        "transform": res.transform.tolist(),
        "fitness": res.fitness,
        "inlier_rmse": res.inlier_rmse,
        "n_corr": res.n_corr,
    }
    if args.robust:
        out["runner_up_fitness"] = res.runner_up_fitness
        out["score_margin"] = res.score_margin
        out["ambiguous"] = res.ambiguous
        if res.ambiguous:
            print("[cli] WARNING: result flagged ambiguous — a distinct "
                  f"pose scored within {res.score_margin:.0%} of the winner "
                  "(near-symmetric geometry)", file=sys.stderr)
    if args.out:
        np.save(args.out, res.transform)
        out["saved"] = args.out
    print(json.dumps(out))


def cmd_convert(args):
    from scream_tpu.utils.torch_convert import convert_torch_checkpoint

    tree = convert_torch_checkpoint(args.pth, args.out, model=args.model)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    print(json.dumps({"out": args.out, "model": args.model, "n_params": int(n)}))


def cmd_selftest_tpu(args):
    from scream_tpu.selftest import main as selftest_main

    raise SystemExit(selftest_main())


def cmd_bench(args):
    # bench.py lives at the repository root (the driver contract), not in
    # the package — load it by path so `python -m scream_tpu bench` works
    # from any working directory.
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.main()


def cmd_visualize(args):
    import numpy as np

    from scream_tpu.data import PairDataset
    from scream_tpu.utils import viz

    # KITTI splits carry their own protocol: unit-cube normalization
    # (`/root/reference/datasets/kitti.py:268-273`), the -R^T t center hint
    # (`/root/reference/train_kitti.py:156`), NN 1.5 / ICP 1.0 at
    # max_iteration 1000 (`/root/reference/evaluate_kitti.py:106-110`).
    is_kitti = args.split.upper().startswith("KITTI")
    ds = PairDataset(args.root, args.split, with_info=False,
                     normalize="unit_cube" if is_kitti else "unit_sphere",
                     max_points=args.max_points)
    item = ds[args.item]
    T_gt = np.eye(4)
    T_gt[:3, :3] = item["rot"]
    T_gt[:3, 3] = item["trans"].reshape(3)
    os.makedirs(args.out, exist_ok=True)
    stem = os.path.join(args.out, f"{args.split}_{args.item}")
    out = {"before": stem + "_before.png", "gt": stem + "_gt.png"}
    viz.plot_registration(item["src"], item["tgt"], None, path=out["before"])
    viz.plot_registration(item["src"], item["tgt"], T_gt, path=out["gt"])

    if args.params:
        # Model views: predicted source, estimated registration, prediction
        # error — the reference's look()/visualize_3d_match flows.
        import jax
        import jax.numpy as jnp

        from scream_tpu.data import PairLoader
        from scream_tpu.models.point_transformer import PointTransformer
        from scream_tpu.pipeline.register import register_batch
        from scream_tpu.config import ModelConfig

        model_cfg = _apply_model_overrides(ModelConfig(), args)
        model = PointTransformer(model_cfg)
        # Capacity must cover BOTH clouds: src/tgt sizes are independent.
        cap = args.max_points or (max(len(item["src"]), len(item["tgt"])) + 64)

        class _One:
            def __len__(self):
                return 1

            def __getitem__(self, i):
                return ds[args.item]

        b = next(iter(PairLoader(_One(), batch_size=1, src_capacity=cap,
                                 tgt_capacity=cap)))
        dev = {k: jnp.asarray(v) for k, v in b.items()}
        apply_fn, params = _load_model_params("3dmatch", model_cfg, args.params, dev)
        from scream_tpu.pipeline.register import gt_center_hint

        center_mode = "neg_rt" if is_kitti else "trans"
        hint = gt_center_hint(dev["rot"], dev["trans"], center_mode)
        src_pred = apply_fn(params, dev["src"], dev["tgt"], dev["src_mask"],
                            dev["tgt_mask"], hint)
        zero = args.mode == "zero"
        # Zero-overlap protocol: corr = src_pred itself, thresh 0.2
        # (`/root/reference/evaluate_3d_match.py:193-195`); NN thresh 0.1 and
        # ICP max_correspondence_distance 0.1 at Open3D's default 30
        # iterations for the match flow
        # (`/root/reference/visualize_3d_match.py:73-76,139-151`); KITTI uses
        # its own thresholds (see is_kitti above).
        m = register_batch(apply_fn, params, dev,
                           dis_thresh=1.5 if is_kitti else (0.2 if zero else 0.1),
                           corr="src_pred" if zero else "tgt",
                           icp_thresh=1.0 if is_kitti else 0.1,
                           icp_max_iter=1000 if is_kitti else 30,
                           center_mode=center_mode)
        n = int(np.asarray(dev["src_mask"][0]).sum())
        pred = np.asarray(src_pred[0])[:n]
        gt_pos = np.asarray(dev["src"][0])[:n] @ item["rot"].T + item["trans"].reshape(3)
        out["re_deg"] = float(m.re_deg[0])
        out["te"] = float(m.te[0])
        # The ZERO-match flow only shows pairs with RE < 3 — worse
        # registrations "don't look good" even under the RMSE<0.2 recall bar
        # (`/root/reference/visualize_3d_match.py:117`); the match flow shows
        # every pair unconditionally (`:183-188`).
        gated = zero and out["re_deg"] >= args.re_gate
        out["display_gated"] = gated
        if not gated:
            out["predicted"] = stem + "_predicted.png"
            out["estimated"] = stem + "_estimated.png"
            out["pred_error"] = stem + "_pred_error.png"
            viz.plot_registration(item["src"], item["tgt"], None, src_pred=pred,
                                  path=out["predicted"])
            viz.plot_registration(np.asarray(dev["src"][0])[:n],
                                  np.asarray(dev["tgt"][0])[:int(np.asarray(dev["tgt_mask"][0]).sum())],
                                  np.asarray(m.transform[0]), path=out["estimated"])
            viz.plot_prediction_error(pred, gt_pos, tgt=item["tgt"],
                                      path=out["pred_error"])
            if zero:
                # Zero-match "flow lines" + the selected correspondence
                # subset. The reference thresholds squared distances in the
                # DE-SCALED frame: square_distance(src_pred/s, tgt/s) < 0.2
                # (`/root/reference/visualize_3d_match.py:62-64,98-116`).
                from scream_tpu.geometry.pairwise import square_distance

                inv_s = float(1.0 / np.asarray(dev["scale"][0]))
                d2 = np.asarray(square_distance(
                    src_pred[:, :n] * inv_s,
                    dev["tgt"][:, :int(np.asarray(dev["tgt_mask"][0]).sum())] * inv_s,
                )[0].min(axis=-1))
                selected = d2 < 0.2
                out["flow"] = stem + "_flow.png"
                viz.plot_prediction_flow(np.asarray(dev["src"][0])[:n], pred,
                                         selected=selected, path=out["flow"])
    if args.html:
        # Interactive counterpart of the reference's draw_geometries windows
        # (`/root/reference/visualize_3d_match.py:118-124,184-188`): one
        # self-contained rotatable HTML scene with all computed layers.
        from scream_tpu.utils.viz_html import export_registration_html

        kw = {}
        if args.params and not out.get("display_gated"):
            kw["T_est"] = np.asarray(m.transform[0])
            kw["src_pred"] = pred
            if zero:
                sel = np.flatnonzero(selected)[:400]
                kw["corr"] = (np.asarray(dev["src"][0])[:n][sel], pred[sel])
        out["html"] = export_registration_html(
            stem + "_interactive.html", item["src"], item["tgt"], T_gt=T_gt,
            title=f"{args.split} item {args.item}", **kw)
    print(json.dumps(out))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="scream_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a model")
    t.add_argument("task", choices=sorted(TASKS))
    t.add_argument("--root", default="data")
    t.add_argument("--epochs", type=int, default=None,
                   help="exclusive bound, reference convention: N runs N-1 "
                        "training epochs (train_3d_match.py:159)")
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--gan", action="store_true")
    t.add_argument("--lr-d", type=float, default=None,
                   help="discriminator LR override (balance knob: the "
                        "preset 1e-4 saturates on easy synthetic streams)")
    t.add_argument("--lr-g", type=float, default=None,
                   help="generator LR override (e.g. a gentler LR for "
                        "--init-params fine-tuning)")
    t.add_argument("--checkpoint-dir", default="checkpoints")
    t.add_argument("--resume", action="store_true",
                   help="restore the full train state (params+optimizer+step)"
                        " from <checkpoint-dir>/state and continue at the"
                        " next epoch")
    t.add_argument("--init-params", default=None,
                   help="warm-start the generator from a params-only orbax "
                        "dir (fresh optimizer; the fine-tune entry point)")
    t.add_argument("--synthetic-pairs", type=int, default=None,
                   help="training-pair count for the synthetic fallback "
                        "(per bucket/overlap tier when --multi-scale)")
    t.add_argument("--multi-scale", action="store_true",
                   help="size-bucketed loader (one compile per bucket); the "
                        "recipe behind the shipped multi-scale checkpoints")
    t.add_argument("--max-points", type=int, default=None,
                   help="padding bucket; oversize clouds are subsampled")
    t.add_argument("--d-model", type=int, default=None)
    t.add_argument("--self-layers", type=int, default=None)
    t.add_argument("--cross-layers", type=int, default=None)
    t.add_argument("--mesh", default=None,
                   help="multi-chip mesh, e.g. 'data=8', 'data=4,seq=2', "
                        "'data=4,model=2' (Megatron tensor parallelism) or "
                        "'auto' (all chips on the data axis); batches shard "
                        "over chips, collectives ride ICI")
    t.add_argument("--dtype", choices=["bfloat16", "float32"], default=None,
                   help="compute dtype override (bf16 is the TPU default)")
    t.add_argument("--profile-dir", default=None,
                   help="capture an XLA trace of the first epoch here")
    t.add_argument("--sample-img-dir", default=None,
                   help="dump GAN sample images here every save_img_iter steps")
    t.add_argument("--center-mode", choices=["trans", "neg_rt", "none"],
                   default=None,
                   help="src_center hint fed to the model (preset default; "
                        "'none' trains hint-free for GT-free register)")
    t.add_argument("--normalize",
                   choices=["unit_sphere", "unit_sphere_raw", "unit_cube",
                            "unit_cube_raw"],
                   default=None,
                   help="pair normalization (preset default; "
                        "'unit_sphere_raw' matches register_pair's GT-free "
                        "inference distribution)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluate", help="run a benchmark protocol")
    e.add_argument("protocol", choices=sorted(EVAL_SPLITS))
    e.add_argument("--root", default="data")
    e.add_argument("--params", default=None, help="orbax params dir")
    e.add_argument("--batch-size", type=int, default=8)
    e.add_argument("--max-points", type=int, default=None,
                   help="padding bucket; oversize clouds are subsampled")
    e.add_argument("--d-model", type=int, default=None)
    e.add_argument("--self-layers", type=int, default=None)
    e.add_argument("--cross-layers", type=int, default=None)
    e.add_argument("--bucketed", action="store_true",
                   help="group pairs by cloud size (one compile per bucket)")
    e.add_argument("--cache-dir", default=None,
                   help="pre-collated bucket-shard cache dir (built on "
                        "first use): batches stream as memmap slices, no "
                        "per-item host work — the at-scale fast path")
    e.add_argument("--dis-thresh", type=float, default=None,
                   help="NN correspondence threshold (protocol preset default)")
    e.add_argument("--rmse-thresh", type=float, default=None,
                   help="redwood RMSE recall criterion (default 0.2)")
    e.add_argument("--icp-thresh", type=float, default=None,
                   help="ICP max correspondence distance")
    e.add_argument("--icp-max-iter", type=int, default=None,
                   help="ICP iteration cap (30 for 3DMatch, 1000 for KITTI)")
    e.add_argument("--experimental-icp-chunk", dest="icp_chunk", type=int,
                   default=None,
                   help="kitti only, EXPERIMENTAL: chunked ICP with "
                        "host-side straggler re-queue. Identical protocol "
                        "numbers, but measured 3-4x SLOWER than the plain "
                        "batched loop on the target hardware — converged "
                        "lanes already skip their NN tiles in-device, so "
                        "the host compaction has nothing left to win "
                        "(docs/DESIGN.md, 'Chunked ICP: a documented "
                        "negative result')")
    e.add_argument("--re-stat", choices=["median", "mean"], default=None,
                   help="per-scene RE/TE statistic")
    e.add_argument("--center-mode", choices=["trans", "neg_rt", "none"],
                   default=None,
                   help="src_center hint (preset default; 'none' evaluates "
                        "a hint-free-trained checkpoint)")
    e.add_argument("--mesh", default=None,
                   help="multi-chip mesh for eval, e.g. 'data=8' or 'auto'")
    e.add_argument("--dtype", choices=["bfloat16", "float32"], default=None,
                   help="compute dtype override")
    e.set_defaults(fn=cmd_evaluate)

    r = sub.add_parser(
        "register",
        help="GT-free: align two raw .npy clouds, print the 4x4 transform",
    )
    r.add_argument("--src", default=None,
                   help="(N, 3) source cloud (.npy/.ply/.las/.laz)")
    r.add_argument("--tgt", default=None,
                   help="(M, 3) target cloud (.npy/.ply/.las/.laz)")
    r.add_argument("--manifest", default=None,
                   help="file of 'src tgt' cloud-path lines "
                        "(.npy/.ply/.las/.laz): register the whole stream "
                        "batched (one compile, batch_size pairs per "
                        "forward), one JSON line per pair")
    r.add_argument("--batch-size", type=int, default=8,
                   help="pairs per forward in --manifest mode")
    r.add_argument("--params", default=None, help="orbax params dir")
    r.add_argument("--normalize", choices=["unit_sphere", "unit_cube"],
                   default=None,
                   help="match the checkpoint's training convention "
                        "(auto-read from the checkpoint's model_config.json "
                        "sidecar when present; unit_sphere otherwise)")
    r.add_argument("--dis-thresh", type=float, default=0.1)
    r.add_argument("--icp-thresh", type=float, default=0.1)
    r.add_argument("--icp-max-iter", type=int, default=30)
    r.add_argument("--passes", type=int, default=2,
                   help="iterative re-registration rounds (extra rounds are "
                        "fitness-gated and exit early, so they never hurt)")
    r.add_argument("--robust", action="store_true",
                   help="multi-start + coarse-to-fine search for LARGE "
                        "unknown poses (~20x cost; see "
                        "pipeline.register_pair_robust)")
    r.add_argument("--robust-starts", choices=("axis7", "oct24", "ico60"),
                   default="axis7",
                   help="rotation-seed set for --robust (worst/median "
                        "residual over random SO(3) poses): axis7 129/69 "
                        "deg (7 lanes), oct24 62/42 (24 lanes), ico60 "
                        "44/31 (60 lanes)")
    r.add_argument("--out", default=None,
                   help="save the 4x4 transform here (stacked (P, 4, 4) in "
                        "manifest mode)")
    r.add_argument("--mesh", default=None,
                   help="manifest/scans modes: shard each dispatch's lanes "
                        "over the mesh's data axis, e.g. 'data=4' (pod-"
                        "scale serving; --batch-size must divide by it)")
    r.add_argument("--scans", nargs="+", default=None,
                   help="multiway: N scan .npy paths -> absolute poses in "
                        "scan 0's frame (pairwise serving + pose-graph "
                        "synchronization, pipeline.register_multiway)")
    r.add_argument("--window", type=int, default=2,
                   help="multiway edge window: pair each scan with the "
                        "next W scans (chain + skip loop closures)")
    r.add_argument("--refine-rounds", type=int, default=0,
                   help="multiway: scan-to-map ICP polish rounds after the "
                        "pose-graph synchronization")
    r.add_argument("--d-model", type=int, default=None)
    r.add_argument("--self-layers", type=int, default=None)
    r.add_argument("--cross-layers", type=int, default=None)
    r.add_argument("--dtype", choices=["bfloat16", "float32"], default=None)
    r.set_defaults(fn=cmd_register)

    pr = sub.add_parser("preprocess", help="raw data -> .npy artifacts")
    pr.add_argument("task", choices=["3dmatch", "kitti", "opengf", "collate"])
    pr.add_argument("--root", required=True)
    pr.add_argument("--out", default="data")
    pr.add_argument("--protocol", choices=sorted(EVAL_SPLITS), default="3dmatch",
                    help="(collate) which eval split/normalization to collate")
    pr.add_argument("--max-points", type=int, default=4096,
                    help="(collate) padding-bucket ceiling")
    pr.set_defaults(fn=cmd_preprocess)

    b = sub.add_parser("bench", help="run the throughput benchmark")
    b.set_defaults(fn=cmd_bench)

    st = sub.add_parser(
        "selftest-tpu",
        help="compiled Pallas kernels vs XLA on the real TPU backend "
             "(one JSON line; nonzero exit on mismatch)",
    )
    st.set_defaults(fn=cmd_selftest_tpu)

    c = sub.add_parser(
        "convert",
        help="reference .pth checkpoint -> orbax params directory",
    )
    c.add_argument("--pth", required=True,
                   help="e.g. params/point-generator.pth from the reference")
    c.add_argument("--out", required=True, help="orbax output directory")
    c.add_argument("--model", choices=["point", "dem", "disc"], default="point",
                   help="point (point/kitti-generator), dem (dem-generator), "
                        "disc (discriminator)")
    c.set_defaults(fn=cmd_convert)

    v = sub.add_parser("visualize", help="render a pair to PNGs")
    v.add_argument("--root", default="data")
    v.add_argument("--split", default="3DMatch_test")
    v.add_argument("--item", type=int, default=0)
    v.add_argument("--out", default="viz_out")
    v.add_argument("--params", default=None, help="orbax params dir for model views")
    v.add_argument("--mode", choices=["match", "zero"], default="match",
                   help="zero = zero-overlap flow (corr=src_pred, flow lines)")
    v.add_argument("--re-gate", type=float, default=3.0,
                   help="emit model-view PNGs only when RE < this (deg), the "
                        "reference's display gate (visualize_3d_match.py:117); "
                        "set large to always emit")
    v.add_argument("--html", action="store_true",
                   help="also write an interactive self-contained HTML scene "
                        "(rotatable clouds + correspondence lines, no "
                        "display server needed — utils/viz_html.py)")
    v.add_argument("--max-points", type=int, default=None)
    v.add_argument("--d-model", type=int, default=None)
    v.add_argument("--self-layers", type=int, default=None)
    v.add_argument("--cross-layers", type=int, default=None)
    v.set_defaults(fn=cmd_visualize)
    return p


def main(argv: Optional[list] = None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
