"""Benchmark: 3DMatch-style registration throughput on one chip.

Measures the full registration path — flagship PointTransformer forward
(d_model 256, 6+6 layers, bf16), squared-distance correspondence search,
weighted Kabsch, batched ICP refinement — on padded 4096-point pairs, the
shape class of 3DMatch after voxel downsampling at 0.0625
(`/root/reference/process_3d_match.py:30`).

The reference runs this one pair at a time with CPU SVD and C++ ICP hops
(~1 pair per forward, SURVEY.md §6); the north-star target is >= 50
pairs/sec/chip (BASELINE.json). Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "pairs/sec", "vs_baseline": N}``.

``python bench.py --suite`` additionally times the other BASELINE.json
workload classes (KITTI-sized clouds, the OpenGF DEM forward, the
adversarial training step) and prints one JSON line each to stderr.
``--breakdown`` adds the step breakdown (forward / solve / ICP shares) and
an analytic-FLOPs MFU figure at the headline operating point.
``--roofline`` adds the per-stage forward roofline: analytic FLOPs +
ideal-fusion HBM bytes per stage, XLA's cost analysis of the compiled
executable, and the derived memory/compute floors (docs/BENCH.md
"Forward roofline"; regenerate docs/roofline.json with
``python bench.py --roofline --write docs/roofline.json``).
``--write PATH`` persists every emitted metric to a JSON file
(regenerate docs/bench_results.json with
``python bench.py --suite --breakdown --write docs/bench_results.json``).
"""

import json
import os
import sys
import time

# Every emitted metric also lands here so --write can persist the full run.
RESULTS = []

# Watchdog bookkeeping: the remote-TPU runtime's failure mode for a relay
# that dies MID-RUN (after the startup probe passed) is an infinite retry
# loop — no exception, no timeout. [last-progress time, headline-emitted?].
_PROGRESS = [None, False]


def _emit(record, stream=None):
    RESULTS.append(record)
    if _PROGRESS[0] is not None:
        _PROGRESS[0] = time.time()
    print(json.dumps(record), file=stream or sys.stderr, flush=True)


def _start_watchdog(budget_s: int):
    """Hard-exit with ONE structured JSON line if no metric lands for
    ``budget_s`` (default 20 min — past the worst cold remote compile).
    A driver run that would otherwise hang forever on a mid-run tunnel
    death records a parseable stall instead."""
    import threading

    _PROGRESS[0] = time.time()

    def run():
        while True:
            time.sleep(30)
            last = _PROGRESS[0]
            if last is None:
                return  # disarmed: the bench run completed
            idle = time.time() - last
            if idle > budget_s:
                rec = {
                    "error": "stalled",
                    "metric": "3dmatch_registration_pairs_per_sec_per_chip",
                    "value": None,
                    "unit": "pairs/sec",
                    "detail": f"no bench progress for {int(idle)}s "
                              "(mid-run backend hang?)",
                }
                # The driver parses stdout; only use it if the headline
                # line never made it out.
                print(json.dumps(rec),
                      file=sys.stderr if _PROGRESS[1] else sys.stdout,
                      flush=True)
                os._exit(4)

    threading.Thread(target=run, daemon=True).start()

BASELINE_PAIRS_PER_SEC = 50.0  # north-star target, BASELINE.json
# Env overrides exist for the test-suite smoke path only; the driver runs
# the defaults.
BATCH = int(os.environ.get("BENCH_BATCH", 16))
N_POINTS = int(os.environ.get("BENCH_POINTS", 4096))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
ICP_ITERS = int(os.environ.get("BENCH_ICP_ITERS", 30))
# The forced-CPU test backend cannot execute bf16 dots; the smoke test sets f32.
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
NORM_DTYPE = os.environ.get("BENCH_NORM_DTYPE", "float32")
# --suite class point counts (batch stays 8). The forced-CPU smoke test
# shrinks these; the driver runs the defaults.
SUITE_KITTI_POINTS = int(os.environ.get("BENCH_SUITE_KITTI_POINTS", 8192))
SUITE_DEM_POINTS = int(os.environ.get("BENCH_SUITE_DEM_POINTS", 4096))
SUITE_SERVE_POINTS = int(os.environ.get("BENCH_SUITE_SERVE_POINTS", 512))
SUITE_GAN_POINTS = int(os.environ.get("BENCH_SUITE_GAN_POINTS", 2048))
TRACE_DIR = None  # set by --trace


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import ModelConfig
    from scream_tpu.data import PairLoader, SyntheticPairDataset
    from scream_tpu.models.point_transformer import PointTransformer
    from scream_tpu.pipeline.register import register_batch

    model = PointTransformer(ModelConfig(dtype=DTYPE, norm_dtype=NORM_DTYPE))

    # DISTINCT batch per timed iteration: the remote-TPU runtime caches
    # repeated identical dispatches, so re-running one batch reports cache
    # hits, not compute. Results are fetched to host to force completion.
    ds = SyntheticPairDataset(
        length=BATCH * (ITERS + 1), n_src=N_POINTS - 256, n_tgt=N_POINTS - 64,
        seed=0,
    )
    loader = PairLoader(
        ds, batch_size=BATCH, src_capacity=N_POINTS, tgt_capacity=N_POINTS,
        num_workers=8, prefetch=4,
    )
    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in loader]

    rng = jax.random.PRNGKey(0)
    b0 = batches[0]
    params = model.init(
        rng, b0["src"], b0["tgt"], b0["src_mask"], b0["tgt_mask"],
        jnp.swapaxes(b0["trans"], -1, -2),
    )["params"]
    # Benchmark with the shipped trained checkpoint when its architecture
    # matches, so the reported median_re_deg is a real registration quality
    # (random weights -> ~70 deg garbage poses). Throughput is unchanged
    # either way: batched ICP runs to the slowest lane, so convergence-based
    # early exit does not fire at batch 16 (docs/DESIGN.md).
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "params", "point-generator")
    if os.path.isdir(ckpt) and os.environ.get("BENCH_RANDOM_PARAMS") != "1":
        try:
            from scream_tpu.utils.checkpoint import load_params

            params = load_params(ckpt, params)
            print("# params: shipped point-generator checkpoint", file=sys.stderr)
        except Exception as e:  # architecture drift: fall back to random
            print(f"# params: random init (checkpoint mismatch: {e})",
                  file=sys.stderr)

    def apply_fn(params, src, tgt, src_mask, tgt_mask, src_center):
        return model.apply({"params": params}, src, tgt, src_mask, tgt_mask, src_center)

    def dispatch(b):
        return register_batch(
            apply_fn, params, b,
            dis_thresh=0.1, corr="tgt", icp_thresh=0.1, icp_max_iter=ICP_ITERS,
        )

    t0 = time.time()
    m = dispatch(batches[0])
    np.asarray(m.transform)  # compile + first run
    compile_s = time.time() - t0

    # Steady state: keep one batch in flight so the host fetch of result i
    # overlaps the device compute of batch i+1 (every input is distinct and
    # every result is fetched — this measures pipelined throughput, not the
    # relay's dispatch cache).
    t0 = time.time()
    pending = dispatch(batches[1])
    for b in batches[2:]:
        nxt = dispatch(b)
        m = pending
        np.asarray(m.transform)
        pending = nxt
    m = pending
    np.asarray(m.transform)
    elapsed = time.time() - t0
    pairs_per_sec = BATCH * ITERS / elapsed

    _emit({
        "metric": "3dmatch_registration_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
    }, stream=sys.stdout)
    _PROGRESS[1] = True  # headline out: a later stall may not reuse stdout
    print(
        f"# backend={jax.default_backend()} batch={BATCH} n_points={N_POINTS} "
        f"icp_iters={ICP_ITERS} compile={compile_s:.1f}s "
        f"steady={elapsed / ITERS * 1e3:.1f}ms/batch "
        f"median_re_deg={float(jnp.median(m.re_deg)):.3f}",
        file=sys.stderr,
    )

    # Optional: capture an XLA profiler trace of two steady-state batches at
    # the headline operating point (--trace DIR; view with xprof/TensorBoard).
    # Separate from the timed loop above so tracing overhead never pollutes
    # the reported pairs/sec.
    if TRACE_DIR is not None:
        from scream_tpu.utils.profiling import annotate, trace

        # FRESH inputs for the traced calls: batches[:] were all already
        # dispatched above, and the relay serves repeated identical
        # dispatches from its cache — a traced cache hit records RPC time,
        # not kernels.
        trace_rng = np.random.default_rng(99)
        with trace(TRACE_DIR):
            for b in batches[:2]:
                tb = dict(b)
                tb["src"] = b["src"] + jnp.asarray(
                    trace_rng.standard_normal(b["src"].shape)
                    .astype(np.float32) * 1e-4)
                with annotate("register_batch"):
                    np.asarray(dispatch(tb).transform)
        print(f"# trace written to {TRACE_DIR}", file=sys.stderr)

    # Secondary: throughput mode (exact NN over a strided 1024-point ICP
    # subsample; pose quality matches full ICP on oracle checks).
    def dispatch_sub(b):
        return register_batch(
            apply_fn, params, b, dis_thresh=0.1, corr="tgt",
            icp_thresh=0.1, icp_max_iter=ICP_ITERS, icp_subsample=1024,
        )

    np.asarray(dispatch_sub(batches[0]).transform)
    t0 = time.time()
    pending = dispatch_sub(batches[1])
    for b in batches[2:]:
        nxt = dispatch_sub(b)
        np.asarray(pending.transform)
        pending = nxt
    np.asarray(pending.transform)
    sub_pps = BATCH * ITERS / (time.time() - t0)
    _emit({"metric": "3dmatch_registration_pairs_per_sec_icp_subsampled",
           "value": round(sub_pps, 2), "unit": "pairs/sec"})


def _timed(fn, make_input, iters=6):
    """Pipelined per-call wall time: one dispatch in flight so the host fetch
    of result k overlaps the device compute of k+1 (same methodology as the
    main bench — sync timing would charge every call the remote tunnel's RPC
    round trip). Distinct input + host fetch per call (the remote-TPU runtime
    caches identical dispatches)."""
    import numpy as np

    inputs = [make_input(k) for k in range(iters + 1)]
    np.asarray(fn(inputs[0]))  # compile + warm
    t0 = time.time()
    pending = fn(inputs[1])
    for x in inputs[2:]:
        nxt = fn(x)
        np.asarray(pending)
        pending = nxt
    np.asarray(pending)
    return (time.time() - t0) / iters


def suite():
    """Secondary benchmarks covering the remaining BASELINE.json configs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import ModelConfig, RenderConfig
    from scream_tpu.data import DEMLoader, PairLoader, SyntheticPairDataset
    from scream_tpu.data.synthetic import make_dem_patch
    from scream_tpu.models.point_transformer import DEMTransformer, PointTransformer
    from scream_tpu.pipeline.register import register_batch
    from scream_tpu.train import optim
    from scream_tpu.train.steps import init_train_state, make_registration_train_step
    from scream_tpu.config import TrainConfig

    host = np.random.default_rng(0)

    # Measurement tooling: BENCH_SUITE_ONLY=kitti,opengf,serve,gan selects a
    # subset of the suite classes (isolated re-runs for variance studies —
    # the KITTI class alone costs minutes at the protocol's ICP 1000).
    # Unset = all classes; the driver runs the defaults.
    _only = {s.strip() for s in os.environ.get("BENCH_SUITE_ONLY", "").split(",")
             if s.strip()}
    _known = {"kitti", "opengf", "serve", "gan"}
    if _only - _known:
        # A typo'd token would silently deselect every class and the suite
        # would "run" producing zero metrics — fail loudly instead.
        sys.stderr.write(
            f"bench.py: unknown BENCH_SUITE_ONLY token(s) {sorted(_only - _known)} "
            f"(known: {sorted(_known)})\n")
        sys.exit(2)

    def want(name):
        return not _only or name in _only

    def emit(metric, value, unit):
        _emit({"metric": metric, "value": round(value, 2), "unit": unit})

    # Same dtype operating point as main()/breakdown() — BENCH_DTYPE=float32
    # is how the forced-CPU smoke path avoids bf16 dots (see module header).
    cfg = ModelConfig(dtype=DTYPE, norm_dtype=NORM_DTYPE)

    # --- KITTI-sized registration (voxel 0.7 -> ~8k pts, thresholds 1.5/1.0) ---
    # extent=40 -> an ~80 m metric scene: ICP runs in the de-normalized frame
    # (scream_tpu/pipeline/register.py), so the protocol's 1.0 m threshold
    # (`/root/reference/evaluate_kitti.py:69`) gets its real selectivity —
    # at the historic extent=1 the threshold covered half the cloud and the
    # bounded-NN tile pruning never fired.
    # NOTE: this KITTI dataset/model/params setup is shared state — the
    # want("serve") class below reuses `apply_fn`/`params`, so it stays
    # ungated (gating it under want("kitti") would NameError the serve-only
    # isolated re-run). With BENCH_SUITE_ONLY=opengf/gan it still pays this
    # one-time init; that cost is backend init, not a timed measurement.
    B, NP = 8, SUITE_KITTI_POINTS
    kitti_extent = float(os.environ.get("BENCH_KITTI_EXTENT", 40.0))
    ds = SyntheticPairDataset(length=B, n_src=NP - 512, n_tgt=NP - 256, seed=1,
                              normalize="unit_cube", extent=kitti_extent)
    b0 = {k: jnp.asarray(v) for k, v in next(iter(PairLoader(
        ds, batch_size=B, src_capacity=NP, tgt_capacity=NP))).items()}
    model = PointTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), b0["src"], b0["tgt"],
                        b0["src_mask"], b0["tgt_mask"],
                        jnp.swapaxes(b0["trans"], -1, -2))["params"]

    def apply_fn(p, src, tgt, sm, tm, c):
        return model.apply({"params": p}, src, tgt, sm, tm, c)

    # Protocol ICP budget: the KITTI eval runs max_iteration=1000
    # (`/root/reference/evaluate_kitti.py:69`; CLAUDE.md). The while_loop
    # exits on Open3D's convergence criteria, so the measured cost reflects
    # actual iterations to convergence under the 1000-iteration protocol cap
    # — not a fixed 30-iteration discount.
    kitti_icp_iters = int(os.environ.get("BENCH_KITTI_ICP_ITERS", 1000))

    def kitti_run(b):
        return register_batch(apply_fn, params, b, dis_thresh=1.5, corr="tgt",
                              icp_thresh=1.0,
                              icp_max_iter=kitti_icp_iters).transform

    def kitti_input(k):
        b = dict(b0)
        b["src"] = b0["src"] + jnp.asarray(
            host.standard_normal(b0["src"].shape).astype(np.float32) * 1e-4)
        np.asarray(b["src"])
        return b

    if want("kitti"):
        _emit({"metric": "kitti_registration_pairs_per_sec",
               "value": round(B / _timed(kitti_run, kitti_input), 2),
               "unit": "pairs/sec", "icp_max_iter": kitti_icp_iters,
               "batch": B, "n_points": NP, "extent_m": kitti_extent})

    # Same class through the straggler-mitigated path: chunked ICP with
    # host-side compaction (register_batch_requeue). Identical protocol
    # numbers; converged lanes stop riding to the slowest lane's 1000th
    # iteration. Emitting both rows quantifies the mitigation on hardware.
    kitti_chunk = int(os.environ.get("BENCH_KITTI_ICP_CHUNK", 100))
    if kitti_chunk > 0 and want("kitti"):
        from scream_tpu.geometry.icp import registration_icp_batched
        from scream_tpu.pipeline.register import register_batch_requeue

        # Pre-compile EVERY pow2 compaction bucket: lane retirement is
        # data-dependent, so without this a timed input whose lanes retire
        # in an unseen grouping triggers a fresh _icp_chunk/_icp_finalize
        # compile inside the timed loop (seconds vs ms on the tunnel).
        n = B
        while n >= 1:
            registration_icp_batched(
                b0["src"][:n], b0["tgt"][:n], 1.0, max_iteration=1,
                src_mask=b0["src_mask"][:n] > 0,
                tgt_mask=b0["tgt_mask"][:n] > 0, chunk=1)
            n //= 2

        def kitti_requeue_run(b):
            return register_batch_requeue(
                apply_fn, params, b, dis_thresh=1.5, corr="tgt",
                icp_thresh=1.0, icp_max_iter=kitti_icp_iters,
                icp_chunk=kitti_chunk).transform

        _emit({"metric": "kitti_registration_pairs_per_sec_requeue",
               "value": round(B / _timed(kitti_requeue_run, kitti_input), 2),
               "unit": "pairs/sec", "icp_max_iter": kitti_icp_iters,
               "icp_chunk": kitti_chunk, "batch": B, "n_points": NP,
               "extent_m": kitti_extent})

    # --- OpenGF DEM generation forward ---
    if want("opengf"):
        Bd, Nd = 8, SUITE_DEM_POINTS
        patches = [make_dem_patch(np.random.default_rng(i), n_dsm=Nd, n_dem=Nd)
                   for i in range(Bd)]

        class _Ds:
            def __len__(self):
                return Bd

            def __getitem__(self, i):
                return patches[i]

        db = next(iter(DEMLoader(_Ds(), batch_size=Bd, dsm_capacity=Nd,
                                 dem_capacity=Nd, coarse_capacity=Nd // 8)))
        db = {k: jnp.asarray(v) for k, v in db.items()}
        import dataclasses

        dem_model = DEMTransformer(dataclasses.replace(cfg, separate_stems=True))
        dem_params = dem_model.init(jax.random.PRNGKey(0), db["dsm"],
                                    db["dem_coarse"], db["dsm_mask"],
                                    db["dem_coarse_mask"])["params"]
        dem_fwd = jax.jit(lambda d: dem_model.apply(
            {"params": dem_params}, d, db["dem_coarse"], db["dsm_mask"],
            db["dem_coarse_mask"]))

        def dem_input(k):
            x = db["dsm"] + jnp.asarray(
                host.standard_normal(db["dsm"].shape).astype(np.float32) * 1e-4)
            np.asarray(x)
            return x

        emit("opengf_dem_patches_per_sec", Bd / _timed(dem_fwd, dem_input),
             "patches/sec")

    # --- GT-free serving path (register_pairs: batched forward + vmapped
    # always-accept ICP, no GT anywhere) — the `register --manifest` class ---
    if want("serve"):
        from scream_tpu.pipeline.register import _register_pairs_batch

        Bg, Ng = 8, SUITE_SERVE_POINTS
        gds = SyntheticPairDataset(length=Bg, n_src=Ng - 64, n_tgt=Ng - 32,
                                   seed=3)
        gb = {k: jnp.asarray(v) for k, v in next(iter(PairLoader(
            gds, batch_size=Bg, src_capacity=Ng, tgt_capacity=Ng))).items()}
        gb = {k: gb[k] for k in ("src", "tgt", "src_mask", "tgt_mask", "scale",
                                 "center")}

        def serve_run(b):
            return _register_pairs_batch(apply_fn, params, b, 0.1, "tgt", 0.1,
                                         ICP_ITERS)[0]

        def serve_input(k):
            b = dict(gb)
            b["src"] = gb["src"] + jnp.asarray(
                host.standard_normal(gb["src"].shape).astype(np.float32) * 1e-4)
            np.asarray(b["src"])
            return b

        _emit({"metric": "gt_free_serving_pairs_per_sec",
               "value": round(Bg / _timed(serve_run, serve_input), 2),
               "unit": "pairs/sec", "batch": Bg, "n_points": Ng,
               "note": "register_pairs batched GT-free path "
                       "(register --manifest)"})

    # --- adversarial (GAN) training step ---
    if want("gan"):
        Bt, Nt = 8, SUITE_GAN_POINTS
        tds = SyntheticPairDataset(length=Bt, n_src=Nt - 128, n_tgt=Nt - 64,
                                   seed=2)
        tb = {k: jnp.asarray(v) for k, v in next(iter(PairLoader(
            tds, batch_size=Bt, src_capacity=Nt, tgt_capacity=Nt))).items()}
        gmodel = PointTransformer(cfg)
        gparams = gmodel.init(jax.random.PRNGKey(1), tb["src"], tb["tgt"],
                              tb["src_mask"], tb["tgt_mask"],
                              jnp.swapaxes(tb["trans"], -1, -2))["params"]
        from scream_tpu.models.gan import PatchDiscriminator, images_to_nhwc
        from scream_tpu.ops.render import render_depth_images
        from scream_tpu.train.steps import make_disc_logit_fn

        disc = PatchDiscriminator(input_nc=2)
        imgs0 = render_depth_images(tb["src"], tb["tgt"], tb["src_mask"],
                                    tb["tgt_mask"], rho=24.0, width=64)
        dvars = disc.init(jax.random.PRNGKey(2), images_to_nhwc(imgs0),
                          train=False)
        opt = optim.generator_optimizer(TrainConfig(use_gan=True), 100)
        step = make_registration_train_step(
            gmodel, opt, use_gan=True, disc_apply=make_disc_logit_fn(disc),
            render_cfg=RenderConfig(), gan_weight=0.1,
        )
        state_box = [init_train_state(gparams, opt)]

        def train_run(b):
            state, metrics, fake = step(state_box[0], b, dvars)
            state_box[0] = state
            return fake

        def train_input(k):
            b = dict(tb)
            b["src"] = tb["src"] + jnp.asarray(
                host.standard_normal(tb["src"].shape).astype(np.float32) * 1e-4)
            np.asarray(b["src"])
            return b

        emit("adversarial_train_pairs_per_sec",
             Bt / _timed(train_run, train_input), "pairs/sec")


def _forward_flops(n_src, n_tgt, d=256, self_layers=6, cross_layers=6,
                   head_dim=32):
    """Analytic FLOPs of one PointTransformer forward pass (one pair).

    Dense d->d on one token = 2 d^2 FLOPs. Per self block per token:
    q/k/v/merge 8 d^2 + FFN 16 d^2 = 24 d^2 (+ ~6 d*head_dim linear-attention
    einsums, which are negligible but counted). The shared stems process both
    clouds; the cross stage runs on src with k/v projections over tgt.
    """
    per_tok_self = 24 * d * d + 6 * d * head_dim
    stems = self_layers * (n_src + n_tgt) * per_tok_self
    cross_self = cross_layers * n_src * per_tok_self
    cross_attn = cross_layers * (
        n_src * (20 * d * d + 6 * d * head_dim) + n_tgt * 4 * d * d
    )
    embed = (n_src + n_tgt) * 2 * 3 * d
    head = n_src * (4 * d * d + 2 * 3 * d)
    return stems + cross_self + cross_attn + embed + head


# TPU v5e peak bf16 matmul throughput and HBM bandwidth (public spec:
# 197 TFLOP/s bf16, 819 GB/s HBM).
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def _forward_stage_roofline(n_src, n_tgt, batch, d=256, self_layers=6,
                            cross_layers=6, heads=8, ffn_mult=4):
    """Per-stage analytic roofline of the PointTransformer forward.

    For every stage type, sums FLOPs and *ideal-fusion* HBM bytes over all
    block applications in the net (stems run on src AND tgt; the cross stage
    alternates self-on-src and cross src<-tgt, `models/point_transformer.py`).
    "Ideal fusion" charges each activation tensor exactly one HBM read per
    consumer op-group and one write per producer (bf16 = 2 bytes), weights one
    fp32 read per layer apply, and assumes every elementwise op (elu feature
    maps, residual adds, relu, casts) fuses into the adjacent matmul/norm —
    the best any compiler could do with the FFN hidden (B*N x 4d bf16, too big
    for VMEM) still round-tripping HBM once.  The resulting per-stage
    ``floor_ms = max(flops/peak, bytes/bw)`` is a *lower bound*; the gap
    between the summed floor and the measured forward time is layout/copy
    overhead XLA actually pays (its own number: ``xla_bytes_accessed``).
    """
    hd = d // heads
    tok = 2  # bf16 activation bytes
    stages = {}

    def add(name, flops, bytes_):
        f0, b0 = stages.get(name, (0.0, 0.0))
        stages[name] = (f0 + flops, b0 + bytes_)

    # (L, S) per block application: 6 stem applies on src, 6 on tgt,
    # 6 cross-stage self applies on src, 6 cross applies (q=src, kv=tgt).
    self_apps = ([(n_src, n_src)] * self_layers + [(n_tgt, n_tgt)] * self_layers
                 + [(n_src, n_src)] * cross_layers)
    cross_apps = [(n_src, n_tgt)] * cross_layers

    for L, S in self_apps:
        # fused qkv: read L*d, write 3*L*d, one (d,3d) fp32 weight
        add("qkv_proj", 6 * d * d * L, (L * d + 3 * L * d) * tok + 3 * d * d * 4)
    for L, S in cross_apps:
        # q proj on L + fused kv proj on S
        add("qkv_proj", 2 * d * d * L + 4 * d * d * S,
            (2 * L * d + 3 * S * d) * tok + 3 * d * d * 4)
    for L, S in self_apps + cross_apps:
        # linear attention: KV = K^T V (2*S*d*hd), Z dot (2*L*d), out = Q KV
        # (2*L*d*hd); reads Q,K,V, writes out; fp32 KV/K_sum intermediates
        # are heads*hd*hd*4 ~ 32 KB, negligible.
        add("attn_einsums", 2 * S * d * hd + 2 * L * d + 2 * L * d * hd,
            (L * d + 2 * S * d + L * d) * tok)
        # merge d->d on L
        add("merge_proj", 2 * d * d * L, 2 * L * d * tok + d * d * 4)
        # norm1(message + q): reads two L*d tensors, writes one; ~8 flops/elt
        add("layernorms", 8 * L * d, 3 * L * d * tok)
        # ffn_in (+relu fused) then ffn_out; hidden round-trips HBM once
        add("ffn", 4 * ffn_mult * d * d * L,
            (2 * L * d + 2 * L * ffn_mult * d) * tok + 2 * ffn_mult * d * d * 4)
        add("layernorms", 8 * L * d, 3 * L * d * tok)
    # embedding (PE + Dense(3->d) + pre-norm) and the 3-layer coor head
    add("embed_head",
        (n_src + n_tgt) * 2 * 3 * d + n_src * (4 * d * d + 2 * 3 * d),
        ((n_src + n_tgt) * 2 * d + n_src * 3 * d) * tok)

    rows = []
    for name, (f, b) in stages.items():
        f, b = f * batch, b * batch
        t_c = f / V5E_PEAK_BF16_FLOPS
        t_m = b / V5E_HBM_BYTES_PER_S
        rows.append({
            "stage": name,
            "gflops": round(f / 1e9, 2),
            "mbytes": round(b / 1e6, 2),
            "ai_flops_per_byte": round(f / b, 1),
            "floor_ms": round(max(t_c, t_m) * 1e3, 3),
            "bound": "compute" if t_c >= t_m else "memory",
        })
    rows.sort(key=lambda r: -r["floor_ms"])
    return rows


def roofline():
    """Quantified roofline for the headline forward (VERDICT r2 item 6).

    Emits: the per-stage analytic table (`_forward_stage_roofline`), XLA's
    own cost analysis of the compiled executable (flops + bytes accessed),
    the measured forward time, and the derived floors/ceiling — i.e. whether
    the observed MFU is a memory bound or residual compiler overhead, and how
    much each lever could possibly buy.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import ModelConfig
    from scream_tpu.data import PairLoader, SyntheticPairDataset
    from scream_tpu.models.point_transformer import PointTransformer

    model = PointTransformer(ModelConfig(dtype=DTYPE, norm_dtype=NORM_DTYPE))
    ds = SyntheticPairDataset(length=BATCH, n_src=N_POINTS - 256,
                              n_tgt=N_POINTS - 64, seed=5)
    b0 = {k: jnp.asarray(v) for k, v in next(iter(PairLoader(
        ds, batch_size=BATCH, src_capacity=N_POINTS,
        tgt_capacity=N_POINTS))).items()}
    params = model.init(jax.random.PRNGKey(0), b0["src"], b0["tgt"],
                        b0["src_mask"], b0["tgt_mask"],
                        jnp.swapaxes(b0["trans"], -1, -2))["params"]
    host = np.random.default_rng(11)

    fwd = jax.jit(lambda b: model.apply(
        {"params": params}, b["src"], b["tgt"], b["src_mask"], b["tgt_mask"],
        jnp.swapaxes(b["trans"], -1, -2)))

    def perturbed(k):
        b = dict(b0)
        b["src"] = b0["src"] + jnp.asarray(
            host.standard_normal(b0["src"].shape).astype(np.float32) * 1e-4)
        np.asarray(b["src"])
        return b

    t_fwd = _timed(fwd, perturbed)
    flops = _forward_flops(N_POINTS, N_POINTS) * BATCH
    mfu = flops / t_fwd / V5E_PEAK_BF16_FLOPS

    rows = _forward_stage_roofline(N_POINTS, N_POINTS, BATCH)
    ideal_bytes = sum(r["mbytes"] for r in rows) * 1e6
    floor_ms = max(flops / V5E_PEAK_BF16_FLOPS,
                   ideal_bytes / V5E_HBM_BYTES_PER_S) * 1e3
    # Sum of per-stage floors is the tighter (non-overlapping-stage) bound.
    stage_floor_ms = sum(r["floor_ms"] for r in rows)
    for r in rows:
        _emit({"metric": "roofline_stage", **r})

    # XLA's own cost model for the whole compiled executable — what the
    # compiler actually scheduled, copies and materialized layouts included.
    xla_flops = xla_bytes = None
    try:
        ca = fwd.lower(b0).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        xla_flops = float(ca.get("flops", 0.0)) or None
        xla_bytes = float(ca.get("bytes accessed", 0.0)) or None
    except Exception as e:  # cost_analysis is backend-dependent
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    rec = {
        "metric": "roofline_forward_summary",
        "measured_ms": round(t_fwd * 1e3, 2),
        "measured_mfu_pct": round(mfu * 100.0, 2),
        "analytic_gflops": round(flops / 1e9, 2),
        "ideal_fusion_mbytes": round(ideal_bytes / 1e6, 2),
        "arithmetic_intensity": round(flops / ideal_bytes, 1),
        "compute_floor_ms": round(flops / V5E_PEAK_BF16_FLOPS * 1e3, 3),
        "memory_floor_ms": round(ideal_bytes / V5E_HBM_BYTES_PER_S * 1e3, 3),
        "stage_sum_floor_ms": round(stage_floor_ms, 3),
        "roofline_max_mfu_pct": round(
            flops / V5E_PEAK_BF16_FLOPS / (stage_floor_ms / 1e3) * 100.0, 2),
        "batch": BATCH, "n_points": N_POINTS,
    }
    if xla_flops is not None:
        rec["xla_gflops"] = round(xla_flops / 1e9, 2)
    if xla_bytes is not None:
        rec["xla_mbytes_accessed"] = round(xla_bytes / 1e6, 2)
        rec["xla_memory_floor_ms"] = round(
            xla_bytes / V5E_HBM_BYTES_PER_S * 1e3, 3)
    _emit(rec)


def _trace_device_ops(thunk, n_calls=2):
    """Run ``thunk`` ``n_calls`` times under a fresh profiler trace and
    return ``(busy_ms_per_call, agg)`` where busy is the interval-union of
    the device's "XLA Ops" track (nested events don't double-count) and
    ``agg`` maps op name -> total us. The remote tunnel caches identical
    dispatches, so ``thunk`` must produce distinct work per call (it
    receives the call index)."""
    import glob
    import gzip
    import shutil
    import tempfile
    import collections

    import jax

    out_dir = tempfile.mkdtemp(prefix="scream_trace_")
    try:
        jax.profiler.start_trace(out_dir)
        for k in range(n_calls):
            thunk(k)
        jax.profiler.stop_trace()
        paths = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
        procs, threads = {}, {}
        spans = []
        agg = collections.Counter()
        for p in paths:
            with gzip.open(p, "rt") as f:
                data = json.load(f)
            for ev in data.get("traceEvents", []):
                ph = ev.get("ph")
                if ph == "M":
                    if ev.get("name") == "process_name":
                        procs[ev["pid"]] = ev["args"].get("name", "")
                    elif ev.get("name") == "thread_name":
                        threads[(ev["pid"], ev.get("tid"))] = (
                            ev["args"].get("name", ""))
            for ev in data.get("traceEvents", []):
                if ev.get("ph") != "X":
                    continue
                if "TPU" not in procs.get(ev["pid"], ""):
                    continue
                if threads.get((ev["pid"], ev.get("tid"))) != "XLA Ops":
                    continue
                spans.append((ev["ts"], ev["ts"] + ev.get("dur", 0)))
                agg[ev["name"]] += ev.get("dur", 0)
        spans.sort()
        busy, cur_s, cur_e = 0.0, None, None
        for s, e in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            busy += cur_e - cur_s
        return busy / 1e3 / n_calls, agg
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def icp_roofline():
    """ICP-side roofline (VERDICT r3 item 1) + device-true solve stage
    (item 4): where each millisecond of the ICP-dominated step half goes,
    measured from the device trace, with an analytic work model of the
    bounded-NN kernel and the floors it implies.

    Methodology notes:
      * The budget-pair SLOPE method (never-converge loops at two budgets)
        under-measures late iterations: once a lane numerically reaches its
        fixed point the kernel sees bit-identical inputs and the remote
        runtime serves the dispatch from cache. Slopes are reported for
        early budgets only (all lanes still moving); the traced call is the
        ground truth.
      * The kernel's cost scales with the LIVE sub-slab fraction of the
        skip matrix (spatial pruning), reported alongside; the analytic
        model prices one live (256 x 128) sub-slab tile at ~330
        (8,128)-vreg VPU ops (distance + min-reduce + argmin + one-hot
        select + accumulate) — the MXU dots (cross term, winner select)
        are negligible at K=3.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import ModelConfig
    from scream_tpu.data import PairLoader, SyntheticPairDataset
    from scream_tpu.geometry.icp import registration_icp_batched, _spatial_sort
    from scream_tpu.models.point_transformer import PointTransformer
    from scream_tpu.pipeline.register import denormalized_gt, register_batch

    ds = SyntheticPairDataset(length=BATCH, n_src=N_POINTS - 256,
                              n_tgt=N_POINTS - 64, seed=3)
    b0 = {k: jnp.asarray(v) for k, v in next(iter(PairLoader(
        ds, batch_size=BATCH, src_capacity=N_POINTS,
        tgt_capacity=N_POINTS))).items()}
    s = b0["scale"][:, None, None]
    c = b0["center"][:, None, :]
    src_dn = b0["src"] / s + c
    tgt_dn = b0["tgt"] / s + c
    sm, tm = b0["src_mask"] > 0, b0["tgt_mask"] > 0
    gt = denormalized_gt(b0["rot"], b0["trans"], b0["scale"], b0["center"])
    # RUN-UNIQUE rng: with a fixed seed every dispatch in this function is
    # byte-identical across invocations and the remote relay serves CACHED
    # responses — including, observed round 4, identical profiler-trace
    # content, so "re-measured" trace metrics were replays. Entropy-seed so
    # each invocation traces fresh executions.
    host = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    init = np.asarray(gt).copy()
    init[:, :3, 3] += host.normal(0, 0.02, (BATCH, 3)).astype(np.float32)
    init = jnp.asarray(init)
    thresh = 0.1

    # --- early-budget slope (all lanes still far from their fixed points) ---
    def run(src, max_it):
        return registration_icp_batched(
            src, tgt_dn, thresh, init=init, max_iteration=max_it,
            src_mask=sm, tgt_mask=tm,
            relative_fitness=-1.0, relative_rmse=-1.0).transformation

    def timed(max_it, iters=6):
        ins = []
        for k in range(iters + 1):
            d = src_dn + jnp.asarray(
                host.standard_normal(src_dn.shape).astype(np.float32) * 1e-5)
            np.asarray(d)
            ins.append(d)
        np.asarray(run(ins[0], max_it))
        t0 = time.time()
        pend = run(ins[1], max_it)
        for x in ins[2:]:
            nxt = run(x, max_it)
            np.asarray(pend)
            pend = nxt
        np.asarray(pend)
        return (time.time() - t0) / iters

    t4, t24 = timed(4), timed(24)
    slope_early = (t24 - t4) / 20
    _emit({"metric": "icp_per_iteration_ms_slope_early",
           "value": round(slope_early * 1e3, 3), "unit": "ms",
           "note": "budgets 4->24 (20-iteration signal clears the ~10 ms "
                   "tunnel run-to-run variance; most lanes still "
                   "pre-fixed-point at 24)"})

    # --- traced 12-iteration call: kernel vs tail, device-true ---
    def icp_thunk(k):
        d = src_dn + jnp.asarray(
            host.standard_normal(src_dn.shape).astype(np.float32) * 1e-5)
        np.asarray(d)
        np.asarray(run(d, 12))

    np.asarray(run(src_dn, 12))  # compile outside the trace
    busy_ms, agg = _trace_device_ops(icp_thunk)
    k_us = sum(v for n, v in agg.items()
               if n.startswith("nearest_neighbor_bounded"))
    w_us = max((v for n, v in agg.items() if n.startswith("while")),
               default=0.0)
    n_calls = 2
    per_it_kernel = k_us / 1e3 / n_calls / 12
    per_it_while = w_us / 1e3 / n_calls / 12
    _emit({"metric": "icp_traced_ms_per_iteration",
           "value": round(per_it_while, 3), "unit": "ms",
           "kernel_ms": round(per_it_kernel, 3),
           "xla_tail_ms": round(per_it_while - per_it_kernel, 3),
           "note": "12-iteration traced call; tail = Kabsch sums + 3x3 SVD "
                   "+ fitness/rmse + transform"})

    # --- live-fraction + analytic kernel model ---
    from scream_tpu.ops.nn_pallas import FAR, _box_gap_sq, _tile_boxes
    srt_s, srt_sm = jax.vmap(_spatial_sort)(src_dn, sm, init[:, 0, :3])
    srt_t, srt_tm = jax.vmap(lambda p, m: _spatial_sort(p, m))(tgt_dn, tm)
    src_t0 = jax.vmap(lambda p, T: p @ T[:3, :3].T + T[:3, 3])(srt_s, init)
    dst_f = jnp.where(srt_tm[..., None], srt_t, FAR)
    f_lo, f_hi = jax.vmap(lambda p: _tile_boxes(p, 128))(src_t0)
    d_lo, d_hi = jax.vmap(lambda p: _tile_boxes(p, 256, far_sentinel=FAR))(dst_f)
    gap = jax.vmap(_box_gap_sq)(f_lo, f_hi, d_lo, d_hi)
    live = float(jnp.mean((gap <= thresh * thresh).astype(jnp.float32)))
    n_sub = BATCH * (N_POINTS // 128) * (N_POINTS // 256)
    live_n = live * n_sub
    per_live_us = k_us / 1e3 / n_calls / 12 / max(live_n, 1) * 1e3
    VREG_OPS_PER_SUBSLAB = 330  # d2 + min + argmin + one-hot + accumulate
    _emit({"metric": "icp_kernel_work_model",
           "live_subslab_frac": round(live, 4),
           "live_subslabs_per_iter": int(live_n),
           "measured_us_per_live_subslab": round(per_live_us, 3),
           "modeled_vreg_ops_per_subslab": VREG_OPS_PER_SUBSLAB,
           "implied_vreg_ops_per_us": round(
               VREG_OPS_PER_SUBSLAB / max(per_live_us, 1e-9), 1),
           "note": "kernel cost ~ live_subslabs x per-subslab VPU work; "
                   "init-frame sort sets the live fraction "
                   "(geometry/icp._spatial_sort)"})

    # --- device-true forward / solve / ICP split of register_batch ---
    model = PointTransformer(ModelConfig(dtype=DTYPE, norm_dtype=NORM_DTYPE))
    params = model.init(jax.random.PRNGKey(0), b0["src"], b0["tgt"],
                        b0["src_mask"], b0["tgt_mask"],
                        jnp.swapaxes(b0["trans"], -1, -2))["params"]

    def apply_fn(p, src, tgt, smk, tmk, ctr):
        return model.apply({"params": p}, src, tgt, smk, tmk, ctr)

    fwd = jax.jit(lambda bb: apply_fn(params, bb["src"], bb["tgt"],
                                      bb["src_mask"], bb["tgt_mask"],
                                      jnp.swapaxes(bb["trans"], -1, -2)))

    def perturbed(k):
        bb = dict(b0)
        bb["src"] = b0["src"] + jnp.asarray(
            host.standard_normal(b0["src"].shape).astype(np.float32) * 1e-4)
        np.asarray(bb["src"])
        return bb

    stages = {
        "fwd": lambda bb: fwd(bb),
        "solve": lambda bb: register_batch(apply_fn, params, bb,
                                           dis_thresh=0.1, corr="tgt",
                                           use_icp=False).transform,
        "full": lambda bb: register_batch(apply_fn, params, bb,
                                          dis_thresh=0.1, corr="tgt",
                                          icp_thresh=0.1,
                                          icp_max_iter=ICP_ITERS).transform,
    }
    dev_ms = {}
    for name, f in stages.items():
        np.asarray(f(perturbed(0)))  # compile outside the trace

        def thunk(k, f=f):
            np.asarray(f(perturbed(k + 1)))

        dev_ms[name], _ = _trace_device_ops(thunk)
    solve_ms = max(dev_ms["solve"] - dev_ms["fwd"], 0.0)
    icp_ms = max(dev_ms["full"] - dev_ms["solve"], 0.0)
    flops = _forward_flops(N_POINTS, N_POINTS) * BATCH
    path_mfu = flops / (dev_ms["full"] / 1e3) / V5E_PEAK_BF16_FLOPS
    _emit({"metric": "breakdown_device_true_ms_per_batch",
           "forward": round(dev_ms["fwd"], 2),
           "solve": round(solve_ms, 2),
           "icp": round(icp_ms, 2),
           "total": round(dev_ms["full"], 2),
           "note": "interval-union of the device XLA-Ops track per traced "
                   "call (transfers/host excluded); solve = NN + Kabsch "
                   "+ metrics"})
    _emit({"metric": "register_batch_path_mfu_pct",
           "value": round(path_mfu * 100.0, 2), "unit": "%",
           "note": "forward analytic FLOPs / whole-path device time "
                   "(forward+solve+ICP) vs v5e bf16 peak — the honest "
                   "end-to-end figure; ICP/solve add no MXU FLOPs"})


def breakdown():
    """Step breakdown at the headline operating point: forward / pose solve /
    ICP wall-clock shares per batch, plus an analytic-FLOPs MFU figure for
    the forward pass (the ICP NN search is VPU-bound, not MXU FLOPs — the
    breakdown is what shows the path is ICP-dominated)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scream_tpu.config import ModelConfig
    from scream_tpu.data import PairLoader, SyntheticPairDataset
    from scream_tpu.models.point_transformer import PointTransformer
    from scream_tpu.pipeline.register import register_batch

    model = PointTransformer(ModelConfig(dtype=DTYPE, norm_dtype=NORM_DTYPE))
    ds = SyntheticPairDataset(length=BATCH, n_src=N_POINTS - 256,
                              n_tgt=N_POINTS - 64, seed=3)
    b0 = {k: jnp.asarray(v) for k, v in next(iter(PairLoader(
        ds, batch_size=BATCH, src_capacity=N_POINTS,
        tgt_capacity=N_POINTS))).items()}
    params = model.init(jax.random.PRNGKey(0), b0["src"], b0["tgt"],
                        b0["src_mask"], b0["tgt_mask"],
                        jnp.swapaxes(b0["trans"], -1, -2))["params"]
    host = np.random.default_rng(7)

    def apply_fn(p, src, tgt, sm, tm, c):
        return model.apply({"params": p}, src, tgt, sm, tm, c)

    fwd = jax.jit(lambda b: apply_fn(params, b["src"], b["tgt"], b["src_mask"],
                                     b["tgt_mask"],
                                     jnp.swapaxes(b["trans"], -1, -2)))

    def perturbed(k):
        b = dict(b0)
        b["src"] = b0["src"] + jnp.asarray(
            host.standard_normal(b0["src"].shape).astype(np.float32) * 1e-4)
        np.asarray(b["src"])
        return b

    t_fwd = _timed(fwd, perturbed)
    t_solve = _timed(
        lambda b: register_batch(apply_fn, params, b, dis_thresh=0.1,
                                 corr="tgt", use_icp=False).transform,
        perturbed,
    )
    t_full = _timed(
        lambda b: register_batch(apply_fn, params, b, dis_thresh=0.1,
                                 corr="tgt", icp_thresh=0.1,
                                 icp_max_iter=ICP_ITERS).transform,
        perturbed,
    )

    # Device-true forward time: K model applications CHAINED inside one jit
    # (each step's input derives from the previous output, so every dispatch
    # is distinct work; one scalar fetch at the end). The per-call metrics
    # below (`_timed`) include the remote tunnel's ~30-60 ms sync round trip
    # per call, which floors them regardless of device speed — this metric
    # is the device compute alone and is what the MFU figure uses.
    K_CHAIN = 8

    @jax.jit
    def fwd_chain(src0):
        def body(c, _):
            pred = apply_fn(params, c, b0["tgt"], b0["src_mask"],
                            b0["tgt_mask"],
                            jnp.swapaxes(b0["trans"], -1, -2))
            return jnp.clip(pred, -2.0, 2.0), jnp.float32(0)
        out, _ = jax.lax.scan(body, src0, jnp.arange(K_CHAIN))
        return jnp.sum(out)

    float(np.asarray(fwd_chain(b0["src"])))
    t0 = time.time()
    reps = 4
    for r in range(reps):
        float(np.asarray(fwd_chain(b0["src"] * (1.0 + r * 1e-4))))
    t_fwd_dev = (time.time() - t0) / reps / K_CHAIN

    flops = _forward_flops(N_POINTS, N_POINTS)
    mfu = flops * BATCH / t_fwd_dev / V5E_PEAK_BF16_FLOPS
    _emit({"metric": "breakdown_forward_device_ms_per_batch",
           "value": round(t_fwd_dev * 1e3, 2), "unit": "ms",
           "batch": BATCH, "n_points": N_POINTS,
           "note": f"{K_CHAIN}-forward scan chain, single fetch — device "
                   "compute only"})
    _emit({"metric": "breakdown_forward_ms_per_batch",
           "value": round(t_fwd * 1e3, 2), "unit": "ms",
           "batch": BATCH, "n_points": N_POINTS,
           "note": "lag-1 pipelined per-call; includes the remote tunnel's "
                   "per-call sync overhead"})
    # The old wall-clock-subtraction "solve" row is gone: the ~3 ms solve
    # hides under per-call RPC jitter and the row read a meaningless 0.0
    # next to the honest trace-based number. Use
    # breakdown_device_true_ms_per_batch.solve (--icp-roofline).
    _emit({"metric": "breakdown_icp_ms_per_batch",
           "value": round(max(t_full - t_solve, 0.0) * 1e3, 2), "unit": "ms",
           "note": f"{ICP_ITERS} NN+Kabsch iterations"})
    _emit({"metric": "breakdown_total_ms_per_batch",
           "value": round(t_full * 1e3, 2), "unit": "ms"})
    _emit({"metric": "forward_mfu_pct", "value": round(mfu * 100.0, 2),
           "unit": "%", "note": "analytic FLOPs / device-chained forward "
                                "time vs 197 TF/s v5e bf16 peak"})

    # Lever probe: bf16 LayerNorms (the forward's largest non-matmul HBM
    # consumer; models/attention.py norm_dtype). Same params tree — only the
    # norm compute dtype changes — so this quantifies the memory-bound share
    # the norms are responsible for. Skipped on the forced-f32 smoke path.
    if DTYPE == "bfloat16" and NORM_DTYPE != "bfloat16":
        model_bf = PointTransformer(ModelConfig(dtype=DTYPE,
                                                norm_dtype="bfloat16"))
        fwd_bf = jax.jit(lambda b: model_bf.apply(
            {"params": params}, b["src"], b["tgt"], b["src_mask"],
            b["tgt_mask"], jnp.swapaxes(b["trans"], -1, -2)))
        t_fwd_bf = _timed(fwd_bf, perturbed)
        mfu_bf = flops * BATCH / t_fwd_bf / V5E_PEAK_BF16_FLOPS
        _emit({"metric": "breakdown_forward_bf16norm_ms_per_batch",
               "value": round(t_fwd_bf * 1e3, 2), "unit": "ms",
               "mfu_pct": round(mfu_bf * 100.0, 2),
               "note": "norm_dtype=bfloat16 vs the fp32-norm default above"})


_FLUSHED = [0]


def _flush(path):
    """Persist everything measured so far — called after every stage AND from
    the finally block, so a mid-run failure (tunnel drop, OOM) never discards
    metrics that already cost TPU-minutes to measure."""
    import platform

    import jax

    if _FLUSHED[0] == len(RESULTS):
        return
    _FLUSHED[0] = len(RESULTS)

    payload = {
        "backend": jax.default_backend(),
        "batch": BATCH,
        "n_points": N_POINTS,
        "icp_iters": ICP_ITERS,
        "dtype": DTYPE,
        "host": platform.machine(),
        "results": RESULTS,
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"# wrote {len(RESULTS)} metrics to {path}", file=sys.stderr)


def _probe_backend(timeout_s=90):
    """Fail fast with ONE parseable JSON line when the TPU backend is down.

    The remote-TPU tunnel has two failure modes: backend init raises
    RuntimeError('Unable to initialize backend ...UNAVAILABLE'), or —
    worse — `jax.devices()` blocks forever in a retry loop. Probing in a
    subprocess with a hard timeout catches both, so a driver run during an
    outage records a structured error instead of a traceback (or a hang).
    """
    import subprocess

    import jax

    # Forced-CPU runs (the test suite sets the jax *config*, CLAUDE.md) have
    # nothing to probe — the subprocess would wrongly touch the TPU tunnel.
    plats = getattr(jax.config, "jax_platforms", None)
    if plats and plats.split(",")[0] == "cpu":
        return
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if r.returncode == 0 and "ok" in r.stdout:
            return
        detail = (r.stderr or r.stdout).strip().splitlines()
        detail = detail[-1] if detail else f"rc={r.returncode}"
    except subprocess.TimeoutExpired:
        detail = f"backend init did not respond within {timeout_s}s"
    print(json.dumps({
        "error": "backend_unavailable",
        "metric": "3dmatch_registration_pairs_per_sec_per_chip",
        "value": None,
        "unit": "pairs/sec",
        "detail": detail,
    }))
    sys.exit(3)


if __name__ == "__main__":
    # Validate flags BEFORE the multi-minute TPU runs: a forgotten --write
    # operand or a misspelled flag must not be discovered (or silently
    # ignored) after the suite has already been measured.
    write_path = None
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--write":
            if i + 1 >= len(args) or args[i + 1].startswith("--"):
                sys.stderr.write("bench.py: --write requires a file path operand\n")
                sys.exit(2)
            write_path = args[i + 1]
            i += 2
        elif a == "--trace":
            if i + 1 >= len(args) or args[i + 1].startswith("--"):
                sys.stderr.write("bench.py: --trace requires a directory operand\n")
                sys.exit(2)
            TRACE_DIR = args[i + 1]
            i += 2
        elif a in ("--suite", "--breakdown", "--roofline", "--icp-roofline"):
            i += 1
        else:
            sys.stderr.write(
                f"bench.py: unknown argument {a!r} "
                "(known: --suite --breakdown --roofline --icp-roofline "
                "--write PATH --trace DIR)\n")
            sys.exit(2)
    _probe_backend()
    _start_watchdog(int(os.environ.get("BENCH_WATCHDOG_S", 1200)))
    # BENCH_SUITE_ONLY (isolated suite-class re-runs, see suite()) also skips
    # the headline main() — the driver never sets it.
    if os.environ.get("BENCH_SUITE_ONLY") and "--suite" not in args:
        # Without --suite the env var would be silently ignored: the
        # multi-minute headline main() runs and zero suite metrics appear.
        sys.stderr.write(
            "bench.py: BENCH_SUITE_ONLY is set but --suite is absent — "
            "pass --suite to run the selected suite classes\n")
        sys.exit(2)
    suite_only = bool(os.environ.get("BENCH_SUITE_ONLY")) and "--suite" in args
    try:
        if not suite_only:
            main()
            if write_path is not None:
                _flush(write_path)
        if "--suite" in args:
            suite()
            if write_path is not None:
                _flush(write_path)
        if "--breakdown" in args:
            breakdown()
            if write_path is not None:
                _flush(write_path)
        if "--roofline" in args:
            roofline()
        if "--icp-roofline" in args:
            icp_roofline()
            if write_path is not None:
                _flush(write_path)
    finally:
        # Disarm the watchdog: its os._exit(4) must only fire while a bench
        # is actually in flight. In-process runs (the smoke tests execute
        # this file via runpy inside pytest) would otherwise leave a daemon
        # thread that hard-kills the HOST process ~budget_s later — which
        # took out full test-suite runs on hosts slow enough that the suite
        # outlived the 20-min budget.
        _PROGRESS[0] = None
        if write_path is not None and RESULTS:
            _flush(write_path)
