"""Benchmark: SG-MCMC sampling throughput at 128^3 (experiment-1 scale).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N,
     "vi_iters_per_sec": N, ...}

The default (canonical 128^3) emission carries BOTH phases — the MCMC
headline and the VI iteration rate — mirroring the reference's two speed
tests (trainer/trainer.py:276-289 and :467-476); the VI chunk is
budget-gated and degrades to a "vi_error" tag rather than costing the
headline.

* value        — chains x transitions / sec of the full SGLD transition on
                 the attached accelerator (TPU under axon), 2 chains, 128^3,
                 GMM K=4, Sobolev s=3, uniform noise, virtual decimation,
                 learnable log-normal regulariser — the reference's
                 experiment-1 configuration and its headline runtime metric
                 (trainer/trainer.py:467-476 "MCMC sampling speed").
* vs_baseline  — speedup over the torch-CPU transition measured on this
                 machine (scripts/torch_baseline.py: median over >=20 timed
                 transitions after 3 warm-ups, rejected if IQR/median >
                 0.2), cached in .bench_baseline.json — refresh with
                 ``--refresh-baseline`` (the reference publishes no
                 numbers — BASELINE.md).
* spread_rel   — (max-min)/mean across the repeated timed TPU chunks;
                 baseline_* fields carry the torch side's statistics.

``--trace DIR`` additionally captures a ``jax.profiler`` trace of one timed
chunk (per-op timings, viewable in TensorBoard/Perfetto or via
scripts/trace_summary.py) — captured AFTER the JSON line is printed.

Robustness under a bounded driver budget (VERDICT r3 #1 — BENCH_r03 was an
rc=124 with zero output): every stage is stamped to stderr with elapsed
time, a 30 s heartbeat repeats the current stage, compiled executables
persist across invocations in ``.jax_cache/`` (enabled programmatically —
no env var needed), the JSON line is flushed the moment the timed chunks
finish, and ``--budget SECONDS`` (default 1500) degrades the repeat count
down to one chunk rather than produce nothing.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

DIMS = (128, 128, 128)  # override with --dims N (cube)
CHAINS = 2
TIMED_STEPS = 20
VI_TIMED_STEPS = 20
TIMED_REPEATS = 3

REPO = Path(__file__).resolve().parent
BASELINE_CACHE = REPO / ".bench_baseline.json"
VI_CACHE = REPO / ".bench_vi_cache.json"


def _git_head() -> str:
    """Revision key for the VI sidecar: tree hashes of the source that can
    change the measurement (doc-only / PROGRESS commits must not stale it)."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD:ir_sgmcmc_tpu", "HEAD:bench.py"],
            cwd=str(REPO), capture_output=True,
            text=True, timeout=10).stdout.strip()
    except Exception:
        return ""

# ---------------------------------------------------------------------------
# Stage progress + watchdog (VERDICT r3 #1: BENCH_r03 timed out with ZERO
# output — a bounded driver budget must always leave a diagnosis).  Every
# stage is stamped to stderr; a daemon heartbeat repeats the current stage
# every 30 s so an rc=124 tail shows exactly where time went.
# ---------------------------------------------------------------------------
_T0 = time.monotonic()
_STAGE = ["startup"]
_DEADLINE = [float("inf")]  # monotonic deadline, set from --budget


def _stage(msg: str) -> None:
    _STAGE[0] = msg
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _heartbeat() -> None:
    while True:
        time.sleep(30)
        print(f"[bench +{time.monotonic() - _T0:7.1f}s] ... still in: "
              f"{_STAGE[0]}", file=sys.stderr, flush=True)


def _remaining() -> float:
    return _DEADLINE[0] - time.monotonic()


def _enable_compilation_cache() -> None:
    """Persist compiled executables across invocations in .jax_cache/.

    BENCH_r03 timed out because every driver run recompiled the fully
    unrolled 20-transition chunk from scratch (only tests/conftest.py set
    the cache env var).  ``jax.config.update`` works even though the axon
    sitecustomize imports jax before this file runs.
    """
    import jax

    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax: size gate not configurable; time gate suffices


def measure_torch_baseline(refresh: bool = False) -> dict:
    if BASELINE_CACHE.exists() and not refresh:
        cached = json.loads(BASELINE_CACHE.read_text())
        # the cache is stamped with its protocol: only a median anchor over
        # >=20 timed transitions is acceptable (VERDICT r2 #4) — anything
        # older re-measures
        if ("samples_per_sec" in cached and "median_s" in cached
                and cached.get("timed_transitions", 0) >= 20):
            _stage("torch anchor: cache hit (.bench_baseline.json)")
            return cached
    if _remaining() < 600:
        raise RuntimeError(
            "torch-CPU anchor not cached and --budget leaves <600 s; "
            "run `python bench.py --refresh-baseline` unbounded first")
    _stage("torch anchor: measuring (subprocess, >=20 transitions)")
    # run in a subprocess with jax plugins disabled so torch-CPU timing is clean
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import json; from scripts.torch_baseline import run_baseline; "
         "print(json.dumps(run_baseline()))"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=7200,
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("torch baseline failed")
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    if stats["spread_rel"] > 0.2:
        raise RuntimeError(
            f"torch-CPU anchor too noisy: IQR/median = {stats['spread_rel']:.2f} "
            f"> 0.20 over {stats['timed_transitions']} transitions — machine "
            f"load is skewing the baseline; re-run when quiet")
    stats["dims"] = list(DIMS)
    BASELINE_CACHE.write_text(json.dumps(stats))
    return stats


def _make_bundle_and_pair(noise_scheme="pre", dims=None, model="svf",
                          cps=2, **svf_kwargs):
    """Experiment-1 model + synthetic 128^3 pair (shared by both phases).

    ``svf_kwargs`` forward to ``SVF3D`` (``unroll``, ``taylor_threshold``,
    ``use_gather``) so integrator perf variants can be timed from the CLI.
    ``noise_scheme``: 'post' (default — reference-exact transformation
    noise, single-resample image path via the block-gather warp) or 'pre'
    (cascade warp: faster, measurably lower registration quality).
    """
    import jax.numpy as jnp

    from ir_sgmcmc_tpu.data import sphere_pair
    from ir_sgmcmc_tpu.engine.bundle import ModelBundle
    from ir_sgmcmc_tpu.models import (
        GMM,
        DirichletPrior,
        LogEnergyExpGammaPrior,
        LogScaleNormalPrior,
        SVF3D,
    )
    from ir_sgmcmc_tpu.models.reg_loss import RegLossLogNormal
    from ir_sgmcmc_tpu.models.transformation import SVFFD3D

    dims = DIMS if dims is None else dims
    if model == "svffd":
        # experiment-5's control-grid model (B-spline-spread velocity, then
        # the same integrator) — q(v)/chain state live on the control grid
        transformation = SVFFD3D(dims, cps=[int(cps)] * 3, no_steps=12,
                                 **svf_kwargs)
    else:
        transformation = SVF3D(dims, no_steps=12, **svf_kwargs)
    dof = 3.0 * dims[0] * dims[1] * dims[2]
    bundle = ModelBundle(
        dims=dims,
        gmm=GMM(4, 1),
        scale_prior=LogScaleNormalPrior(0.0, 2.3),
        proportion_prior=DirichletPrior(4, 0.5),
        reg_loss=RegLossLogNormal(w_reg=1.4, dims=dims, learnable=True),
        reg_loc_prior=LogEnergyExpGammaPrior(w_reg=1.4, dof=dof),
        reg_scale_prior=LogScaleNormalPrior(loc=2.8, scale=5.0),
        transformation=transformation,
        sobolev_s=3,
        sobolev_lambda=0.5,
        uniform_noise_alpha=0.1,
        noise_scheme=noise_scheme,
        virtual_decimation=True,
    )
    fixed, moving = sphere_pair(dims, offset=(0.0, 0.0, 4.0))
    fixed = {k: jnp.asarray(v) for k, v in fixed.items()}
    moving = {k: jnp.asarray(v) for k, v in moving.items()}
    return bundle, fixed, moving


def measure_tpu(trace_dir: str | None = None, noise_scheme="pre",
                anchored=False, anchor_radius=2, dims=None, chains=None,
                model="svf", cps=2, **svf_kwargs) -> dict:
    import jax
    import jax.numpy as jnp

    from ir_sgmcmc_tpu.engine import init_chains, make_mcmc_chunk
    from ir_sgmcmc_tpu.optim import adam_decay

    chains = CHAINS if chains is None else chains
    _stage(f"device init: {jax.devices()[0].platform} "
           f"({len(jax.devices())} device(s))")
    bundle, fixed, moving = _make_bundle_and_pair(noise_scheme, dims=dims,
                                                  model=model, cps=cps,
                                                  **svf_kwargs)

    opt_gmm = adam_decay(0.2, 0.001)
    opt_reg = adam_decay({"loc": 0.01, "log_scale": 0.01}, 0.001)

    state = init_chains(
        bundle, jax.random.PRNGKey(0), no_chains=chains, mode="noise",
        q_v=None, gmm=bundle.gmm.init_params(), reg=bundle.reg_loss.init_params(),
        opt_gmm=opt_gmm, opt_reg=opt_reg,
    )

    def build_timed():
        return make_mcmc_chunk(bundle, opt_gmm, opt_reg, 1e-5, fixed, moving,
                               chunk=TIMED_STEPS, burn_in=0, thin=1,
                               anchored=anchored, anchor_radius=anchor_radius)

    timed = build_timed()

    # block_until_ready does not actually block under the axon tunnel;
    # force host syncs with float(·).  Warm at the REAL chunk length so the
    # clock never includes a retrace/compile.
    _stage(f"compile+warm: {TIMED_STEPS}-transition chunk "
           f"(fully-unrolled scans; cold compile is the slow part — "
           f"persistent cache at .jax_cache/)")
    t0 = time.perf_counter()
    state0 = state
    try:
        state, m = timed(state)
        _ = float(jnp.sum(state.v))
        pallas_fallback = False
    except Exception as e:  # noqa: BLE001 — same retry gate as the Trainer
        # VERDICT r4 weak #1: the round-4 256³ Mosaic regression crashed
        # bench.py outright while the Trainer degraded to pure XLA
        # (trainer._try_pallas_fallback).  Mirror that here: a kernel
        # compile/lowering failure disables the Pallas kernels for this
        # process and the measurement proceeds (slower, honestly tagged
        # "pallas_fallback": true in the JSON line).
        from ir_sgmcmc_tpu.ops import resample
        from ir_sgmcmc_tpu.trainer import _is_pallas_failure

        if not _is_pallas_failure(e):
            raise
        _stage(f"Pallas kernel failure ({type(e).__name__}) — falling back "
               f"to the pure-XLA path (run scripts/tpu_selftest.py to "
               f"diagnose); re-compiling")
        resample.set_pallas_mode(False)
        timed = build_timed()
        t0 = time.perf_counter()
        state, m = timed(state0)
        _ = float(jnp.sum(state.v))
        pallas_fallback = True
    warm_s = time.perf_counter() - t0
    _stage(f"compile+warm done in {warm_s:.1f}s")

    times = []
    for i in range(TIMED_REPEATS):
        t0 = time.perf_counter()
        state, m = timed(state)
        _ = float(jnp.sum(state.v))
        times.append(time.perf_counter() - t0)
        _stage(f"timed chunk {i + 1}/{TIMED_REPEATS}: {times[-1]:.3f}s")
        # degrade under a driver budget: one chunk is a valid measurement
        if times and _remaining() < 2.5 * times[-1]:
            _stage(f"budget nearly exhausted ({_remaining():.0f}s left) — "
                   f"stopping after {len(times)} chunk(s)")
            break

    mean = sum(times) / len(times)
    return {
        "samples_per_sec": chains * TIMED_STEPS / mean,
        "per_chunk_s": [round(t, 3) for t in times],
        "spread_rel": (max(times) - min(times)) / mean,
        "warm_s": round(warm_s, 1),
        "pallas_fallback": pallas_fallback,
        "_trace": (lambda: _capture_trace(trace_dir, timed, state, jnp))
        if trace_dir else None,
    }


def _capture_trace(trace_dir, timed, state, jnp):
    import jax

    _stage(f"profiler trace -> {trace_dir}")
    with jax.profiler.trace(trace_dir):
        state, m = timed(state)
        _ = float(jnp.sum(state.v))


def measure_vi(trace_dir: str | None = None, noise_scheme="pre", dims=None,
               model="svf", cps=2, **svf_kwargs) -> dict:
    """Time the VI iteration (VERDICT r2 weak #7 — bench.py timed MCMC only).

    One VI iteration = 2 antithetic forward+backward passes through the full
    op-chain + 3 optimizer updates (reference trainer/trainer.py:130-170), so
    its per-iteration cost should sit at ~2-3x one SGLD transition.
    """
    import jax
    import jax.numpy as jnp

    from ir_sgmcmc_tpu.engine.vi import VIState, gmm_warmup, make_vi_chunk, make_vi_step
    from ir_sgmcmc_tpu.optim import adam_decay

    bundle, fixed, moving = _make_bundle_and_pair(noise_scheme, dims=dims,
                                                  model=model, cps=cps,
                                                  **svf_kwargs)

    # experiment-1 optimizer groups (configs/experiment1/config.json)
    opt_q_v = adam_decay({"mu": 0.01, "log_var": 0.01, "u": 0.01}, 0.001)
    opt_gmm = adam_decay({"log_std": 0.2, "logits": 0.2}, 0.001)
    opt_reg = adam_decay({"loc": 0.01, "log_scale": 0.01}, 0.001)

    shape = (3,) + bundle.field_dims
    q_v0 = {
        "mu": jnp.zeros(shape, jnp.float32),
        "log_var": jnp.full(shape, 2.0 * float(jnp.log(0.5)), jnp.float32),
        "u": jnp.full(shape, 0.1, jnp.float32),
    }
    state = VIState(
        q_v=q_v0, gmm=bundle.gmm.init_params(), reg=bundle.reg_loss.init_params(),
        opt_q_v=opt_q_v.init(q_v0), opt_gmm=opt_gmm.init(bundle.gmm.init_params()),
        opt_reg=opt_reg.init(bundle.reg_loss.init_params()),
        key=jax.random.PRNGKey(0), step=jnp.zeros((), jnp.int32),
    )
    state = gmm_warmup(bundle, opt_gmm, state, fixed, moving)

    # large pairs enter as jit parameters (see engine.mcmc/vi notes);
    # remat (sequential antithetic chains) once a dense field exceeds
    # 100 MB — same auto rule as trainer.vi_remat
    remat = 3 * 4 * math.prod(bundle.dims) >= 100 * 1024 * 1024
    if sum(x.size * x.dtype.itemsize for d in (fixed, moving)
           for x in jax.tree.leaves(d)) > 32 * 1024 * 1024:
        timed = make_vi_chunk(
            None, VI_TIMED_STEPS,
            step_builder=lambda f, m: make_vi_step(
                bundle, opt_q_v, opt_gmm, opt_reg, f, m, remat=remat),
            images=(fixed, moving))
    else:
        step_fn = make_vi_step(bundle, opt_q_v, opt_gmm, opt_reg, fixed, moving,
                               remat=remat)
        timed = make_vi_chunk(step_fn, VI_TIMED_STEPS)

    _stage(f"VI compile+warm: {VI_TIMED_STEPS}-iteration chunk")
    t0 = time.perf_counter()
    state, m = timed(state)          # warm at the real chunk length
    _ = float(jnp.sum(state.q_v["mu"]))
    warm_s = time.perf_counter() - t0
    _stage(f"VI compile+warm done in {warm_s:.1f}s")

    times = []
    for i in range(TIMED_REPEATS):
        t0 = time.perf_counter()
        state, m = timed(state)
        _ = float(jnp.sum(state.q_v["mu"]))
        times.append(time.perf_counter() - t0)
        _stage(f"VI timed chunk {i + 1}/{TIMED_REPEATS}: {times[-1]:.3f}s")
        if times and _remaining() < 2.5 * times[-1]:
            _stage(f"budget nearly exhausted ({_remaining():.0f}s left) — "
                   f"stopping after {len(times)} chunk(s)")
            break

    def _vi_trace():
        _stage(f"profiler trace -> {trace_dir}")
        with jax.profiler.trace(trace_dir):
            s2, _m = timed(state)
            _ = float(jnp.sum(s2.q_v["mu"]))

    mean = sum(times) / len(times)
    return {
        "iters_per_sec": VI_TIMED_STEPS / mean,
        "per_chunk_s": [round(t, 3) for t in times],
        "spread_rel": (max(times) - min(times)) / mean,
        "warm_s": round(warm_s, 1),
        "_trace": _vi_trace if trace_dir else None,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description="ir-sgmcmc-tpu benchmark")
    parser.add_argument("--refresh-baseline", action="store_true",
                        help="re-measure the torch-CPU anchor (ignore cache)")
    parser.add_argument("--trace", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of one timed chunk")
    parser.add_argument("--phase", choices=["mcmc", "vi"], default="mcmc",
                        help="which phase's hot loop to time (default: the "
                             "headline SG-MCMC transition; 'vi' times the "
                             "full VI iteration instead)")
    parser.add_argument("--unroll", default=None, metavar="N",
                        help="integration-scan unroll factor ('true' = fully; "
                             "removes reverse-mode residual-stacking traffic)")
    parser.add_argument("--taylor-threshold", type=float, default=None)
    parser.add_argument("--taylor-compositions",
                        choices=["on", "off", "split"], default=None,
                        help="composition-phase step: 'on' = pure Taylor "
                             "stencils (unstable end-to-end — kept for the "
                             "record), 'split' = dimensionally-split "
                             "per-axis lerps (stable, stencil-speed), "
                             "'off' = radius-1 warp kernels; default: the "
                             "SVF3D auto rule")
    parser.add_argument("--use-gather", action="store_true")
    parser.add_argument("--compute-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="squaring-phase compute dtype (SVF3D "
                             "compute_dtype; default: bfloat16 on TPU, "
                             "f32 elsewhere)")
    parser.add_argument("--noise-scheme", choices=["pre", "post"],
                        default="post",
                        help="'post' = reference-exact transformation noise "
                             "(single-warp image path; anchored residual "
                             "warping in the MCMC loop unless --no-anchor)")
    parser.add_argument("--anchor", action="store_true",
                        help="with --noise-scheme post: EXPERIMENTAL anchored "
                             "residual warping (known quality regression - "
                             "BASELINE.md round 3)")
    parser.add_argument("--anchor-radius", type=int, default=2)
    parser.add_argument("--chains", type=int, default=None,
                        help="chain count (default 2; 256^3 with 2 chains "
                             "exceeds one chip's 16 GB HBM - use 1, or "
                             "shard chains over a slice)")
    parser.add_argument("--model", choices=["svf", "svffd"], default="svf",
                        help="transformation model (svffd = experiment-5's "
                             "control-grid model; non-canonical metric, no "
                             "torch anchor)")
    parser.add_argument("--cps", type=int, default=2,
                        help="SVFFD control point spacing (voxels)")
    parser.add_argument("--dims", type=int, default=None, metavar="N",
                        help="cube edge length (default 128); the torch-CPU "
                             "anchor and vs_baseline are only reported at "
                             "the canonical 128")
    parser.add_argument("--budget", type=float,
                        default=float(os.environ.get("BENCH_BUDGET_S", 1500)),
                        metavar="SECONDS",
                        help="soft wall-clock budget (default 1500 or "
                             "$BENCH_BUDGET_S): timed repeats degrade to 1 "
                             "and the JSON line is emitted the moment a "
                             "valid measurement exists")
    args = parser.parse_args(argv)

    _DEADLINE[0] = _T0 + args.budget
    threading.Thread(target=_heartbeat, daemon=True).start()
    _stage(f"bench start (budget {args.budget:.0f}s, phase={args.phase})")
    _enable_compilation_cache()

    svf_kwargs = {}
    if args.unroll is not None:
        u = args.unroll.lower()
        svf_kwargs["unroll"] = (u == "true") if u in ("true", "false") \
            else int(args.unroll)
    if args.taylor_threshold is not None:
        svf_kwargs["taylor_threshold"] = args.taylor_threshold
    if args.taylor_compositions is not None:
        svf_kwargs["taylor_compositions"] = {
            "on": True, "off": False, "split": "split",
        }[args.taylor_compositions]
    if args.use_gather:
        svf_kwargs["use_gather"] = True
    if args.compute_dtype is not None:
        svf_kwargs["compute_dtype"] = args.compute_dtype

    if args.phase == "vi":
        vi_dims = None if args.dims is None else (args.dims,) * 3
        vi = measure_vi(trace_dir=args.trace, noise_scheme=args.noise_scheme,
                        dims=vi_dims, model=args.model, cps=args.cps,
                        **svf_kwargs)
        trace = vi.pop("_trace", None)
        if vi_dims in (None, DIMS) and args.model == "svf":
            VI_CACHE.write_text(json.dumps({
                "git_head": _git_head(),
                "vi_iters_per_sec": round(vi["iters_per_sec"], 3),
                "vi_spread_rel": round(vi["spread_rel"], 4),
            }))
        mtag = "" if args.model == "svf" else f"_svffd{args.cps}"
        print(json.dumps({
            "metric": f"vi_iters_per_sec_{args.dims or 128}cubed{mtag}",
            "value": round(vi["iters_per_sec"], 3),
            "unit": "iters/sec",
            "spread_rel": round(vi["spread_rel"], 4),
            "timed_chunks_s": vi["per_chunk_s"],
            "compile_warm_s": vi["warm_s"],
        }), flush=True)
        if trace:
            trace()
        return

    dims = None if args.dims is None else (args.dims,) * 3
    if (dims is not None and dims != DIMS) or args.model != "svf":
        # non-canonical scale: no torch anchor (a single 256^3 torch-CPU
        # transition is ~2.5 minutes; the 20-transition protocol is
        # impractical) — report raw device throughput
        tpu = measure_tpu(trace_dir=args.trace,
                          noise_scheme=args.noise_scheme,
                          anchored=args.anchor,
                          anchor_radius=args.anchor_radius, dims=dims,
                          chains=args.chains, model=args.model,
                          cps=args.cps, **svf_kwargs)
        trace = tpu.pop("_trace", None)
        nch = CHAINS if args.chains is None else args.chains
        mtag = "" if args.model == "svf" else f"_svffd{args.cps}"
        print(json.dumps({
            "metric": f"sgmcmc_samples_per_sec_{args.dims or 128}cubed"
                      f"_{nch}chains{mtag}",
            "value": round(tpu["samples_per_sec"], 3),
            "unit": "samples/sec",
            "noise_scheme": args.noise_scheme,
            "spread_rel": round(tpu["spread_rel"], 4),
            "timed_chunks_s": tpu["per_chunk_s"],
            "compile_warm_s": tpu["warm_s"],
            **({"pallas_fallback": True} if tpu.get("pallas_fallback")
               else {}),
        }), flush=True)
        if trace:
            trace()
        return

    baseline = measure_torch_baseline(refresh=args.refresh_baseline)
    tpu = measure_tpu(trace_dir=args.trace, noise_scheme=args.noise_scheme,
                      anchored=args.anchor, chains=args.chains,
                      anchor_radius=args.anchor_radius, **svf_kwargs)
    trace = tpu.pop("_trace", None)

    # VERDICT r4 missing #4: the reference prints BOTH speed tests
    # (trainer/trainer.py:276-289 VI, :467-476 MCMC) but the driver
    # artifact recorded only MCMC.  Fold the VI iteration rate into the
    # same JSON object (still ONE line) when the budget allows — its warm
    # chunk is ~35 s against the persistent compile cache.  A VI-side
    # failure must never cost the headline, so it degrades to an error tag.
    vi_fields = {}
    if _remaining() > 240:
        try:
            vi = measure_vi(noise_scheme=args.noise_scheme, **svf_kwargs)
            vi.pop("_trace", None)
            vi_fields = {
                "vi_iters_per_sec": round(vi["iters_per_sec"], 3),
                "vi_spread_rel": round(vi["spread_rel"], 4),
                "vi_compile_warm_s": vi["warm_s"],
            }
            if args.model == "svf":
                VI_CACHE.write_text(json.dumps({
                    "git_head": _git_head(),
                    "vi_iters_per_sec": vi_fields["vi_iters_per_sec"],
                    "vi_spread_rel": vi_fields["vi_spread_rel"],
                }))
        except Exception as e:  # noqa: BLE001 — headline survives VI loss
            vi_fields = {"vi_error": f"{type(e).__name__}: {e}"[:300]}
    else:
        _stage(f"skipping VI phase ({_remaining():.0f}s left < 240)")
    if "vi_iters_per_sec" not in vi_fields and VI_CACHE.exists():
        # a cold compile can eat the whole --budget (Mosaic payloads embed
        # kernel source locations, so ANY kernel-file edit invalidates the
        # chunk executable in the persistent cache); fall back to the last
        # measurement taken at THIS git revision, honestly tagged
        try:
            cached = json.loads(VI_CACHE.read_text())
            if cached.get("git_head") == _git_head() and cached["git_head"]:
                vi_fields.update({
                    "vi_iters_per_sec": cached["vi_iters_per_sec"],
                    "vi_spread_rel": cached.get("vi_spread_rel"),
                    "vi_cached_same_head": True,
                })
        except Exception:
            pass

    print(json.dumps({
        "metric": "sgmcmc_samples_per_sec_128cubed_2chains",
        "value": round(tpu["samples_per_sec"], 3),
        "unit": "samples/sec",
        "noise_scheme": args.noise_scheme,
        "vs_baseline": round(tpu["samples_per_sec"] / baseline["samples_per_sec"], 2),
        "spread_rel": round(tpu["spread_rel"], 4),
        "timed_chunks_s": tpu["per_chunk_s"],
        "compile_warm_s": tpu["warm_s"],
        **({"pallas_fallback": True} if tpu.get("pallas_fallback") else {}),
        **vi_fields,
        "baseline_samples_per_sec": round(baseline["samples_per_sec"], 5),
        "baseline_timed_transitions": baseline.get("timed_transitions"),
        "baseline_median_s": baseline.get("median_s"),
        "baseline_iqr_s": baseline.get("iqr_s"),
        "baseline_spread_rel": round(baseline.get("spread_rel", 0.0), 4),
    }), flush=True)
    if trace:
        trace()


if __name__ == "__main__":
    main()
