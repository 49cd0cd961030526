"""Two-phase VI -> SG-MCMC registration trainer (host-side orchestration).

Re-architecture of the reference Trainer (/root/reference/trainer/
trainer.py:16-614 + base/base_trainer.py).  The reference drives every
iteration from Python; here the hot loops are device-resident ``lax.scan``
chunks built by :mod:`ir_sgmcmc_tpu.engine`, and the host only:

* moves each image pair to device once,
* launches VI / SGLD chunks sized to the logging period,
* evaluates registration quality (Dice in-graph, ASD on host) at log time,
* enforces the diffeomorphism guard (abort when any chain's transformation
  folds at > 0.1% of voxels, trainer.py:441-445),
* writes scalars / figures / NIfTI / VTK artifacts,
* checkpoints state at every log boundary (a capability the reference
  advertises but does not implement — README.md:28-31).

Phase structure per image pair (trainer.py:478-563): data init -> GMM
warm-up -> [VI -> VI test] -> [MCMC], with the sampling-speed timers the
reference prints (trainer.py:276-289, 467-476) reproduced as the benchmark
metrics.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from .config import Config
from .engine import (
    VIState,
    gmm_warmup,
    init_chains,
    make_mcmc_chunk,
    make_vi_chunk,
    make_vi_step,
    posterior_statistics,
)
from .engine.mcmc import welford_finalize, welford_init, welford_update
from .models.sampler import sample_q_v
from .ops.grids import count_non_diffeomorphic, det_jacobian
from .ops.resample import warp
from .ops.stencil import gradient
from .utils.checkpoint import load_checkpoint, peek_meta, save_checkpoint
from .utils.metrics import MetricTracker, calc_metrics, dice
from .utils import savers


class TrainerAbort(RuntimeError):
    """Base for runtime-guard aborts of a sampling phase."""


class NonDiffeomorphicAbort(TrainerAbort):
    """Raised when a sampled transformation folds at > ``tol`` of voxels."""


class DisplacementSaturationAbort(TrainerAbort):
    """Raised when displacements saturate the bounded-warp ``max_disp`` at
    > ``tol`` of voxels — the clamp silently corrupts the posterior there
    (the reference's gather-based warp has no such bound,
    /root/reference/utils/transformation.py:63-76)."""


def _is_pallas_failure(e: Exception) -> bool:
    """Heuristic: does this look like a Pallas/Mosaic kernel lowering or
    compile failure (vs a numerical/user error)?  ADVICE r3: the trainer
    keeps a pure-XLA fallback if ``pallas_call`` compilation fails on
    hardware the kernels were not validated on (compiled parity is checked
    by scripts/tpu_selftest.py on every TPU generation we can reach, but a
    new Mosaic version can regress a lowering)."""
    s = f"{type(e).__name__}: {e}"
    return any(k in s for k in ("Mosaic", "mosaic", "pallas", "Pallas",
                                "tpu_custom_call", "custom_call"))


def _host(tree):
    return jax.tree.map(np.asarray, tree)


def _last(metrics_stacked):
    """Final-step slice of stacked per-step scan metrics."""
    return jax.tree.map(lambda x: x[-1], metrics_stacked)


class Trainer:
    def __init__(self, config: Config, dataset=None, resume: str | None = None):
        self.config = config
        self.t_cfg = config["trainer"]
        self.logger = config.logger
        self.writer = config.writer
        self.dataset = dataset if dataset is not None else config.build_dataset()
        self.bundle = config.build_bundle()
        self.opt_q_v, self.opt_gmm, self.opt_reg = config.build_optimizers(self.bundle)
        self.resume_path = resume

        self.structures = getattr(self.dataset, "structures", None) or config.structures
        self.spacing = (1.0, 1.0, 1.0)  # refined per pair once a volume is read

        self.run_vi = bool(self.t_cfg.get("VI", False))
        self.run_mcmc = bool(self.t_cfg.get("MCMC", False))
        self.no_iters_vi = int(self.t_cfg.get("no_iters_VI", 0))
        self.no_samples_vi_test = int(self.t_cfg.get("no_samples_VI_test", 0))
        self.no_chains = int(self.t_cfg.get("no_chains", 1))
        self.no_iters_burn_in = int(self.t_cfg.get("no_iters_burn_in", 0))
        self.no_samples_mcmc = int(self.t_cfg.get("no_samples_MCMC", 0))
        self.log_period_vi = int(self.t_cfg.get("log_period_VI", 128))
        self.log_period_mcmc = int(self.t_cfg.get("log_period_MCMC", 1000))
        self.mcmc_init = self.t_cfg.get("MCMC_init", "VI")
        # 'per_chain' (default): independent GMM/reg params per chain,
        # embarrassingly parallel; 'shared': exact reference semantics —
        # one parameter set, no_chains sequential GMM Adam steps per
        # transition (/root/reference/trainer/trainer.py:316-327)
        self.mcmc_param_mode = self.t_cfg.get("MCMC_params", "per_chain")
        self.compute_asd = bool(self.t_cfg.get("ASD", True))
        self.ndv_tol = float(self.t_cfg.get("non_diffeomorphic_tolerance", 0.001))
        self.sat_tol = float(self.t_cfg.get("saturation_tolerance", 0.001))
        self.speed_test_iters = int(self.t_cfg.get("speed_test_iters", 100))
        # host-bandwidth throttles: the full chain state (~300 MB at 128³)
        # and the per-sample artifacts (~45 MB/chain) cross the device→host
        # link on every save — at the axon tunnel's measured ~10 MB/s that
        # dominated the in-trainer MCMC wall.  Checkpoints are time-gated
        # (phase ends always checkpoint); artifact saving has its own
        # period, defaulting to every log period (reference cadence,
        # trainer.py:391).
        self.ckpt_period_s = float(self.t_cfg.get("checkpoint_period_s", 300.0))
        self.save_period_mcmc = int(
            self.t_cfg.get("save_period_MCMC", self.log_period_mcmc))
        self._last_ckpt_t = float("-inf")

        keys = ["data_term", "reg_term", "entropy_term", "total_loss", "vd_alpha",
                "reg_energy", "ndv", "sat"]
        self.tracker = MetricTracker(*keys, writer=self.writer)

        # experiment hyperparameters as tracked text (reference
        # logger/writer.py:6-20 hparams patch)
        import json as _json

        self.writer.add_text("config", _json.dumps(config.cfg, indent=2, default=str))

    # ------------------------------------------------------------------ run
    def run(self):
        """Register every pair in the dataset; returns per-pair summaries."""
        if bool(self.t_cfg.get("pair_parallel", False)) and len(self.dataset) > 1:
            unsupported = None
            if self.mcmc_param_mode != "per_chain":
                unsupported = "MCMC_params='shared' (sequential GMM updates)"
            elif bool(self.t_cfg.get("mcmc_anchor", False)):
                unsupported = "mcmc_anchor=true"
            if unsupported is None:
                summaries = self._run_pairs_parallel()
                self.writer.close()
                return summaries
            self.logger.warning(
                "pair_parallel requested but %s is not supported in the "
                "pair-stacked chunks — registering pairs sequentially",
                unsupported)
        summaries = []
        for pair_idx in range(len(self.dataset)):
            summaries.append(self._run_pair(pair_idx))
        self.writer.close()
        return summaries

    def _save_dirs_for(self, pair_idx: int) -> dict:
        """Pair 0 keeps the run's artifact tree; later pairs get their own
        subtree so multi-pair runs never overwrite each other's outputs."""
        base = dict(self.config.save_dirs)
        if pair_idx == 0:
            return base
        dirs = {
            k: (p if k == "dir" else p.parent / f"pair_{pair_idx}" / p.name)
            for k, p in base.items()
        }
        for k, p in dirs.items():
            if k != "dir":
                p.mkdir(parents=True, exist_ok=True)
        return dirs

    def _run_pairs_parallel(self) -> list:
        """Register ALL dataset pairs concurrently over a ``('pair',)`` mesh.

        The reference registers pairs strictly sequentially (one accelerator
        per pair-process on its Biobank runs); here the pairs — each with its
        own parameters, chains, and accumulators — are embarrassingly
        parallel, so the VI and MCMC phases run pair-stacked under an
        explicit ``shard_map`` (engine/pairs.py) with zero cross-pair
        collectives.  Host-side evaluation, artifact saving, and the VI test
        stay per-pair (run after each phase on unstacked state).  Deltas vs
        the sequential path, by design: guards fire on the worst pair and
        abort the whole batch (the same data aborts its sequential run too);
        per-sample MCMC artifact dumps are replaced by phase-end artifacts;
        checkpoints hold the pair-stacked state and resume restores it
        (the checkpoint's ``pair_parallel`` count must match the dataset —
        a pair-stacked checkpoint is not interchangeable with the
        sequential per-pair ones).
        """
        from .engine.pairs import (
            make_pair_mcmc_chunk,
            make_pair_mesh,
            make_pair_vi_chunk,
            shard_pairs,
            stack_trees,
            unstack_tree,
        )

        n_pairs = len(self.dataset)
        mesh = make_pair_mesh(n_pairs)
        n_dev = mesh.shape["pair"]
        self.logger.info("pair-parallel: %d pairs over %d devices "
                         "(%d pair(s) per device, sequential within)",
                         n_pairs, n_dev, n_pairs // n_dev)

        if self.dataset.im_spacing is not None:
            sp = np.ravel(np.asarray(self.dataset.im_spacing, np.float32))
            self.spacing = tuple(np.resize(sp, 3).tolist())

        pair_dirs = [self._save_dirs_for(i) for i in range(n_pairs)]
        fixeds, movings, states = [], [], []
        for i in range(n_pairs):
            fixed_np, moving_np, q_v0 = self.dataset[i]
            fixed = {k: jnp.asarray(v) for k, v in fixed_np.items()}
            moving = {k: jnp.asarray(v) for k, v in moving_np.items()}
            if fixeds and any(
                fixed[k].shape != fixeds[0][k].shape for k in fixed
            ):
                raise ValueError(
                    f"pair {i} has a different volume shape than pair 0 — "
                    f"pair_parallel stacks pairs and needs equal dims "
                    f"(the loader's pad-to-cube dims setting)")
            savers.save_fixed_im(pair_dirs[i], self.spacing, fixed_np["im"])
            savers.save_moving_im(pair_dirs[i], self.spacing, moving_np["im"])
            savers.save_fixed_mask(pair_dirs[i], self.spacing, fixed_np["mask"])
            savers.save_moving_mask(pair_dirs[i], self.spacing, moving_np["mask"])
            q_v = {k: jnp.asarray(v) for k, v in q_v0.items()}
            state = VIState(
                q_v=q_v,
                gmm=self.bundle.gmm.init_params(),
                reg=self.bundle.reg_loss.init_params(),
                opt_q_v=self.opt_q_v.init(q_v),
                opt_gmm=self.opt_gmm.init(self.bundle.gmm.init_params()),
                opt_reg=self.opt_reg.init(self.bundle.reg_loss.init_params()),
                key=jax.random.PRNGKey(int(self.t_cfg.get("seed", 0)) + i),
                step=jnp.zeros((), jnp.int32),
            )
            states.append(gmm_warmup(self.bundle, self.opt_gmm, state,
                                     fixed, moving))
            fixeds.append(fixed)
            movings.append(moving)

        summaries = [{"pair": i} for i in range(n_pairs)]
        for i in range(n_pairs):
            dsc0 = np.asarray(dice(fixeds[i]["seg"], movings[i]["seg"],
                                   list(self.structures.values())))
            summaries[i]["dsc_before"] = float(dsc0.mean())
            self.logger.info("pair %d: pre-registration mean Dice %.4f",
                             i, summaries[i]["dsc_before"])

        # resume (VERDICT r3 #6): pair-stacked checkpoints record the pair
        # count; anything else (count mismatch, a sequential per-pair
        # checkpoint) is refused with a precise error instead of silently
        # restarting N pairs from one pair's state
        resume_meta = {}
        mcmc_resume = None
        vi_resume = None
        if self.resume_path:
            meta = peek_meta(self.resume_path)
            ck_pairs = int(meta.get("pair_parallel", 0) or 0)
            if ck_pairs != n_pairs:
                raise ValueError(
                    f"{self.resume_path}: checkpoint holds "
                    f"{ck_pairs if ck_pairs else 'non-pair-stacked'} "
                    f"pair(s) but this run registers {n_pairs} — resume "
                    f"needs the same dataset and pair_parallel setting")
            phase = meta.get("phase")
            if phase == "VI":
                vi_resume = self.resume_path
            elif phase == "MCMC":
                mcmc_resume = self.resume_path
                resume_meta = {"phase_done": 1}
            else:
                raise ValueError(
                    f"{self.resume_path}: checkpoint metadata names neither "
                    f"the VI nor the MCMC phase (meta={meta})")

        fixed_st = shard_pairs(stack_trees(fixeds), mesh)
        moving_st = shard_pairs(stack_trees(movings), mesh)

        cap = int(self.t_cfg.get("max_device_chunk", 200))

        def make_runner(build_chunk):
            chunk_fns = {}

            def run_steps(state, n):
                ms = None
                while n > 0:
                    compiled = [length for length in chunk_fns if length <= n]
                    this = max(compiled) if compiled else min(cap, n)
                    if this not in chunk_fns:
                        chunk_fns[this] = build_chunk(this)
                    state, ms = chunk_fns[this](state)
                    n -= this
                return state, ms

            return run_steps

        # ------------------------------------------------------ VI (stacked)
        if (self.run_vi and self.no_iters_vi > 0
                and int(resume_meta.get("phase_done", -1)) < 1):
            remat = self.t_cfg.get("vi_remat", "auto")
            if remat == "auto":
                field_bytes = 3 * 4 * int(np.prod(self.bundle.dims))
                remat = field_bytes >= 100 * 1024 * 1024
            state_st = shard_pairs(stack_trees(states), mesh)
            if vi_resume:
                state_st, resume_meta = load_checkpoint(vi_resume, state_st)
                state_st = shard_pairs(state_st, mesh)
                self.logger.info("resumed pair-stacked VI from %s at %s",
                                 vi_resume, resume_meta)
            run_vi_steps = make_runner(lambda n: make_pair_vi_chunk(
                self.bundle, self.opt_q_v, self.opt_gmm, self.opt_reg,
                fixed_st, moving_st, chunk=n, mesh=mesh, remat=bool(remat)))

            log_period = max(1, min(self.log_period_vi, self.no_iters_vi))
            t0 = time.perf_counter()
            done = int(resume_meta.get("vi_iters", 0))
            try:
                while done < self.no_iters_vi:
                    this = min(log_period, self.no_iters_vi - done)
                    state_st, ms = run_vi_steps(state_st, this)
                    done += this
                    # ms leaves: (n_pairs, chunk, ...) -> final step per pair
                    last = _host(jax.tree.map(lambda x: x[:, -1], ms))
                    self.writer.set_step(done)
                    for i in range(n_pairs):
                        self.writer.prefix = f"pair{i}/" if i else ""
                        for k in ("data_term", "reg_term", "entropy_term",
                                  "total_loss", "vd_alpha", "reg_energy",
                                  "ndv", "sat"):
                            self.writer.add_scalar(
                                f"VI/{k}", float(np.asarray(last[k])[i]))
                    self.writer.prefix = ""
                    self._check_saturation(
                        int(np.asarray(last["sat"]).max()),
                        int(np.asarray(last["sat_resid"]).max()), done, "VI")
                    self.logger.info(
                        "VI %d/%d loss %s ndv %s (per pair)",
                        done, self.no_iters_vi,
                        np.array2string(np.asarray(last["total_loss"]),
                                        precision=1),
                        np.asarray(last["ndv"]))
                    self._maybe_checkpoint(
                        self.config.save_dirs["models"] / "vi_latest.npz",
                        state_st,
                        {"phase": "VI", "phase_done": 0, "vi_iters": done,
                         "pair_parallel": n_pairs,
                         "config": self.config.name},
                        force=done >= self.no_iters_vi)
            finally:
                savers.flush()
            vi_time = time.perf_counter() - t0
            self.logger.info(
                "VI phase took %.1fs for %d pairs (%.2f aggregate iters/sec)",
                vi_time, n_pairs, n_pairs * self.no_iters_vi / vi_time)

            dev0 = jax.devices()[0]
            states = [
                jax.tree.map(lambda x: jax.device_put(x, dev0),
                             unstack_tree(state_st, i))
                for i in range(n_pairs)
            ]
            for i in range(n_pairs):
                summaries[i]["vi_time_s"] = vi_time
                self.save_dirs = pair_dirs[i]
                self.writer.prefix = f"pair{i}/" if i else ""
                try:
                    summaries[i].update(
                        self._test_vi(fixeds[i], movings[i], states[i]))
                finally:
                    self.writer.prefix = ""

        if not self.run_mcmc:
            return summaries

        # ---------------------------------------------------- MCMC (stacked)
        total = self.no_iters_burn_in + self.no_samples_mcmc
        no_voxels = float(np.prod(self.bundle.dims))
        mcmc_states = [
            init_chains(
                self.bundle,
                jax.random.fold_in(states[i].key, 202),
                no_chains=self.no_chains,
                mode=self.mcmc_init,
                q_v=states[i].q_v if self.mcmc_init == "VI" else None,
                gmm=states[i].gmm,
                reg=states[i].reg,
                opt_gmm=self.opt_gmm,
                opt_reg=self.opt_reg,
                param_mode=self.mcmc_param_mode,
            )
            for i in range(n_pairs)
        ]
        mcmc_st = shard_pairs(stack_trees(mcmc_states), mesh)
        done = 0
        if mcmc_resume:
            mcmc_st, rm = load_checkpoint(mcmc_resume, mcmc_st)
            mcmc_st = shard_pairs(mcmc_st, mesh)
            self.logger.info("resumed pair-stacked MCMC from %s at %s",
                             mcmc_resume, rm)
            done = int(rm.get("mcmc_steps", 0))
            ck_radius = int(rm.get("block_radius", 0) or 0)
            if ck_radius > int(self.bundle.block_radius):
                self.logger.info(
                    "resume: restoring escalated trainer.block_warp.radius "
                    "%d from the checkpoint (configured: %d)",
                    ck_radius, self.bundle.block_radius)
                self.bundle = dataclasses.replace(self.bundle,
                                                  block_radius=ck_radius)

        def make_mcmc_runner():
            # the chunk builder reads self.bundle at build time so an
            # escalated radius takes effect on rebuild
            return make_runner(lambda n: make_pair_mcmc_chunk(
                self.bundle, self.opt_gmm, self.opt_reg, self.config.tau,
                fixed_st, moving_st, chunk=n, burn_in=self.no_iters_burn_in,
                thin=int(self.t_cfg.get("mcmc_thin", 1)), mesh=mesh,
                param_mode=self.mcmc_param_mode))

        run_mcmc_steps = make_mcmc_runner()

        # block-residual auto-escalation, pair-parallel edition (VERDICT r3
        # #6 — the sequential path's recovery, trainer._run_mcmc_phase,
        # extended here): on a saturation abort whose binding counter is the
        # in-block residual one, bump block_warp.radius (kernel cap 4),
        # rebuild the stacked chunks and resume every pair from the last
        # clean period.  The worst pair drives the escalation — the same
        # data would abort its sequential run too.
        auto_escalate = bool(
            self.t_cfg.get("block_warp", {}).get("auto_escalate", True))
        can_try_escalate = (
            auto_escalate
            and getattr(self.bundle, "noise_scheme", "pre") == "post"
            and self.bundle.block_warp
            and not getattr(self.bundle.transformation, "use_gather", False))
        last_good = None  # (done, state) of the newest clean period

        log_period = max(1, min(self.log_period_mcmc, total))
        t0 = time.perf_counter()
        aborted = None
        try:
            while done < total:
                this = min(log_period, total - done)
                try:
                    mcmc_st, ms = run_mcmc_steps(mcmc_st, this)
                    done += this
                    # ms leaves: (n_pairs, chunk, chains, ...)
                    last = _host(jax.tree.map(lambda x: x[:, -1], ms))
                    self.writer.set_step(done)
                    for i in range(n_pairs):
                        self.writer.prefix = f"pair{i}/" if i else ""
                        for k in ("data_term", "reg_term", "vd_alpha",
                                  "reg_energy", "ndv", "sat"):
                            for c in range(self.no_chains):
                                self.writer.add_scalar(
                                    f"MCMC/{k}/chain_{c}",
                                    float(np.asarray(last[k])[i, c]))
                    self.writer.prefix = ""
                    self._check_saturation(
                        int(np.asarray(last["sat"]).max()),
                        int(np.asarray(last["sat_resid"]).max()), done,
                        "MCMC")
                    worst = int(np.asarray(last["ndv"]).max())
                    if worst > self.ndv_tol * no_voxels:
                        raise NonDiffeomorphicAbort(
                            f"a chain transformation folded at {worst} "
                            f"voxels (> {self.ndv_tol:.1%} of "
                            f"{int(no_voxels)}) at step {done} (worst pair)")
                except DisplacementSaturationAbort as e:
                    resid_binding = (getattr(e, "sat_resid", 0)
                                     > self.sat_tol * no_voxels)
                    if not (can_try_escalate and resid_binding
                            and last_good is not None
                            and self.bundle.block_radius < 4):
                        raise
                    new_r = self.bundle.block_radius + 1
                    done, mcmc_st = last_good
                    self.logger.warning(
                        "MCMC auto-recovery (pair-parallel): %s — "
                        "escalating trainer.block_warp.radius %d -> %d and "
                        "resuming all pairs from the last clean period "
                        "(step %d)", e, self.bundle.block_radius, new_r,
                        done)
                    self.bundle = dataclasses.replace(
                        self.bundle, block_radius=new_r)
                    for s in summaries:
                        s.setdefault("block_radius_escalations", []).append(
                            {"step": done, "radius": new_r})
                    run_mcmc_steps = make_mcmc_runner()
                    continue
                if can_try_escalate and self.bundle.block_radius < 4:
                    last_good = (done, jax.tree.map(jnp.copy, mcmc_st))
                self.logger.info(
                    "MCMC %d/%d data %s ndv_max %d (pairs x chains)",
                    done, total,
                    np.array2string(np.asarray(last["data_term"]),
                                    precision=1),
                    worst)
                self._maybe_checkpoint(
                    self.config.save_dirs["models"] / "mcmc_latest.npz",
                    mcmc_st,
                    {"phase": "MCMC", "phase_done": 1, "mcmc_steps": done,
                     "pair_parallel": n_pairs,
                     "block_radius": int(self.bundle.block_radius),
                     "config": self.config.name},
                    force=done >= total)
        except TrainerAbort as e:
            self.logger.error("MCMC aborted: %s", e)
            aborted = str(e)
        finally:
            mcmc_time = time.perf_counter() - t0
            savers.flush()

        agg = n_pairs * self.no_chains * done / mcmc_time if done else 0.0
        self.logger.info(
            "MCMC phase: %d steps x %d pairs x %d chains in %.1fs "
            "(%.2f aggregate samples/sec)",
            done, n_pairs, self.no_chains, mcmc_time, agg)

        dev0 = jax.devices()[0]
        for i in range(n_pairs):
            summaries[i]["mcmc_time_s"] = mcmc_time
            summaries[i]["mcmc_aggregate_samples_per_sec"] = agg
            if aborted is not None:
                summaries[i]["mcmc_aborted"] = aborted
            mcmc_i = jax.tree.map(lambda x: jax.device_put(x, dev0),
                                  unstack_tree(mcmc_st, i))
            self.save_dirs = pair_dirs[i]
            self.writer.prefix = f"pair{i}/" if i else ""
            try:
                if (aborted is None
                        and float(np.asarray(mcmc_i.welford.count).sum()) > 1):
                    mean, std = posterior_statistics(mcmc_i)
                    savers.save_displacement_mean_and_std_dev(
                        self.save_dirs, self.spacing, np.asarray(mean),
                        np.asarray(std), np.asarray(fixeds[i]["mask"]),
                        "MCMC")
                if aborted is None:
                    eval_fn = jax.jit(jax.vmap(
                        self._make_eval(fixeds[i], movings[i])))
                    outs = eval_fn(mcmc_i.v)
                    fixed_seg_np = np.asarray(fixeds[i]["seg"])
                    dscs = []
                    for c in range(self.no_chains):
                        out_c = jax.tree.map(lambda x: x[c], outs)
                        dscs.append(self._log_seg_metrics(
                            fixed_seg_np, out_c, "MCMC", chain=c))
                        im16 = out_c["im_warped"].astype(jnp.float16)
                        disp16 = out_c["displacement"].astype(jnp.float16)
                        ldj16 = out_c["log_det_J"].astype(jnp.float16)
                        savers.submit(
                            lambda sn=done - self.no_iters_burn_in, im=im16,
                            dp=disp16, ld=ldj16, cc=c, sd=self.save_dirs:
                            savers.save_sample(sd, self.spacing, sn, im,
                                               dp, ld, "MCMC", chain_no=cc))
                    summaries[i]["mcmc_mean_dsc"] = float(np.mean(dscs))
            finally:
                self.writer.prefix = ""
        savers.flush()
        return summaries

    def _run_pair(self, pair_idx: int) -> dict:
        self.save_dirs = self._save_dirs_for(pair_idx)

        fixed_np, moving_np, q_v0 = self.dataset[pair_idx]
        if self.dataset.im_spacing is not None:
            sp = np.ravel(np.asarray(self.dataset.im_spacing, np.float32))
            self.spacing = tuple(np.resize(sp, 3).tolist())
        fixed = {k: jnp.asarray(v) for k, v in fixed_np.items()}
        moving = {k: jnp.asarray(v) for k, v in moving_np.items()}

        savers.save_fixed_im(self.save_dirs, self.spacing, fixed_np["im"])
        savers.save_moving_im(self.save_dirs, self.spacing, moving_np["im"])
        savers.save_fixed_mask(self.save_dirs, self.spacing, fixed_np["mask"])
        savers.save_moving_mask(self.save_dirs, self.spacing, moving_np["mask"])

        state = VIState(
            q_v={k: jnp.asarray(v) for k, v in q_v0.items()},
            gmm=self.bundle.gmm.init_params(),
            reg=self.bundle.reg_loss.init_params(),
            opt_q_v=self.opt_q_v.init({k: jnp.asarray(v) for k, v in q_v0.items()}),
            opt_gmm=self.opt_gmm.init(self.bundle.gmm.init_params()),
            opt_reg=self.opt_reg.init(self.bundle.reg_loss.init_params()),
            key=jax.random.PRNGKey(int(self.t_cfg.get("seed", 0)) + pair_idx),
            step=jnp.zeros((), jnp.int32),
        )

        resume_meta = {}
        self._mcmc_resume = None
        # resume applies to pair 0 only: a checkpoint holds one pair's state,
        # and re-applying it to every pair would silently restart them all
        # from the same point
        resume_path = self.resume_path if pair_idx == 0 else None
        if resume_path:
            meta = peek_meta(resume_path)
            phase = meta.get("phase")
            if phase is None and "phase_done" in meta:  # round-1 checkpoints
                phase = "MCMC" if int(meta["phase_done"]) >= 1 else "VI"
            if phase == "VI":
                state, resume_meta = load_checkpoint(resume_path, state)
                self.logger.info("resumed from %s at %s", resume_path, resume_meta)
            elif phase == "MCMC":
                # defer to the MCMC phase, which loads it into the
                # chain-state template
                self._mcmc_resume = resume_path
                resume_meta = {"phase_done": 1}
                state = gmm_warmup(self.bundle, self.opt_gmm, state, fixed, moving)
            else:
                raise ValueError(
                    f"{resume_path}: checkpoint metadata names neither the "
                    f"VI nor the MCMC phase (meta={meta}); refusing to guess"
                )
        else:
            # GMM warm-up: data-driven scale init + 25 detached Adam steps
            # (trainer.py:529-547)
            state = gmm_warmup(self.bundle, self.opt_gmm, state, fixed, moving)

        summary = {"pair": pair_idx}
        baseline_dsc = np.asarray(
            dice(fixed["seg"], moving["seg"], list(self.structures.values()))
        )
        summary["dsc_before"] = float(baseline_dsc.mean())
        self.logger.info("pair %d: pre-registration mean Dice %.4f",
                         pair_idx, summary["dsc_before"])

        if self.run_vi and int(resume_meta.get("phase_done", -1)) < 1:
            t0 = time.perf_counter()
            state = self._run_vi_phase(fixed, moving, state,
                                       start=int(resume_meta.get("vi_iters", 0)))
            summary["vi_time_s"] = time.perf_counter() - t0
            self.logger.info("VI phase took %.1fs", summary["vi_time_s"])
            summary.update(self._test_vi(fixed, moving, state))

        if self.run_mcmc:
            summary.update(self._run_mcmc_phase(fixed, moving, state))

        return summary

    # ---------------------------------------------------------- evaluation
    def _make_eval(self, fixed, moving):
        """Jitted sample evaluation: v_unsmoothed -> warped im/seg, log|J|, displacement."""
        bundle = self.bundle
        labels = list(self.structures.values())

        integrate = getattr(bundle.transformation, "integrate", None)

        @jax.jit
        def eval_v(v_unsmoothed):
            v = bundle.smooth(v_unsmoothed)
            if integrate is not None:
                # image rides the squaring cascade (fast path, consistent
                # with training); the segmentation needs nearest-neighbour
                # semantics and keeps the gather
                transformation, displacement, im_warped = integrate(v, im=moving["im"])
            else:
                transformation, displacement = bundle.transformation(v)
                im_warped = warp(moving["im"], transformation, method="linear")
            seg_warped = warp(moving["seg"], transformation, method="nearest")
            jac = gradient(transformation, normalised_spacing=True)
            det = det_jacobian(jac)
            log_det = jnp.log(jnp.maximum(det, 0.0))  # -inf/nan where folded
            dsc = dice(fixed["seg"], seg_warped, labels)
            ndv = count_non_diffeomorphic(det)
            residuals = bundle.gmm.residual_map(fixed["im"], im_warped)
            return {
                "im_warped": im_warped,
                "seg_warped": seg_warped,
                "displacement": displacement,
                "log_det_J": log_det,
                "dsc": dsc,
                "ndv": ndv,
                "residuals": residuals,
            }

        return eval_v

    def _log_seg_metrics(self, fixed_np, out, prefix: str, chain=None,
                         defer_asd: bool = False):
        """Per-structure Dice (cheap: on-device scalars) + EDT-based ASD.

        ``defer_asd=True`` moves the expensive part — the ~4 MB warped-seg
        fetch over the tunnel plus the host EDT — onto the background
        artifact-writer thread under a step-bound writer view, so per-period
        calls never stall the device-dispatch loop (VERDICT r3 #5).
        """
        tag = f"{prefix}" + (f"/chain_{chain}" if chain is not None else "")
        dsc = np.asarray(out["dsc"])
        for name, val in zip(self.structures, dsc):
            self.writer.add_scalar(f"DSC/{tag}/{name}", float(val))
        self.writer.add_scalar(f"DSC/{tag}/mean", float(dsc.mean()))
        if self.compute_asd:
            wb = self.writer.at_step()
            seg_w = out["seg_warped"]  # NOT donated: jitted eval output

            def _asd_work(wb=wb, fixed_np=fixed_np, seg_w=seg_w, tag=tag):
                asd, _ = calc_metrics(fixed_np, np.asarray(seg_w),
                                      self.structures, self.spacing)
                finite = np.isfinite(asd[0])
                for name, val in zip(self.structures, asd[0]):
                    wb.add_scalar(f"ASD/{tag}/{name}", float(val))
                if finite.any():
                    wb.add_scalar(f"ASD/{tag}/mean",
                                  float(asd[0][finite].mean()))

            if defer_asd:
                savers.submit(_asd_work)
            else:
                _asd_work()
        return float(dsc.mean())

    def _maybe_checkpoint(self, path, state, meta, force: bool = False,
                          snapshotted: bool = False) -> None:
        """Time-gated checkpoint: fetching the chain state costs ~30 s at
        128³ over the tunnel, so it happens at most every
        ``checkpoint_period_s`` (and always at phase boundaries), and the
        fetch + write run on the background writer thread — the snapshot is
        taken on-device here (donation-safe), the main loop keeps driving
        device chunks.  Pass ``snapshotted=True`` when ``state`` is already
        a donation-safe copy (the MCMC loop snapshots every period) to skip
        a second full device copy (hundreds of MB of HBM at 128³)."""
        now = time.perf_counter()
        if not force and now - self._last_ckpt_t < self.ckpt_period_s:
            return
        snap = state if snapshotted else jax.tree.map(jnp.copy, state)
        savers.submit(lambda: save_checkpoint(path, snap, meta))
        self._last_ckpt_t = time.perf_counter()

    def _try_pallas_fallback(self, e: Exception) -> bool:
        """One-shot pure-XLA fallback when a Pallas kernel fails to
        compile/lower (ADVICE r3).  Returns True when the caller should
        rebuild its chunk functions and retry; False re-raises.  Only
        compile-time failures are safely retryable — a failure after buffer
        donation surfaces as a deleted-buffer error on the retry, which
        is the correct loud outcome."""
        if getattr(self, "_pallas_disabled", False) or not _is_pallas_failure(e):
            return False
        from .ops import resample

        self.logger.warning(
            "Pallas kernel compilation failed (%s: %.300s) — disabling the "
            "kernels for this run and retrying with the pure-XLA path "
            "(slower; run scripts/tpu_selftest.py to diagnose)",
            type(e).__name__, e)
        resample.set_pallas_mode(False)
        self._pallas_disabled = True
        return True

    def _check_saturation(self, sat: int, sat_resid: int, step: int,
                          phase: str) -> None:
        """Displacement-saturation guard: warn on any clamped voxels, abort
        above ``saturation_tolerance`` (same scale as the diffeo guard).

        The two counters name DIFFERENT recovery levers: ``sat - sat_resid``
        voxels hit the integrator's displacement clamp bound (lever:
        ``max_disp``); ``sat_resid`` voxels hit the configured warp's
        residual window — the anchored-residual radius (lever:
        ``anchor_radius``) or the block-gather warp's in-block radius
        (lever: ``block_warp.radius``).  The latter bounds the field's
        IN-BLOCK VARIATION, not its magnitude, so raising ``max_disp`` does
        not move it (measured: the phantom-seed-2 128³ run clamped ~3k
        voxels at max_disp=8 AND at 16 — BASELINE.md round 3)."""
        if sat <= 0:
            return
        no_voxels = float(np.prod(self.bundle.dims))
        max_disp = getattr(self.bundle.transformation, "max_disp", None)
        bound_n = max(0, int(sat) - int(sat_resid))
        causes = []
        if bound_n > 0:
            causes.append(
                f"{bound_n} voxels clamp at the displacement bound "
                f"(max_disp={max_disp}) — raise "
                f"transformation_module.args.max_disp or set "
                f"use_gather=true")
        if sat_resid > 0:
            if bool(self.t_cfg.get("mcmc_anchor", False)) and phase == "MCMC":
                causes.append(
                    f"{sat_resid} voxels clamp at the anchored-residual "
                    f"radius ({int(self.t_cfg.get('anchor_radius', 2))}) — "
                    f"raise trainer.anchor_radius or set mcmc_anchor=false")
            else:
                causes.append(
                    f"{sat_resid} voxels exceed the block-gather warp's "
                    f"in-block residual radius (trainer.block_warp."
                    f"radius={self.bundle.block_radius}, "
                    f"block={self.bundle.block_size}) — this bounds the "
                    f"displacement's in-block VARIATION, so raising "
                    f"max_disp does not help; raise "
                    f"trainer.block_warp.radius (the Pallas kernel "
                    f"supports <= 4), or set use_gather=true for the "
                    f"exact gather path")
        msg = (
            f"{phase} step {step}: displacement saturates a warp limit at "
            f"{sat} voxels ({sat / no_voxels:.2%}) — results are clamped "
            f"there: " + "; ".join(causes)
        )
        if sat > self.sat_tol * no_voxels:
            err = DisplacementSaturationAbort(msg)
            # structured counters for the MCMC loop's auto-recovery (which
            # escalates block_warp.radius only when the RESIDUAL counter is
            # the one past tolerance — the message alone can't be parsed)
            err.sat = int(sat)
            err.sat_resid = int(sat_resid)
            raise err
        self.logger.warning(msg)

    # ------------------------------------------------------------ VI phase
    def _run_vi_phase(self, fixed, moving, state: VIState, start: int = 0) -> VIState:
        # distribute the VI phase spatially (VERDICT r2 #6): the reference's
        # VI is batch-1 (/root/reference/trainer/trainer.py:119-223), which
        # would idle all but one chip of a slice; the op-chain is identical
        # to MCMC's, so q(v) params (+ their Adam moments) and the image
        # pair shard along D and XLA's SPMD partitioner runs the whole ELBO
        # step with halo-exchange collectives.  ``vi_spatial_shards``:
        # "auto" (default) uses every device when D divides evenly.
        self._vi_mesh = None
        n_dev = len(jax.devices())
        if bool(self.t_cfg.get("distribute", True)) and n_dev > 1:
            from .parallel import make_mesh, shard_images_spatial, shard_tree_spatial

            depth = int(self.bundle.dims[0])
            dense = tuple(self.bundle.field_dims) == tuple(self.bundle.dims)
            spatial = self.t_cfg.get("vi_spatial_shards", "auto")
            if spatial == "auto":
                spatial = n_dev if (dense and depth % n_dev == 0) else 1
            spatial = int(spatial)
            if spatial > 1 and dense and depth % spatial == 0 and spatial <= n_dev:
                self._vi_mesh = make_mesh((spatial,), axes=("space",))
                state = shard_tree_spatial(state, self._vi_mesh, depth)
                fixed = shard_images_spatial(fixed, self._vi_mesh, depth)
                moving = shard_images_spatial(moving, self._vi_mesh, depth)
                self.logger.info("distributing VI over %d spatial shards",
                                 spatial)

        if self._vi_mesh is not None:
            # GSPMD-partitioned phase: keep pallas_calls out of the traced
            # graphs (no sharding rule; see the MCMC-phase note)
            from .ops import resample

            resample.set_pallas_mode(False)
        try:
            state = self._run_vi_loop(fixed, moving, state, start)
            if self._vi_mesh is not None:
                # gather the space-sharded VI state back onto one device:
                # everything downstream — _test_vi's posterior-mean eval and
                # speed test, and the MCMC phase's own chain/space sharding —
                # jits over state.q_v with Pallas re-enabled, and a
                # pallas_call traced against space-sharded operands has no
                # GSPMD sharding rule (the partitioner would all-gather full
                # volumes around every warp kernel)
                dev0 = jax.devices()[0]
                state = jax.tree.map(lambda x: jax.device_put(x, dev0), state)
            return state
        finally:
            if self._vi_mesh is not None:
                resample.set_pallas_mode(None)

    def _run_vi_loop(self, fixed, moving, state: VIState, start: int) -> VIState:
        # image pairs above the literal-baking threshold enter the jitted
        # chunks as parameters (a 256³ pair embedded as StableHLO constants
        # overflows the remote-compile transport — engine.mcmc note)
        image_bytes = sum(x.size * x.dtype.itemsize
                          for d in (fixed, moving) for x in jax.tree.leaves(d))
        # ``vi_remat``: sequential antithetic chains under jax.checkpoint
        # (engine.vi.make_vi_step).  "auto" turns it on once a dense field
        # exceeds 100 MB (~≥204³) — the batched step's two live activation
        # cascades stop fitting a 16 GB chip around 256³.
        remat = self.t_cfg.get("vi_remat", "auto")
        if remat == "auto":
            field_bytes = 3 * 4 * int(np.prod(self.bundle.dims))
            remat = field_bytes >= 100 * 1024 * 1024
        remat = bool(remat)
        if remat:
            self.logger.info("VI remat on: sequential antithetic chains")
        if image_bytes > 32 * 1024 * 1024:
            step_fn = None

            def step_builder(f, m):
                return make_vi_step(self.bundle, self.opt_q_v, self.opt_gmm,
                                    self.opt_reg, f, m, remat=remat)
        else:
            step_builder = None
            step_fn = make_vi_step(self.bundle, self.opt_q_v, self.opt_gmm,
                                   self.opt_reg, fixed, moving, remat=remat)
        eval_fn = self._make_eval(fixed, moving)
        fixed_seg_np = np.asarray(fixed["seg"])
        # fetched ONCE for the deferred figure closures — static all phase
        fixed_im_np = np.asarray(fixed["im"], np.float32)
        moving_im_np = np.asarray(moving["im"], np.float32)
        fixed_mask_np = np.asarray(fixed["mask"])

        # device chunks capped like the MCMC phase (axon worker stability)
        cap = int(self.t_cfg.get("max_device_chunk", 200))
        chunk_fns = {}

        def run_steps(state, n):
            ms = None
            while n > 0:
                this = min(cap, n)
                if this not in chunk_fns:
                    chunk_fns[this] = make_vi_chunk(
                        step_fn, this, step_builder=step_builder,
                        images=(fixed, moving))
                try:
                    state, ms = chunk_fns[this](state)
                except Exception as e:
                    if not self._try_pallas_fallback(e):
                        raise
                    chunk_fns.clear()
                    continue  # rebuild this chunk pure-XLA
                n -= this
            return state, ms

        log_period = max(1, min(self.log_period_vi, self.no_iters_vi))
        done = start
        try:
            while done < self.no_iters_vi:
                this = min(log_period, self.no_iters_vi - done)
                state, ms = run_steps(state, this)
                done += this
                last = _host(_last(ms))

                self.writer.set_step(done)
                for k in ("data_term", "reg_term", "entropy_term", "total_loss",
                          "vd_alpha", "reg_energy", "ndv", "sat"):
                    self.tracker.update(k, float(np.asarray(last[k])))
                self._check_saturation(
                    int(np.asarray(last["sat"])),
                    int(np.asarray(last["sat_resid"])), done, "VI")
                for i, (s, p) in enumerate(zip(np.atleast_1d(last["gmm_scales"]),
                                               np.atleast_1d(last["gmm_proportions"]))):
                    self.writer.add_scalar(f"GMM/scale_{i}", float(s))
                    self.writer.add_scalar(f"GMM/proportion_{i}", float(p))
                for name in ("mu", "log_var", "u"):
                    self.writer.add_scalar(f"VI/max_update_{name}",
                                           float(np.asarray(last[f"max_update_{name}"])))

                out = eval_fn(state.q_v["mu"])
                mean_dsc = self._log_seg_metrics(fixed_seg_np, out, "VI",
                                                 defer_asd=True)
                if self.writer.has_figures:
                    from .utils import figures

                    # figure rendering fetches several full volumes (~60 MB
                    # f32 inline) — defer to the writer thread on fresh f16
                    # device copies.  The .astype COPIES matter beyond
                    # bandwidth: ``run_steps`` donates ``state``, so the
                    # q_v buffers themselves die at the next loop iteration
                    wb = self.writer.at_step()
                    res16 = out["residuals"].astype(jnp.float16)
                    imw16 = out["im_warped"].astype(jnp.float16)
                    disp16 = out["displacement"].astype(jnp.float16)
                    mu16 = state.q_v["mu"].astype(jnp.float16)
                    sig16 = jnp.exp(0.5 * state.q_v["log_var"]).astype(jnp.float16)
                    u16 = state.q_v["u"].astype(jnp.float16)
                    log_props = np.log(np.asarray(last["gmm_proportions"]))
                    log_scales = np.log(np.asarray(last["gmm_scales"]))

                    def _vi_figs(wb=wb, res=res16, imw=imw16, dp=disp16,
                                 mu=mu16, sig=sig16, u=u16,
                                 lp=log_props, ls=log_scales):
                        wb.add_figure("VI/residual_hist",
                                      figures.residual_histogram(
                                          np.asarray(res, np.float32),
                                          fixed_mask_np, lp, ls))
                        wb.add_figure("VI/images", figures.image_grid({
                            "fixed": fixed_im_np,
                            "moving": moving_im_np,
                            "warped(mu)": np.asarray(imw, np.float32)}))
                        wb.add_figure("VI/fields", figures.field_norm_grid({
                            "mu": np.asarray(mu, np.float32),
                            "sigma": np.asarray(sig, np.float32),
                            "u": np.asarray(u, np.float32),
                            "displacement": np.asarray(dp, np.float32)}))

                    savers.submit(_vi_figs, droppable=True)
                self.logger.info(
                    "VI %d/%d loss %.1f data %.1f reg %.1f entropy %.1f dice %.4f ndv %d",
                    done, self.no_iters_vi, float(last["total_loss"]),
                    float(last["data_term"]), float(last["reg_term"]),
                    float(last["entropy_term"]), mean_dsc, int(last["ndv"]),
                )
                self._maybe_checkpoint(
                    self.save_dirs["models"] / "vi_latest.npz", state,
                    {"phase": "VI", "phase_done": 0, "vi_iters": done,
                     "config": self.config.name},
                    force=done >= self.no_iters_vi,
                )
        finally:
            # on a TrainerAbort (saturation guard) the queued async
            # checkpoint/artifact writes must still land before the
            # exception propagates — the daemon writer thread would
            # otherwise drop them at interpreter exit (the MCMC phase
            # flushes in its finally for the same reason)
            savers.flush()
        return state

    def _test_vi(self, fixed, moving, state: VIState) -> dict:
        """Posterior sampling / evaluation + speed test (trainer.py:225-289)."""
        if self.no_samples_vi_test <= 0:
            return {}
        bundle = self.bundle
        eval_fn = self._make_eval(fixed, moving)
        fixed_seg_np = np.asarray(fixed["seg"])

        # the reference evaluates its posterior draws one at a time
        # (trainer.py:225-257); the draws are independent, so they batch
        # over the devices of a ('draw',) mesh — B draws per device round
        # (VERDICT r2 #6: the VI-test loop is embarrassingly parallel)
        n_dev = len(jax.devices())
        B, draw_sharding = 1, None
        q_v_t = state.q_v
        if (bool(self.t_cfg.get("distribute", True)) and n_dev > 1
                and self.no_samples_vi_test >= n_dev):
            from jax.sharding import NamedSharding, PartitionSpec
            from .parallel import make_mesh, replicate

            B = n_dev
            draw_mesh = make_mesh(B, axes=("draw",))
            draw_sharding = NamedSharding(draw_mesh, PartitionSpec("draw"))
            q_v_t = replicate(state.q_v, draw_mesh)
            self.logger.info("VI test: %d draws per round over %d devices",
                             B, n_dev)

        @jax.jit
        def eval_batch(keys):
            if draw_sharding is None:
                return jax.vmap(lambda k: eval_fn(sample_q_v(k, q_v_t)))(keys)
            # explicit shard_map over the draw axis: each device evaluates
            # its own draws locally (pallas-safe — no GSPMD partitioning of
            # the warp kernels; see the MCMC chain-mesh note)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            return shard_map(
                jax.vmap(lambda k: eval_fn(sample_q_v(k, q_v_t))),
                mesh=draw_mesh, in_specs=P("draw"), out_specs=P("draw"),
                check_vma=False,
            )(keys)

        key = jax.random.fold_in(state.key, 101)
        welford = welford_init((3,) + tuple(bundle.dims))
        dscs = []
        save_every = max(1, self.no_samples_vi_test // 10)
        done = 0
        while done < self.no_samples_vi_test:
            key, k = jax.random.split(key)
            keys = jax.random.split(k, B)
            if draw_sharding is not None:
                keys = jax.device_put(keys, draw_sharding)
            outs = eval_batch(keys)
            for j in range(min(B, self.no_samples_vi_test - done)):
                i = done + j
                out = jax.tree.map(lambda x: x[j], outs)
                welford = welford_update(welford, out["displacement"],
                                         jnp.asarray(1.0))
                self.writer.set_step(i)
                dscs.append(self._log_seg_metrics(fixed_seg_np, out, "VI_test"))
                if i % save_every == 0:
                    im16 = out["im_warped"].astype(jnp.float16)
                    disp16 = out["displacement"].astype(jnp.float16)
                    ldj16 = out["log_det_J"].astype(jnp.float16)
                    savers.submit(lambda sn=i, im=im16, dp=disp16, ld=ldj16:
                                  savers.save_sample(self.save_dirs,
                                                     self.spacing,
                                                     sn, im, dp, ld, "VI"))
            done += B

        # posterior mean transform (mu directly, trainer.py:258-263)
        out_mu = eval_fn(state.q_v["mu"])
        savers.save_variational_posterior_mean(
            self.save_dirs, self.spacing, out_mu["im_warped"],
            out_mu["displacement"])

        mean, std = welford_finalize(welford)
        savers.save_displacement_mean_and_std_dev(
            self.save_dirs, self.spacing, np.asarray(mean),
            np.asarray(std), np.asarray(fixed["mask"]), "VI")
        if self.writer.has_figures:
            from .utils import figures

            self.writer.add_figure(
                "VI_test/posterior", figures.mean_std_grid(np.asarray(mean), np.asarray(std)))

        # sampling speed test (trainer.py:276-289): sample -> smooth ->
        # integrate -> warp im + seg, timed over `speed_test_iters` draws
        integrate_fn = getattr(bundle.transformation, "integrate", None)

        @jax.jit
        def speed_body(key, _):
            key, k = jax.random.split(key)
            v = bundle.smooth(sample_q_v(k, state.q_v))
            if integrate_fn is not None:
                transformation, _, im_w = integrate_fn(v, im=moving["im"])
            else:
                transformation, _ = bundle.transformation(v)
                im_w = warp(moving["im"], transformation, method="linear")
            seg_w = warp(moving["seg"], transformation, method="nearest")
            return key, (jnp.mean(im_w), jnp.sum(seg_w))

        def timed(n):
            k, outs = jax.lax.scan(speed_body, key, None, length=n)
            return outs

        run_n = jax.jit(timed, static_argnums=0)
        # warm at the REAL length: the scan length is static, so a
        # different n would retrace and the timed call would include a full
        # recompile (underreporting samples/sec by orders of magnitude)
        outs = run_n(self.speed_test_iters)
        _ = float(np.asarray(outs[0]).sum())  # host sync (axon-safe)
        t0 = time.perf_counter()
        outs = run_n(self.speed_test_iters)
        _ = float(np.asarray(outs[0]).sum())
        dt = time.perf_counter() - t0
        sps = self.speed_test_iters / dt
        self.logger.info("VI sampling speed: %.2f samples/sec", sps)

        savers.flush()
        return {
            "vi_test_mean_dsc": float(np.mean(dscs)) if dscs else float("nan"),
            "vi_samples_per_sec": sps,
        }

    # ---------------------------------------------------------- MCMC phase
    def _run_mcmc_phase(self, fixed, moving, vi_state: VIState) -> dict:
        bundle = self.bundle
        no_voxels = float(np.prod(bundle.dims))
        tau = self.config.tau
        total = self.no_iters_burn_in + self.no_samples_mcmc

        mcmc = init_chains(
            bundle,
            jax.random.fold_in(vi_state.key, 202),
            no_chains=self.no_chains,
            mode=self.mcmc_init,
            q_v=vi_state.q_v if self.mcmc_init == "VI" else None,
            gmm=vi_state.gmm,
            reg=vi_state.reg,
            opt_gmm=self.opt_gmm,
            opt_reg=self.opt_reg,
            param_mode=self.mcmc_param_mode,
        )

        resume_meta = {}
        mcmc_resume = getattr(self, "_mcmc_resume", None)
        if mcmc_resume:
            # phase dispatch already happened in _run_pair; a structural
            # mismatch here is a user error (different dims / chain count),
            # so the ValueError propagates instead of silently starting fresh
            mcmc, resume_meta = load_checkpoint(mcmc_resume, mcmc)
            self.logger.info("resumed MCMC from %s at %s", mcmc_resume, resume_meta)
            # durable auto-recovery (VERDICT r3 #6): checkpoints record the
            # (possibly auto-escalated) block-gather radius; resuming at the
            # configured radius would re-abort and re-escalate from scratch
            ck_radius = int(resume_meta.get("block_radius", 0) or 0)
            if ck_radius > int(bundle.block_radius):
                self.logger.info(
                    "resume: restoring escalated trainer.block_warp.radius "
                    "%d from the checkpoint (configured: %d)",
                    ck_radius, bundle.block_radius)
                bundle = self.bundle = dataclasses.replace(
                    bundle, block_radius=ck_radius)

        # distribute over all attached devices (the reference's batch axis,
        # trainer.py:361-362, made multi-chip).  Default: chains shard over
        # a Mesh('chain') with the image pair replicated — zero cross-chain
        # collectives in the hot loop.  With ``spatial_shards: s`` > 1 the
        # mesh becomes ('chain', 'space') and fields also shard along D:
        # XLA's SPMD partitioner inserts the halo exchanges for every
        # stencil/warp in the training step (for volumes larger than one
        # device's HBM).  Single-device trajectories are bit-identical
        # either way (tests/test_parallel.py).
        self._mcmc_mesh = None
        chain_mesh = None  # set -> transition runs under shard_map('chain')
        spatial_gspmd = False
        n_dev = len(jax.devices())
        spatial = int(self.t_cfg.get("spatial_shards", 1))
        if (bool(self.t_cfg.get("distribute", True)) and n_dev > 1
                and self.mcmc_param_mode == "per_chain"):
            from .parallel import (
                make_mesh,
                shard_chain_state,
                shard_images_spatial,
                shard_state_spatial,
            )

            depth = int(self.bundle.dims[0])
            dense_fields = tuple(self.bundle.field_dims) == tuple(self.bundle.dims)
            if (spatial > 1 and n_dev % spatial == 0 and dense_fields
                    and depth % spatial == 0
                    and self.no_chains % (n_dev // spatial) == 0):
                self._mcmc_mesh = make_mesh((n_dev // spatial, spatial),
                                            axes=("chain", "space"))
                mcmc = shard_state_spatial(mcmc, self._mcmc_mesh,
                                           self.no_chains, depth)
                fixed = shard_images_spatial(fixed, self._mcmc_mesh, depth)
                moving = shard_images_spatial(moving, self._mcmc_mesh, depth)
                spatial_gspmd = True
                self.logger.info(
                    "distributing %d chains x %d spatial shards over %d devices",
                    self.no_chains, spatial, n_dev)
            elif self.no_chains % n_dev == 0:
                self._mcmc_mesh = make_mesh(n_dev, axes=("chain",))
                mcmc = shard_chain_state(mcmc, self._mcmc_mesh, self.no_chains)
                chain_mesh = self._mcmc_mesh
                self.logger.info("distributing %d chains over %d devices "
                                 "(shard_map)", self.no_chains, n_dev)

        # device-resident scan chunks are capped: chunks beyond ~200
        # transitions at 128^3 fault the TPU worker under the axon tunnel
        # (empirically bisected; chunk=200 is stable over 1000+ transitions)
        cap = int(self.t_cfg.get("max_device_chunk", 200))
        chunk_fns = {}

        def run_steps(mcmc, n):
            """Advance ``n`` transitions in capped device chunks.

            Prefers an already-compiled chunk length: a transition-scan
            compile is ~100 s at 128³, and shorter chunks also stay clear
            of the long-device-program degradation (scan_fault_probe).
            """
            ms = None
            while n > 0:
                compiled = [length for length in chunk_fns if length <= n]
                this = max(compiled) if compiled else min(cap, n)
                if this not in chunk_fns:
                    chunk_fns[this] = make_mcmc_chunk(
                        bundle, self.opt_gmm, self.opt_reg, tau, fixed,
                        moving, chunk=this, burn_in=self.no_iters_burn_in,
                        # posterior-accumulator thinning (reference
                        # collects every log_period_MCMC-th sample,
                        # trainer.py:420-429; default 1 = every post-burn-in
                        # sample feeds Welford — strictly more information)
                        thin=int(self.t_cfg.get("mcmc_thin", 1)),
                        param_mode=self.mcmc_param_mode,
                        chain_mesh=chain_mesh,
                        # anchored residual warping (engine/mcmc.py) is
                        # OFF by default: measured end-to-end, the per-step
                        # re-resampling of the anchor image attenuates
                        # voxel-scale texture, the residuals inherit the
                        # mismatch, the GMM widens to cover it and the
                        # flattened likelihood loses the registration
                        # (BASELINE.md round 3 — negative result); the fast
                        # exact path is the block-gather warp instead
                        anchored=bool(self.t_cfg.get("mcmc_anchor", False)),
                        anchor_radius=int(self.t_cfg.get("anchor_radius", 2)),
                        anchor_mode=str(self.t_cfg.get("anchor_mode",
                                                       "taylor")),
                        anchor_period=int(self.t_cfg.get("anchor_period",
                                                         25)))
                try:
                    mcmc, ms = chunk_fns[this](mcmc)
                except Exception as e:
                    if not self._try_pallas_fallback(e):
                        raise
                    chunk_fns.clear()
                    continue  # rebuild this chunk pure-XLA
                n -= this
            return mcmc, ms

        if spatial_gspmd:
            # the GSPMD-partitioned spatial path must not trace pallas_calls
            # (no sharding rule — the partitioner would all-gather full
            # volumes around each kernel, measured on the virtual mesh); the
            # XLA blend partitions with O(halo) collectives (compiled-HLO
            # audit, tests/test_parallel.py).  Trace-time state: covers every
            # jit traced during this phase, restored in the finally below.
            from .ops import resample

            resample.set_pallas_mode(False)

        eval_fn = jax.jit(jax.vmap(self._make_eval(fixed, moving)))
        fixed_seg_np = np.asarray(fixed["seg"])

        log_period = max(1, min(self.log_period_mcmc, total))
        summary = {}
        done = int(np.asarray(mcmc.step))
        t0 = time.perf_counter()

        def process(done_at, last_dev, outs, state):
            """Host-side work for one completed log period.

            Called AFTER the next device chunk has been dispatched: every
            array read here was produced by an already-finished chunk, so
            the EDT-based ASD, NIfTI savers, figures and the checkpoint
            overlap with device compute instead of serialising against it
            (measured 2x in-trainer MCMC throughput at 128³).  The
            diffeo/saturation guards consequently fire one log period after
            the offending chunk ran — same detection step and message, one
            extra (discarded) chunk of device work.
            """
            t_p0 = time.perf_counter()
            last = _host(last_dev)
            t_p1 = time.perf_counter()
            self.writer.set_step(done_at)
            for k in ("data_term", "reg_term", "vd_alpha", "reg_energy",
                      "ndv", "sat"):
                for c in range(self.no_chains):
                    self.writer.add_scalar(f"MCMC/{k}/chain_{c}",
                                           float(np.asarray(last[k])[c]))
            self._check_saturation(
                int(np.asarray(last["sat"]).max()),
                int(np.asarray(last["sat_resid"]).max()), done_at, "MCMC")

            # diffeomorphism guard — abort as the reference does
            # (trainer.py:441-445) when any chain folds at > tol voxels
            worst = int(np.asarray(last["ndv"]).max())
            if worst > self.ndv_tol * no_voxels:
                raise NonDiffeomorphicAbort(
                    f"chain transformation folded at {worst} voxels "
                    f"(> {self.ndv_tol:.1%} of {int(no_voxels)}) at step {done_at}"
                )

            if done_at >= total:
                # final-period quality at the SAME trajectory point every
                # execution path reaches (the speed test below advances the
                # chains further, so its state is not comparable across
                # sequential / pair-parallel runs)
                summary["mcmc_mean_dsc"] = float(np.asarray(outs["dsc"]).mean())
            t_p2 = time.perf_counter()
            post_burn_in = done_at > self.no_iters_burn_in
            # artifact saving fetches ~45 MB/chain over the tunnel — gated
            # on its own period so metric logging can stay frequent
            save_now = (post_burn_in and
                        ((done_at - self.no_iters_burn_in) % self.save_period_mcmc
                         < log_period or done_at >= total))
            for c in range(self.no_chains):
                out_c = jax.tree.map(lambda x: x[c], outs)
                self._log_seg_metrics(fixed_seg_np, out_c, "MCMC", chain=c,
                                      defer_asd=True)
                if save_now:
                    # visualisation volumes travel the tunnel as float16
                    # (half the bytes) and are fetched + written on the
                    # background writer thread; the figure render (another
                    # ~50 MB f32 fetch + matplotlib when done inline — the
                    # dominant per-period stall on a slow-tunnel host) rides
                    # the same thread off the SAME f16 buffers
                    im16 = out_c["im_warped"].astype(jnp.float16)
                    disp16 = out_c["displacement"].astype(jnp.float16)
                    ldj16 = out_c["log_det_J"].astype(jnp.float16)
                    savers.submit(lambda sn=done_at - self.no_iters_burn_in,
                                  im=im16, dp=disp16, ld=ldj16, cc=c:
                                  savers.save_sample(
                                      self.save_dirs, self.spacing, sn,
                                      im, dp, ld, "MCMC", chain_no=cc))
                    if self.writer.has_figures:
                        from .utils import figures

                        wb = self.writer.at_step()

                        def _sample_fig(wb=wb, im=im16, dp=disp16, ld=ldj16,
                                        cc=c):
                            wb.add_figure(
                                f"MCMC/sample/chain_{cc}",
                                figures.sample_grid(
                                    np.asarray(im, np.float32),
                                    np.asarray(dp, np.float32),
                                    np.asarray(ld, np.float32), chain_no=cc))

                        savers.submit(_sample_fig, droppable=True)
            t_p3 = time.perf_counter()
            self.logger.debug(
                "MCMC process %d: fetch-last %.2fs scalars+guards %.2fs "
                "chains %.2fs", done_at, t_p1 - t_p0, t_p2 - t_p1,
                t_p3 - t_p2)
            self.logger.info(
                "MCMC %d/%d data %s reg %s ndv %s",
                done_at, total,
                np.array2string(np.asarray(last["data_term"]), precision=1),
                np.array2string(np.asarray(last["reg_term"]), precision=1),
                np.asarray(last["ndv"]),
            )
            # ``state`` is the loop's own donation-safe snapshot (see
            # ``snap`` below) — no second device copy needed
            self._maybe_checkpoint(
                self.save_dirs["models"] / "mcmc_latest.npz", state,
                {"phase": "MCMC", "phase_done": 1, "mcmc_steps": done_at,
                 # the CURRENT radius (auto-escalation may have raised it) —
                 # restored on resume so recovery is durable (VERDICT r3 #6)
                 "block_radius": int(self.bundle.block_radius),
                 "config": self.config.name},
                force=done_at >= total, snapshotted=True,
            )

        pending = None
        last_good = None  # snapshot of the newest period that PASSED the guards
        skip_posterior = False
        # block-residual auto-recovery: the block-gather warp is exact only
        # while each voxel's displacement stays within ``block_warp.radius``
        # of its 8³-block mean — a bound on the field's in-block VARIATION.
        # At equilibrium the SGLD posterior is rougher than the smooth VI
        # mode it starts from, and at some registration tasks (2 of 4 GT
        # draws in BASELINE.md round 3's across-phantom table) the sample
        # roughness crosses radius 2 — measured PHYSICAL, not a clamp
        # artifact: a near-exact radius-3 run's samples exceed radius 2 at
        # ~1% of voxels (plateauing), while |r| > 3 stays at 0.01%.  So on
        # a saturation abort whose binding counter is the residual one, bump
        # the radius (kernel cap 4), rebuild the step functions and resume
        # from the last clean snapshot — smooth tasks keep radius-2 speed,
        # rough tasks complete at radius 3 (~10% slower) instead of dying.
        # The escalated radius is persisted in checkpoint meta and restored
        # on resume (VERDICT r3 #6 — durable recovery).
        auto_escalate = bool(
            self.t_cfg.get("block_warp", {}).get("auto_escalate", True))
        try:
            while True:
                try:
                    while done < total:
                        this = min(log_period, total - done)
                        t_a = time.perf_counter()
                        mcmc, ms = run_steps(mcmc, this)  # async dispatch
                        done += this
                        # device-side copy: the live state's buffers are
                        # DONATED to the next chunk, so the deferred
                        # checkpoint needs its own
                        snap = jax.tree.map(jnp.copy, mcmc)
                        t_b = time.perf_counter()
                        ev = eval_fn(mcmc.v)
                        nxt = (done, _last(ms), ev, snap)
                        t_c = time.perf_counter()
                        if pending is not None:
                            process(*pending)
                            last_good = pending[3]
                        else:
                            # first period: the pipeline isn't established
                            # yet, so a blocking sync here costs nothing —
                            # record the device cost of chunk+copy+eval
                            # (the quantity every later fetch-behind-the-
                            # queue wait is bounded by on the axon tunnel)
                            float(np.asarray(ev["dsc"]).sum())
                            self.logger.debug(
                                "MCMC first period: chunk+copy+eval device "
                                "wall %.2fs", time.perf_counter() - t_b)
                            t_e = time.perf_counter()
                            float(np.asarray(
                                eval_fn(mcmc.v)["dsc"]).sum())
                            self.logger.debug(
                                "MCMC eval alone (compiled): %.2fs",
                                time.perf_counter() - t_e)
                        self.logger.debug(
                            "MCMC period %d: dispatch %.2fs eval-dispatch "
                            "%.2fs process %.2fs", done, t_b - t_a,
                            t_c - t_b, time.perf_counter() - t_c)
                        pending = nxt
                    if pending is not None:  # None when resuming a finished phase
                        process(*pending)
                        last_good = pending[3]
                        pending = None
                    break
                except DisplacementSaturationAbort as e:
                    resid_binding = (getattr(e, "sat_resid", 0)
                                     > self.sat_tol * no_voxels)
                    can_escalate = (
                        auto_escalate and resid_binding
                        and last_good is not None
                        and bundle.block_radius < 4
                        and getattr(bundle, "noise_scheme", "pre") == "post"
                        and bundle.block_warp
                        and not getattr(bundle.transformation, "use_gather",
                                        False)
                        and not bool(self.t_cfg.get("mcmc_anchor", False)))
                    if not can_escalate:
                        raise
                    new_r = bundle.block_radius + 1
                    resume_step = int(np.asarray(last_good.step))
                    self.logger.warning(
                        "MCMC auto-recovery: %s — escalating trainer.block_"
                        "warp.radius %d -> %d and resuming from the last "
                        "clean period (step %d)",
                        e, bundle.block_radius, new_r, resume_step)
                    bundle = self.bundle = dataclasses.replace(
                        bundle, block_radius=new_r)
                    summary.setdefault("block_radius_escalations", []).append(
                        {"step": resume_step, "radius": new_r})
                    chunk_fns.clear()  # they close over the old radius
                    mcmc = last_good
                    done = resume_step
                    pending = None
        except TrainerAbort as e:
            self.logger.error("MCMC aborted: %s", e)
            summary["mcmc_aborted"] = str(e)
            # the deferred pipeline means the live state is one chunk PAST
            # the period whose guard fired; roll the saved posterior back to
            # the newest snapshot that passed every guard so aborted-run
            # artifacts contain no samples from the violating trajectory
            # (the reference stops accumulating at the failed check,
            # trainer.py:441-445) — ADVICE r2.  With no clean period at all,
            # the welford count gate below skips the save entirely.
            mcmc = last_good if last_good is not None else mcmc
            if last_good is None:
                summary["mcmc_no_clean_period"] = True
                skip_posterior = True
        finally:
            # timing + posterior statistics are valid whatever happened so
            # far (trainer.py:455-465); everything that *advances the
            # chains* (speed test) or reports quality for the final state
            # is gated on clean completion below — continuing to sample
            # from a state that just violated the fold guard would mask the
            # failure with extra work
            summary["mcmc_time_s"] = time.perf_counter() - t0
            if (not skip_posterior
                    and float(np.asarray(mcmc.welford.count).sum()) > 1):
                mean, std = posterior_statistics(mcmc)
                savers.save_displacement_mean_and_std_dev(
                    self.save_dirs, self.spacing, np.asarray(mean),
                    np.asarray(std), np.asarray(fixed["mask"]), "MCMC")
            savers.flush()  # all queued sample dumps + checkpoints on disk
            if spatial_gspmd:
                from .ops import resample

                resample.set_pallas_mode(None)

        if "mcmc_aborted" not in summary:
            # MCMC speed test (trainer.py:467-476).  Reuses the already-
            # compiled run_steps chunks: a dedicated chunk of length
            # speed_test_iters would recompile the whole transition scan
            # (~100 s at 128³) just for the timer.  The chains are past
            # burn-in, so the timed transitions exercise the identical
            # sampling path.  The pallas-off trace state must be re-engaged
            # here: run_steps can still compile a NEW chunk length for a
            # residue (e.g. compiled={125}, iters leaves n=5) and the finally
            # above already restored the mode — tracing a pallas_call into a
            # GSPMD-partitioned graph has no sharding rule.
            if spatial_gspmd:
                from .ops import resample

                resample.set_pallas_mode(False)
            try:
                lengths = sorted(chunk_fns)
                iters = self.speed_test_iters
                if lengths and iters < lengths[0]:
                    iters = lengths[0]  # no shorter compiled chunk — round up
                # host sync via a DEVICE-side reduction: np.asarray(v)
                # would drag the full 50 MB chain state through the ~10 MB/s
                # tunnel (~5 s — half the timed window at 128³), reading as
                # a phantom 35% in-trainer throughput loss vs bench.py
                mcmc, _ = run_steps(mcmc, iters)  # warm lengths
                _ = float(jnp.sum(mcmc.v))
                t1 = time.perf_counter()
                mcmc, _ = run_steps(mcmc, iters)
                _ = float(jnp.sum(mcmc.v))
                dt = time.perf_counter() - t1
                sps = self.no_chains * iters / dt
                self.logger.info("MCMC sampling speed: %.2f samples/sec", sps)
                summary["mcmc_samples_per_sec"] = sps
            finally:
                if spatial_gspmd:
                    resample.set_pallas_mode(None)
        return summary
