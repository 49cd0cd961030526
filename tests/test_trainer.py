"""End-to-end trainer tests on a synthetic pair (tiny grid, few iterations).

Covers the orchestration layer the reference leaves untested (SURVEY.md §4):
config parsing, both phases, artifact emission, the diffeomorphism guard
wiring, and checkpoint/resume.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from ir_sgmcmc_tpu.config import Config
from ir_sgmcmc_tpu.trainer import Trainer
from ir_sgmcmc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _demo_cfg(tmp_path, **trainer_overrides):
    cfg = json.loads(
        (Path(__file__).parent.parent / "configs/demo/config_synthetic.json").read_text()
    )
    cfg["data_loader"]["args"]["dims"] = [12, 12, 12]
    cfg["transformation_module"]["args"] = {"no_steps": 6, "max_disp": 4}
    cfg["trainer"].update(
        save_dir=str(tmp_path),
        no_iters_VI=8,
        log_period_VI=4,
        no_samples_VI_test=3,
        no_chains=2,
        no_iters_burn_in=3,
        no_samples_MCMC=5,
        log_period_MCMC=4,
        speed_test_iters=2,
        tensorboard=False,
    )
    cfg["trainer"].update(trainer_overrides)
    return Config(cfg, run_id="test")


def test_trainer_end_to_end(tmp_path):
    config = _demo_cfg(tmp_path)
    trainer = Trainer(config)
    summaries = trainer.run()

    assert len(summaries) == 1
    s = summaries[0]
    assert np.isfinite(s["vi_time_s"])
    assert s["vi_samples_per_sec"] > 0
    assert s["mcmc_samples_per_sec"] > 0
    assert "mcmc_aborted" not in s
    # registration should not damage alignment on a translated sphere
    assert s["vi_test_mean_dsc"] >= s["dsc_before"] - 0.05

    run_dir = config.dir
    assert (run_dir / "images/im_fixed.nii.gz").exists()
    assert (run_dir / "fields/VI_displacement_mean.vtk").exists()
    assert (run_dir / "fields/MCMC_displacement_std_dev.vtk").exists()
    assert (run_dir / "models/vi_latest.npz").exists()
    assert (run_dir / "models/mcmc_latest.npz").exists()
    assert list((run_dir / "samples/VI").glob("sample_*_im_warped.nii.gz"))
    assert list((run_dir / "samples/MCMC").glob("chain_*_im_warped.nii.gz"))


def test_trainer_mcmc_cold_start(tmp_path):
    config = _demo_cfg(tmp_path, VI=False, MCMC=True, MCMC_init="noise",
                       no_samples_MCMC=4, no_iters_burn_in=2)
    summaries = Trainer(config).run()
    assert summaries[0]["mcmc_samples_per_sec"] > 0


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b": {"c": np.ones(4, np.int32)},
    }
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, state, {"phase_done": 1, "step": 42})
    like = {"a": np.zeros((2, 3), np.float32), "b": {"c": np.zeros(4, np.int32)}}
    restored, meta = load_checkpoint(path, like)
    assert meta["phase_done"] == 1 and meta["step"] == 42
    assert meta["format_version"] == 2
    np.testing.assert_array_equal(np.asarray(restored["a"]), state["a"])
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), state["b"]["c"])

    bad = {"a": np.zeros((3, 2), np.float32), "b": {"c": np.zeros(4, np.int32)}}
    with pytest.raises(ValueError):
        load_checkpoint(path, bad)


def test_checkpoint_rejects_renamed_or_reordered_leaves(tmp_path):
    """v2 checkpoints key leaves by pytree path: a template whose leaf
    *names* differ is rejected even when every shape coincides (the failure
    mode of the old positional format — e.g. a ``mu``/``u`` swap loads
    cleanly by shape)."""
    state = {"mu": np.zeros((3, 4), np.float32), "u": np.ones((3, 4), np.float32)}
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, state, {"phase": "VI"})

    renamed = {"mu_v": np.zeros((3, 4), np.float32), "u": np.ones((3, 4), np.float32)}
    with pytest.raises(ValueError, match="missing keys"):
        load_checkpoint(path, renamed)

    # NamedTuple field reorder: same shapes, positionally loadable, but the
    # paths disagree -> rejected
    import collections

    A = collections.namedtuple("A", ["mu", "u"])
    B = collections.namedtuple("B", ["u", "mu"])
    save_checkpoint(path, A(np.zeros((2, 2), np.float32), np.ones((2, 2), np.float32)))
    restored, _ = load_checkpoint(path, B(np.zeros((2, 2)), np.zeros((2, 2))))
    # path-keyed: each field gets ITS value back regardless of position
    np.testing.assert_array_equal(np.asarray(restored.mu), np.zeros((2, 2)))
    np.testing.assert_array_equal(np.asarray(restored.u), np.ones((2, 2)))


def test_resume_unknown_phase_rejected(tmp_path):
    """A checkpoint whose metadata names no phase is refused, not guessed."""
    state = {"x": np.zeros(3, np.float32)}
    ckpt = tmp_path / "mystery.npz"
    save_checkpoint(ckpt, state, {})
    config = _demo_cfg(tmp_path / "run", MCMC=False, no_samples_VI_test=0)
    with pytest.raises(ValueError, match="neither the VI nor the MCMC phase"):
        Trainer(config, resume=str(ckpt)).run()


def test_vi_resume(tmp_path):
    config = _demo_cfg(tmp_path, MCMC=False, no_samples_VI_test=0)
    trainer = Trainer(config)
    trainer.run()
    ckpt = config.save_dirs["models"] / "vi_latest.npz"
    assert ckpt.exists()

    config2 = _demo_cfg(tmp_path / "resumed")
    config2.cfg["trainer"]["MCMC"] = False
    config2.cfg["trainer"]["no_samples_VI_test"] = 0
    trainer2 = Trainer(config2, resume=str(ckpt))
    summaries = trainer2.run()
    # resumed run starts at vi_iters=8 == no_iters_VI, so the VI loop is a no-op
    assert summaries[0]["vi_time_s"] < 30.0


def test_mcmc_saturation_guard(tmp_path):
    """Displacements beyond the bounded-warp ``max_disp`` trip the
    saturation abort instead of silently clamping (VERDICT round-1 weak #4)."""
    import jax
    import jax.numpy as jnp

    from ir_sgmcmc_tpu.engine import VIState

    config = _demo_cfg(tmp_path, VI=False, MCMC=True, MCMC_init="VI",
                       no_iters_burn_in=0, no_samples_MCMC=2,
                       log_period_MCMC=1, no_samples_VI_test=0,
                       speed_test_iters=1)
    config.cfg["transformation_module"]["args"] = {"no_steps": 6, "max_disp": 2}
    trainer = Trainer(config)
    trainer.save_dirs = config.save_dirs

    fixed_np, moving_np, q_v0 = trainer.dataset[0]
    fixed = {k: jnp.asarray(v) for k, v in fixed_np.items()}
    moving = {k: jnp.asarray(v) for k, v in moving_np.items()}
    # VI posterior centred on a 6-voxel translation: far beyond max_disp=2,
    # fold-free (so the diffeo guard stays quiet), but clamped by the warp
    q_v = {
        "mu": jnp.full(np.asarray(q_v0["mu"]).shape, 6.0, jnp.float32),
        "log_var": jnp.full(np.asarray(q_v0["log_var"]).shape, -20.0, jnp.float32),
        "u": jnp.zeros(np.asarray(q_v0["u"]).shape, jnp.float32),
    }
    state = VIState(
        q_v=q_v, gmm=trainer.bundle.gmm.init_params(),
        reg=trainer.bundle.reg_loss.init_params(),
        opt_q_v=trainer.opt_q_v.init(q_v),
        opt_gmm=trainer.opt_gmm.init(trainer.bundle.gmm.init_params()),
        opt_reg=trainer.opt_reg.init(trainer.bundle.reg_loss.init_params()),
        key=jax.random.PRNGKey(0), step=jnp.zeros((), jnp.int32),
    )
    summary = trainer._run_mcmc_phase(fixed, moving, state)
    assert "saturat" in summary.get("mcmc_aborted", "")
    assert "mcmc_mean_dsc" not in summary  # no quality report after an abort


def test_mcmc_block_residual_auto_escalation(tmp_path):
    """A saturation abort whose binding counter is the block-residual one
    triggers auto-recovery: the trainer bumps block_warp.radius, rebuilds
    the step functions and resumes from the last clean snapshot, and the
    phase COMPLETES (the posterior roughness that trips radius 2 is
    physical at some tasks — BASELINE.md round 3 across-phantom table)."""
    import jax
    import jax.numpy as jnp

    from ir_sgmcmc_tpu.engine import VIState
    from ir_sgmcmc_tpu.trainer import DisplacementSaturationAbort

    config = _demo_cfg(tmp_path, VI=False, MCMC=True, MCMC_init="VI",
                       no_iters_burn_in=0, no_samples_MCMC=4,
                       log_period_MCMC=1, no_samples_VI_test=0,
                       speed_test_iters=1)
    trainer = Trainer(config)
    trainer.save_dirs = config.save_dirs

    real_check = trainer._check_saturation
    fired = {"n": 0}

    def fake_check(sat, sat_resid, step, phase):
        # force ONE block-residual abort once a clean period exists
        if phase == "MCMC" and step >= 2 and fired["n"] == 0:
            fired["n"] = 1
            err = DisplacementSaturationAbort("forced block-residual overflow")
            err.sat = err.sat_resid = 10_000_000
            raise err
        return real_check(sat, sat_resid, step, phase)

    trainer._check_saturation = fake_check

    fixed_np, moving_np, q_v0 = trainer.dataset[0]
    fixed = {k: jnp.asarray(v) for k, v in fixed_np.items()}
    moving = {k: jnp.asarray(v) for k, v in moving_np.items()}
    q_v = {
        "mu": jnp.zeros(np.asarray(q_v0["mu"]).shape, jnp.float32),
        "log_var": jnp.full(np.asarray(q_v0["log_var"]).shape, -20.0,
                            jnp.float32),
        "u": jnp.zeros(np.asarray(q_v0["u"]).shape, jnp.float32),
    }
    state = VIState(
        q_v=q_v, gmm=trainer.bundle.gmm.init_params(),
        reg=trainer.bundle.reg_loss.init_params(),
        opt_q_v=trainer.opt_q_v.init(q_v),
        opt_gmm=trainer.opt_gmm.init(trainer.bundle.gmm.init_params()),
        opt_reg=trainer.opt_reg.init(trainer.bundle.reg_loss.init_params()),
        key=jax.random.PRNGKey(0), step=jnp.zeros((), jnp.int32),
    )
    summary = trainer._run_mcmc_phase(fixed, moving, state)
    assert "mcmc_aborted" not in summary
    assert fired["n"] == 1
    esc = summary["block_radius_escalations"]
    assert esc and esc[0]["radius"] == 3
    assert trainer.bundle.block_radius == 3
    assert "mcmc_mean_dsc" in summary  # the phase ran to completion


def test_saturation_guard_names_the_binding_lever(tmp_path):
    """The guard message names the lever of the counter that tripped: the
    displacement clamp bound (max_disp) vs the block-gather warp's in-block
    residual radius (block_warp.radius) — raising max_disp does NOT move
    the latter (measured: the phantom-seed-2 128³ run clamped ~3k voxels at
    max_disp=8 AND at 16, BASELINE.md round 3)."""
    import pytest

    from ir_sgmcmc_tpu.trainer import DisplacementSaturationAbort

    config = _demo_cfg(tmp_path)
    trainer = Trainer(config)

    # displacement-bound-only overflow -> max_disp lever, no radius talk
    with pytest.raises(DisplacementSaturationAbort) as e:
        trainer._check_saturation(sat=10_000, sat_resid=0, step=1,
                                  phase="MCMC")
    assert "max_disp" in str(e.value)
    assert "block_warp.radius" not in str(e.value)

    # block-residual overflow -> block_warp.radius lever, and the message
    # must warn that max_disp is not the lever for this counter
    with pytest.raises(DisplacementSaturationAbort) as e:
        trainer._check_saturation(sat=10_000, sat_resid=10_000, step=1,
                                  phase="MCMC")
    msg = str(e.value)
    assert "block_warp.radius" in msg and "in-block" in msg
    assert "raising max_disp does not help" in msg


def test_config_overrides(tmp_path):
    cfg_path = Path(__file__).parent.parent / "configs/demo/config_synthetic.json"
    config = Config.from_file(
        cfg_path, overrides={"trainer;no_iters_VI": 7, "trainer;save_dir": str(tmp_path)},
        make_dirs=False,
    )
    assert config["trainer"]["no_iters_VI"] == 7


def test_multi_pair_artifact_isolation(tmp_path):
    """Two moving volumes -> two pairs; artifacts land in separate trees."""
    from ir_sgmcmc_tpu.utils.nifti import write_nifti

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    (data / "masks").mkdir(parents=True)
    (data / "segs").mkdir()
    for i in range(3):
        write_nifti(data / f"s{i}.nii.gz", rng.random((10, 10, 10)).astype(np.float32))
        write_nifti(data / "masks" / f"s{i}.nii.gz", np.ones((10, 10, 10), np.uint8))
        write_nifti(data / "segs" / f"s{i}.nii.gz",
                    (rng.random((10, 10, 10)) > 0.5).astype(np.int16))

    config = _demo_cfg(tmp_path / "runs", MCMC=False, no_iters_VI=2,
                       log_period_VI=2, no_samples_VI_test=0)
    config.cfg["data_loader"] = {
        "type": "BiobankDataLoader",
        "args": {"data_dir": str(data), "dims": [8, 8, 8],
                 "sigma_v_init": 0.5, "u_v_init": 0.1},
    }
    # seg labels are binary here; restrict the metric universe
    trainer = Trainer(config)
    trainer.structures = {"fg": 1}
    summaries = trainer.run()
    assert len(summaries) == 2
    assert (config.dir / "images/im_fixed.nii.gz").exists()
    assert (config.dir / "pair_1/images/im_fixed.nii.gz").exists()


def test_mcmc_checkpoint_resume(tmp_path):
    """Resuming from an MCMC-phase checkpoint restores the chain state.

    ``non_diffeomorphic_tolerance`` is raised for the tiny volume: at 12³
    the default 0.1% is under 2 voxels, and rough noise-init chains fold
    1-2 boundary voxels under ANY approximate integrator (the split
    default's cross-term tips exactly 2 here) — a guard-denominator
    artifact, not what this test checks.
    """
    config = _demo_cfg(tmp_path, VI=False, MCMC=True, MCMC_init="noise",
                       no_iters_burn_in=2, no_samples_MCMC=6, log_period_MCMC=4,
                       no_samples_VI_test=0, non_diffeomorphic_tolerance=0.005)
    Trainer(config).run()
    ckpt = config.save_dirs["models"] / "mcmc_latest.npz"
    assert ckpt.exists()

    config2 = _demo_cfg(tmp_path / "resumed", VI=False, MCMC=True,
                        MCMC_init="noise", no_iters_burn_in=2,
                        no_samples_MCMC=6, log_period_MCMC=4,
                        no_samples_VI_test=0,
                        non_diffeomorphic_tolerance=0.005)
    summaries = Trainer(config2, resume=str(ckpt)).run()
    # resumed at step 8 == burn_in + samples: the sampling loop is a no-op,
    # only the final statistics and speed test run
    assert summaries[0]["mcmc_samples_per_sec"] > 0


def test_checkpoint_time_gating_and_save_period(tmp_path):
    """Cadence throttles: mid-phase checkpoints respect checkpoint_period_s
    (phase boundaries always write), and save_period_MCMC decouples the
    artifact dumps from the metric log period."""
    config = _demo_cfg(
        tmp_path,
        no_iters_burn_in=0,
        no_samples_MCMC=8,
        log_period_MCMC=2,
        save_period_MCMC=4,
        checkpoint_period_s=10_000.0,  # only the forced phase-end writes
    )
    trainer = Trainer(config)
    summaries = trainer.run()
    assert "mcmc_aborted" not in summaries[0]

    run_dir = config.dir
    # phase-end checkpoints exist despite the huge gating period
    assert (run_dir / "models/vi_latest.npz").exists()
    mcmc_ckpt = run_dir / "models/mcmc_latest.npz"
    assert mcmc_ckpt.exists()
    from ir_sgmcmc_tpu.utils.checkpoint import peek_meta

    assert peek_meta(mcmc_ckpt)["mcmc_steps"] == 8

    # artifacts only at multiples of save_period (4, 8) + the final period,
    # not at every log period (2, 6 absent)
    steps = sorted({
        int(p.name.split("_")[3])
        for p in (run_dir / "samples/MCMC").glob("chain_*_im_warped.nii.gz")
    })
    assert steps == [4, 8], steps


def test_mcmc_resume_restores_escalated_radius(tmp_path):
    """Durable auto-recovery (VERDICT r3 #6): a checkpoint whose meta
    records an escalated ``block_warp.radius`` resumes at that radius
    instead of re-aborting and re-escalating from the configured one."""
    config = _demo_cfg(tmp_path, VI=False, MCMC=True, MCMC_init="noise",
                       no_iters_burn_in=2, no_samples_MCMC=6, log_period_MCMC=4,
                       no_samples_VI_test=0, non_diffeomorphic_tolerance=0.005)
    Trainer(config).run()
    ckpt = config.save_dirs["models"] / "mcmc_latest.npz"
    # meta written by the trainer records the CURRENT radius
    from ir_sgmcmc_tpu.utils.checkpoint import peek_meta

    assert peek_meta(ckpt).get("block_radius") == 2

    # simulate a run that escalated to radius 3 before checkpointing
    with np.load(ckpt) as a:
        payload = {k: a[k] for k in a.files}
    meta = json.loads(bytes(payload["__meta__"]).decode())
    meta["block_radius"] = 3
    payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    esc = tmp_path / "escalated.npz"
    with open(esc, "wb") as f:
        np.savez(f, **payload)

    # resume with MORE samples so the loop actually advances (and writes
    # its own checkpoint, which must carry the radius forward)
    config2 = _demo_cfg(tmp_path / "resumed", VI=False, MCMC=True,
                        MCMC_init="noise", no_iters_burn_in=2,
                        no_samples_MCMC=10, log_period_MCMC=4,
                        no_samples_VI_test=0,
                        non_diffeomorphic_tolerance=0.005)
    t2 = Trainer(config2, resume=str(esc))
    t2.run()
    assert t2.bundle.block_radius == 3
    ckpt2 = config2.save_dirs["models"] / "mcmc_latest.npz"
    assert peek_meta(ckpt2).get("block_radius") == 3


def test_pallas_fallback_disables_kernels_once(tmp_path):
    """ADVICE r3: a Mosaic/pallas compile failure flips the run to the
    pure-XLA path exactly once; unrelated errors are not swallowed."""
    from ir_sgmcmc_tpu.ops import resample
    from ir_sgmcmc_tpu.trainer import _is_pallas_failure

    assert _is_pallas_failure(RuntimeError("Mosaic lowering failed: ..."))
    assert _is_pallas_failure(RuntimeError("tpu_custom_call: INTERNAL"))
    assert not _is_pallas_failure(ValueError("shape mismatch (3, 4)"))

    config = _demo_cfg(tmp_path)
    t = Trainer(config)
    try:
        assert t._try_pallas_fallback(RuntimeError("pallas_call failed"))
        assert t._pallas_disabled
        # second failure: no silent retry loop — caller re-raises
        assert not t._try_pallas_fallback(RuntimeError("pallas_call failed"))
        assert not t._try_pallas_fallback(ValueError("unrelated"))
    finally:
        resample.set_pallas_mode(None)
