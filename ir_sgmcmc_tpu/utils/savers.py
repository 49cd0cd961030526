"""Structured artifact savers (NIfTI images, VTK fields).

Host-side equivalents of /root/reference/logger/logger.py:110-238: fixed and
moving images/masks, per-sample warped images + displacements + log|J|
(``chain_i_sample_%07d_*`` naming), the variational-posterior mean, and
masked/unmasked displacement mean / std-dev uncertainty maps.

Artifact dumps run on a single background writer thread (``submit`` /
``flush``): the device→host fetch of ~45 MB/chain of sample volumes was the
dominant per-period host cost at 128³ over the ~10 MB/s axon tunnel, and the
main loop only needs to *dispatch* the save, not wait for the bytes.  The
worker performs the fetch (device buffers passed in are never donated — the
trainer snapshots donation-exposed state first), so the main thread returns
to driving device chunks immediately.
"""

from __future__ import annotations

import logging
import queue
import threading
from pathlib import Path

import numpy as np

from .nifti import write_nifti
from .vtk_io import write_vtk_field

_log = logging.getLogger(__name__)


def _np(x):
    x = np.asarray(x)
    # visualisation artifacts may arrive as float16 (halved tunnel bytes);
    # writers expect float32
    return x.astype(np.float32) if x.dtype == np.float16 else x


class _Writer:
    """One background thread draining a queue of save closures."""

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

    def _ensure(self):
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._run, name="artifact-writer", daemon=True)
                self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                fn()
            except Exception:  # never kill the writer on one bad artifact
                _log.exception("artifact save failed")
            finally:
                self._q.task_done()

    def submit(self, fn, droppable: bool = False):
        self._ensure()
        # ADVICE r4: deferred figure/eval closures hold live device buffers
        # (tens of MB f16 per period at 128³), and the queue is unbounded —
        # a slow tunnel with a short log period could pin device memory
        # with no backpressure until the phase-end flush.  Purely-visual
        # work is marked droppable and skipped (counted) once the backlog
        # is deep; required artifacts (checkpoints, samples, metrics) still
        # queue unconditionally.
        if droppable and self._q.qsize() >= self.DROP_DEPTH:
            self.dropped += 1
            if self.dropped in (1, 10, 100):
                _log.warning(
                    "artifact-writer backlog >= %d: dropped %d droppable "
                    "figure submission(s) to avoid pinning device memory",
                    self.DROP_DEPTH, self.dropped)
            return
        self._q.put(fn)

    DROP_DEPTH = 8
    dropped = 0

    def flush(self):
        """Block until every queued save has been written."""
        self._q.join()


_WRITER = _Writer()


def submit(fn, droppable: bool = False) -> None:
    """Queue ``fn()`` on the background artifact-writer thread.

    ``droppable=True`` marks best-effort visual work (figures) that may be
    skipped when the writer backlog is deep — see ``_Writer.submit``."""
    _WRITER.submit(fn, droppable=droppable)


def flush() -> None:
    """Wait for all queued artifact writes (phase boundaries, test exits)."""
    _WRITER.flush()


def _im_path(save_dirs, name):
    return Path(save_dirs["images"]) / f"{name}.nii.gz"


def save_fixed_im(save_dirs, spacing, im):
    write_nifti(_im_path(save_dirs, "im_fixed"), _np(im).squeeze(), spacing)


def save_moving_im(save_dirs, spacing, im):
    write_nifti(_im_path(save_dirs, "im_moving"), _np(im).squeeze(), spacing)


def save_fixed_mask(save_dirs, spacing, mask):
    write_nifti(_im_path(save_dirs, "mask_fixed"), _np(mask).squeeze().astype(np.uint8), spacing)


def save_moving_mask(save_dirs, spacing, mask):
    write_nifti(_im_path(save_dirs, "mask_moving"), _np(mask).squeeze().astype(np.uint8), spacing)


def save_sample(save_dirs, spacing, sample_no, im_warped, displacement, log_det_J, model: str, chain_no=None):
    """Per-sample dump: warped image, displacement field, log|J| map.

    ``model`` is ``'VI'`` or ``'MCMC'``; MCMC samples carry a chain prefix.
    """
    samples_dir = Path(save_dirs["samples"]) / model
    samples_dir.mkdir(parents=True, exist_ok=True)
    prefix = f"chain_{chain_no}_" if chain_no is not None else ""
    name = f"{prefix}sample_{int(sample_no):07d}"

    im = _np(im_warped)
    disp = _np(displacement)
    ldj = _np(log_det_J)
    if chain_no is not None and im.ndim == 4:
        im, disp, ldj = im[chain_no], disp[chain_no], ldj[chain_no]

    write_nifti(samples_dir / f"{name}_im_warped.nii.gz", im.squeeze(), spacing)
    write_nifti(samples_dir / f"{name}_log_det_J.nii.gz", np.nan_to_num(ldj).squeeze(), spacing)
    write_vtk_field(samples_dir / f"{name}_displacement.vtk", disp, spacing)


def save_variational_posterior_mean(save_dirs, spacing, im_warped, displacement):
    write_nifti(_im_path(save_dirs, "im_moving_warped_mu_v"), _np(im_warped).squeeze(), spacing)
    write_vtk_field(Path(save_dirs["fields"]) / "displacement_mu_v.vtk", _np(displacement).squeeze(), spacing)


def save_displacement_mean_and_std_dev(save_dirs, spacing, mean, std_dev, mask, model: str):
    """Posterior mean + per-voxel std-dev maps, masked and unmasked."""
    fields = Path(save_dirs["fields"])
    mean = _np(mean)
    std = _np(std_dev)
    m = _np(mask).squeeze().astype(bool)

    write_vtk_field(fields / f"{model}_displacement_mean.vtk", mean, spacing)
    write_vtk_field(fields / f"{model}_displacement_std_dev.vtk", std, spacing)
    write_vtk_field(fields / f"{model}_displacement_mean_masked.vtk", mean * m, spacing)
    write_vtk_field(fields / f"{model}_displacement_std_dev_masked.vtk", std * m, spacing)

    # scalar uncertainty magnitude as NIfTI for viewers
    write_nifti(fields / f"{model}_uncertainty_norm.nii.gz", np.linalg.norm(std, axis=0), spacing)
