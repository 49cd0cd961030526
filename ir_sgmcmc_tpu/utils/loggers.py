"""Logging and experiment tracking.

Three channels, mirroring the reference's observability stack (SURVEY.md
§5.5):
1. python logging (console + rotating file) — logger/logger.py:13-32;
2. scalar/figure tracking via a TensorBoard facade that degrades to a JSONL
   event log when tensorboard isn't importable — logger/visualization.py:12-55;
3. artifact savers (NIfTI/VTK) live in ``savers.py``.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import time
from pathlib import Path


def setup_logging(log_dir, verbosity: int = 2, name: str = "ir_sgmcmc_tpu"):
    """Console + rotating-file logging; verbosity 0/1/2 -> WARN/INFO/DEBUG."""
    levels = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}
    level = levels.get(int(verbosity), logging.INFO)

    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()

    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)

    if log_dir is not None:
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            log_dir / "info.log", maxBytes=10_000_000, backupCount=5
        )
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class ScalarWriter:
    """TensorBoard-compatible scalar/figure writer with a JSONL fallback.

    API subset of the reference's TensorboardWriter facade
    (logger/visualization.py:12-55): ``set_step``, ``add_scalar``,
    ``add_figure``, ``add_histogram``.
    """

    def __init__(self, log_dir, enabled: bool = True):
        self.step = 0
        # tag namespace, e.g. "pair1/" — pair-parallel runs reuse the same
        # phase tags ("VI/...", "MCMC/...") per pair and would collide
        self.prefix = ""
        self._tb = None
        self._jsonl = None
        if not enabled or log_dir is None:
            return
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(log_dir))
        except Exception:
            self._jsonl = open(log_dir / "events.jsonl", "a", buffering=1)

    @property
    def has_figures(self) -> bool:
        """True when figures will actually be recorded (TensorBoard backend)."""
        return self._tb is not None

    def set_step(self, step: int):
        self.step = int(step)

    def add_scalar(self, tag, value):
        tag = self.prefix + tag
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), self.step)
        elif self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"t": time.time(), "step": self.step, "tag": tag, "value": float(value)})
                + "\n"
            )

    def add_figure(self, tag, figure):
        tag = self.prefix + tag
        if self._tb is not None:
            self._tb.add_figure(tag, figure, self.step)
        else:
            self._warn_figures_dropped()

    def add_histogram(self, tag, values):
        tag = self.prefix + tag
        if self._tb is not None:
            self._tb.add_histogram(tag, values, self.step)
        else:
            self._warn_figures_dropped()

    def _warn_figures_dropped(self):
        # one-time notice: the JSONL fallback records scalars/text only
        if not getattr(self, "_figures_warned", False):
            self._figures_warned = True
            logging.getLogger("ir_sgmcmc_tpu").warning(
                "tensorboard is not available: figures/histograms are being "
                "discarded (scalars still go to events.jsonl)"
            )

    def add_text(self, tag, text):
        tag = self.prefix + tag
        if self._tb is not None:
            self._tb.add_text(tag, text, self.step)
        elif self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"t": time.time(), "step": self.step, "tag": tag, "text": text}) + "\n"
            )

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
