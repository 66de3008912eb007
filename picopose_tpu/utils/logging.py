"""Training observability: file+console logger, windowed loss averaging,
TensorBoard writer.

Equivalent of utils/logging.py (get_logger :20-48, MyPrintingCallback
:50-156) and utils/log_buffer.py (LogBuffer/HistoryBuffer :9-144): per-stage
losses averaged over the print window, epoch summaries with wall time, lr.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict, deque


def get_logger(log_dir: str, name: str = "picopose_tpu") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    # one logger per log dir — a process may train several versions (and the
    # test suite certainly does); a dir-less cache would keep writing the
    # first run's file
    logger = logging.getLogger(f"{name}.{abs(hash(os.path.abspath(log_dir)))}")
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("[%(asctime)s] %(message)s", "%m-%d %H:%M:%S")
    for h in (
        logging.FileHandler(os.path.join(log_dir, "training_logger.log")),
        logging.StreamHandler(),
    ):
        h.setFormatter(fmt)
        logger.addHandler(h)
    return logger


class LossMeter:
    """Windowed scalar averaging (HistoryBuffer semantics,
    utils/log_buffer.py:9-69)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.buffers: dict[str, deque] = defaultdict(lambda: deque(maxlen=self.window))
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    def update(self, scalars: dict[str, float]) -> None:
        for k, v in scalars.items():
            v = float(v)
            self.buffers[k].append(v)
            self.totals[k] += v
            self.counts[k] += 1

    def window_avg(self, key: str) -> float:
        b = self.buffers[key]
        return sum(b) / max(len(b), 1)

    def global_avg(self, key: str) -> float:
        return self.totals[key] / max(self.counts[key], 1)

    def line(self) -> str:
        return ", ".join(
            f"{k}: {self.window_avg(k):.4f}" for k in sorted(self.buffers)
        )


class TrainLogger:
    """Iteration/epoch logging cadence (MyPrintingCallback semantics)."""

    def __init__(self, log_dir: str, every: int = 100, tensorboard: bool = True):
        self.logger = get_logger(log_dir)
        self.meter = LossMeter(window=every)
        self.every = every
        self.t0 = time.time()
        self._pending: list = []
        self.tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

    def step_async(self, step: int, device_scalars: dict, lr: float) -> None:
        """Record a step WITHOUT synchronizing on the device values.

        The reference only materializes the loss log every `iters_to_print`
        iterations (utils/logging.py:149-155); calling float() on a jax
        scalar every step would block dispatch and serialize the loop.
        Device scalars are buffered and fetched in one device_get at each
        print boundary.
        """
        self._pending.append(device_scalars)
        if step % self.every == 0:
            import jax

            for scalars in jax.device_get(self._pending):
                self.meter.update(scalars)
            self._pending.clear()
            self._emit(step, lr)

    def step(self, step: int, scalars: dict[str, float], lr: float) -> None:
        self.meter.update(scalars)
        if step % self.every == 0:
            self._emit(step, lr)

    def _emit(self, step: int, lr: float) -> None:
        rate = self.every / max(time.time() - self.t0, 1e-9)
        self.t0 = time.time()
        self.logger.info(
            f"iter {step} | lr {lr:.3e} | {rate:.2f} it/s | {self.meter.line()}"
        )
        if self.tb:
            for k in self.meter.buffers:
                self.tb.add_scalar(k, self.meter.window_avg(k), step)
            self.tb.add_scalar("lr", lr, step)

    def epoch(self, epoch: int, step: int) -> None:
        if self._pending:
            import jax

            for scalars in jax.device_get(self._pending):
                self.meter.update(scalars)
            self._pending.clear()
        self.logger.info(
            f"epoch {epoch} done at iter {step} | "
            + ", ".join(
                f"{k}(avg): {self.meter.global_avg(k):.4f}"
                for k in sorted(self.meter.buffers)
            )
        )
