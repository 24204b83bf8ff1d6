"""Runtime utilities: logging, step timing, profiling hooks.

Reference analogues: rank-aware MPI logger (`/root/reference/src/synference/
utils.py:2331-2376`, instantiated at import `__init__.py:16`), ad-hoc
wall-clock timing around the pipeline (`library.py:2617-2622`,
`custom_runner.py:672-683`). The reference has no profiler integration
(SURVEY §5); here the jax profiler is a first-class hook.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time

__all__ = [
    "setup_logger",
    "StepTimer",
    "trace_profile",
    "MetricsLogger",
]


def setup_logger(name: str = "synference_tpu",
                 level: int = logging.INFO) -> logging.Logger:
    """Process-aware logger: jax process 0 logs at `level`, other hosts at
    WARNING (the multihost equivalent of the reference's MPI rank-aware
    logger, utils.py:2331-2376)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    try:
        import jax

        rank = jax.process_index()
    except Exception:  # pragma: no cover - jax always importable here
        rank = 0
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter(
            f"%(asctime)s [{name} p{rank}] %(levelname)s: %(message)s"
        )
    )
    logger.addHandler(handler)
    logger.setLevel(level if rank == 0 else logging.WARNING)
    return logger


class StepTimer:
    """Rolling step-time statistics (steps/sec, ETA)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    def eta_seconds(self, remaining_steps: int) -> float:
        sps = self.steps_per_sec
        return remaining_steps / sps if sps > 0 else float("inf")


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """jax profiler trace context (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metrics sink (the structured-metrics backend the
    reference lacks; its closest analogue is per-run stats JSON,
    sbi_runner.py:5047-5065)."""

    def __init__(self, path: str):
        self.path = path

    def log(self, **metrics):
        metrics.setdefault("t", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(metrics) + "\n")

    def read(self) -> list:
        out = []
        with open(self.path) as f:
            for line in f:
                if line.strip():
                    out.append(json.loads(line))
        return out
