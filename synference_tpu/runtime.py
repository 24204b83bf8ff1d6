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
    "TerminalLossPlot",
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


class TerminalLossPlot:
    """Live in-terminal train/val loss chart, redrawn in place each epoch.

    The parity analogue of the reference's terminal loss plot
    (`/root/reference/src/synference/utils.py:2445-2546`, plotext-based):
    on ANSI terminals the frame overdraws itself with cursor-up escapes; on
    non-TTY streams (logs, CI) it degrades to a one-line-per-epoch summary
    so piped output stays readable. Dependency-free.
    """

    _BLOCKS = " .:-=+*#%@"

    def __init__(self, width: int = 64, height: int = 10, stream=None,
                 ansi: bool | None = None, label: str = "loss"):
        import sys

        self.width = int(width)
        self.height = int(height)
        self.stream = stream if stream is not None else sys.stdout
        self.ansi = (self.stream.isatty() if ansi is None
                     and hasattr(self.stream, "isatty") else bool(ansi))
        self.label = label
        self._train: list = []
        self._val: list = []
        self._lines_drawn = 0

    def update(self, epoch: int, train_loss, val_loss=None):
        """Record one epoch and redraw. Losses may be scalars or per-member
        arrays (ensembles plot the member mean)."""
        import numpy as _np

        self._train.append(float(_np.mean(train_loss)))
        if val_loss is not None:
            self._val.append(float(_np.mean(val_loss)))
        if self.ansi:
            self._draw(epoch)
        else:
            v = (f"  val {self._val[-1]:.4f}" if self._val else "")
            print(f"epoch {epoch:4d}  train {self._train[-1]:.4f}{v}",
                  file=self.stream, flush=True)

    # -- rendering ---------------------------------------------------------
    def _series_to_cols(self, series, lo, span):
        import numpy as _np

        n = len(series)
        xs = _np.linspace(0, n - 1, self.width) if n > 1 else _np.zeros(1)
        ys = _np.interp(xs, _np.arange(n), _np.asarray(series))
        rows = ((ys - lo) / span * (self.height - 1)).round().astype(int)
        return _np.clip(rows, 0, self.height - 1)

    def _draw(self, epoch: int):
        import numpy as _np

        both = self._train + self._val
        lo, hi = float(_np.min(both)), float(_np.max(both))
        span = max(hi - lo, 1e-12)
        grid = [[" "] * self.width for _ in range(self.height)]
        for series, ch in ((self._train, "·"), (self._val, "●")):
            if not series:
                continue
            cols = self._series_to_cols(series, lo, span)
            for cx, row in enumerate(cols[: self.width]):
                grid[self.height - 1 - int(row)][cx] = ch
        v = (f"  val {self._val[-1]:.4f}" if self._val else "")
        head = (f"{self.label}  epoch {epoch}  "
                f"train {self._train[-1]:.4f}{v}")
        lines = [head]
        lines.append(f"{hi:10.3f} ┤" + "".join(grid[0]))
        for r in grid[1:-1]:
            lines.append(" " * 10 + " │" + "".join(r))
        lines.append(f"{lo:10.3f} ┤" + "".join(grid[-1]))
        lines.append(" " * 12 + "· train   ● val")
        if self._lines_drawn:
            self.stream.write(f"\x1b[{self._lines_drawn}A")
        for ln in lines:
            self.stream.write("\x1b[2K" + ln + "\n")
        self.stream.flush()
        self._lines_drawn = len(lines)
