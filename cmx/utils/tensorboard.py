"""TensorBoard logging (SparK's TensorboardLogger, Spark/utils/misc.py:89-140).

Master-gated (process_index 0 only) with the same step-throttling idea.
Gracefully no-ops if tensorboard is unavailable.
"""

from __future__ import annotations



class TensorboardLogger:
    def __init__(self, log_dir: str, throttle: int = 0):
        self.throttle = throttle
        self._last: dict = {}
        self.writer = None
        try:
            import jax

            if jax.process_index() != 0:
                return
        except Exception:
            pass
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir)
        except Exception:
            try:
                from tensorboard.summary import Writer  # type: ignore

                self.writer = Writer(log_dir)
            except Exception:
                self.writer = None

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        if self.writer is None:
            return
        last = self._last.get(tag, -10**18)
        if self.throttle and step - last < self.throttle:
            return
        self._last[tag] = step
        if hasattr(self.writer, "add_scalar"):
            self.writer.add_scalar(tag, float(value), step)
        else:
            self.writer.add_scalar(tag, float(value), step=step)

    def log_dict(self, metrics: dict, step: int, prefix: str = "") -> None:
        for k, v in metrics.items():
            self.log_scalar(prefix + k, float(v), step)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
