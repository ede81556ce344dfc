"""Metrics/observability (reference: ``chainer.report`` ->
``LogReport``/``PrintReport``/``PlotReport`` — SURVEY.md §5.5).

Same shape: metric dicts come back from the jitted step, a JSONL writer
replaces ``result/log`` (same metric names loss/loss1/loss2/loss3 so
curves are directly comparable with the reference), a console table
replaces PrintReport, and matplotlib loss-curve PNGs replace PlotReport.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterable


class MetricsLogger:
    def __init__(self, out_dir: str,
                 print_keys: Iterable[str] = ("loss", "loss1", "loss2",
                                              "loss3", "codebook_usage",
                                              "val_loss1"),
                 tensorboard: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "log.jsonl")
        self._f = open(self.path, "a")
        self.print_keys = list(print_keys)
        self._header_printed: list | None = None  # last printed column set
        self._t_last = time.time()
        self._step_last = None
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(
                    os.path.join(out_dir, "tb"))
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict[str, float],
            echo: bool = True) -> None:
        now = time.time()
        rec = {"iteration": int(step),
               "elapsed": now - self._t_last,
               **{k: float(v) for k, v in metrics.items()}}
        # the train loop injects an EMA steps_per_sec (utils/profiling
        # StepTimer); fall back to the log-interval rate for callers
        # that log without a timer
        if ("steps_per_sec" not in rec and self._step_last is not None
                and now > self._t_last):
            rec["steps_per_sec"] = (step - self._step_last) / \
                (now - self._t_last)
        self._t_last, self._step_last = now, step
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf
                for k, v in rec.items():
                    if k != "iteration":
                        tf.summary.scalar(k, v, step=int(step))
                self._tb.flush()
        if echo:
            self._echo(rec)

    def _echo(self, rec: Dict[str, float]) -> None:
        keys = ["iteration"] + [k for k in self.print_keys if k in rec]
        if "steps_per_sec" in rec:
            keys.append("steps_per_sec")
        # reprint the header whenever the column set changes (eval
        # rows add val_* columns on their own schedule)
        if self._header_printed != keys:
            print("  ".join(f"{k:>14s}" for k in keys))
            self._header_printed = keys
        cells = []
        for k in keys:
            v = rec[k]
            cells.append(f"{v:14d}" if k == "iteration"
                         else f"{v:14.5f}")
        print("  ".join(cells), flush=True)

    def plot(self) -> None:
        """Loss-curve PNG next to the log (PlotReport equivalent)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        steps, series = [], {}
        with open(self.path) as f:
            for line in f:
                rec = json.loads(line)
                steps.append(rec["iteration"])
                for k in ("loss1", "loss2", "loss3"):
                    if k in rec:
                        series.setdefault(k, []).append(rec[k])
        if not steps:
            return
        fig, ax = plt.subplots()
        for k, v in series.items():
            ax.plot(steps[:len(v)], v, label=k)
        ax.set_xlabel("iteration")
        ax.legend()
        fig.savefig(os.path.join(os.path.dirname(self.path), "loss.png"))
        plt.close(fig)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._f.close()
