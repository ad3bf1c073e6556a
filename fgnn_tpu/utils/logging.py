"""Run logging: file+console logger and a JSONL scalar-metrics writer.

Mirrors the reference's utils/logging.py init_logger + tensorboardX scalar
logging, without the TB dependency: scalars go to a JSONL stream that can
be converted to TB events offline (and to TB directly when tensorboardX is
importable).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time


def init_logger(log_path: str, log_file: str, print_log: bool = True,
                level=logging.INFO):
    os.makedirs(log_path, exist_ok=True)
    handlers = [logging.FileHandler(os.path.join(log_path, f"{log_file}.log"))]
    if print_log:
        handlers.append(logging.StreamHandler(sys.stdout))
    logging.basicConfig(
        level=level,
        format="%(asctime)s [%(process)d] [%(threadName)-12.12s] "
               "[%(levelname)-5.5s]  %(message)s",
        handlers=handlers,
        force=True,
    )


class MetricsWriter:
    """Append-only JSONL scalar writer (TensorBoard-compatible tags)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:  # optional TensorBoard mirror
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir=logdir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "time": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
