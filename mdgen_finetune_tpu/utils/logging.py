"""Run logging + profiling utilities.

Replaces the reference's logger (src/mdgen/logger.py:20-33: file + stream
handlers into $MODEL_DIR/log.out with hostname/pid) and its ad-hoc wall-clock
counters (src/mdgen/wrapper.py:370-401), and adds the jax.profiler trace hook
the reference lacks (SURVEY.md §5 tracing/profiling).
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import socket
import time
from collections import defaultdict
from typing import Optional


def get_logger(name: str, model_dir: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        f"%(asctime)s [{socket.gethostname()}:{os.getpid()}] [%(levelname)s] %(message)s"
    )
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    model_dir = model_dir or os.environ.get("MODEL_DIR")
    if model_dir:
        os.makedirs(model_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(model_dir, "log.out"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricLogger:
    """Accumulate -> mean -> emit, like the reference's defaultdict log
    (src/mdgen/wrapper.py:52-62,132-165); optional wandb, always JSONL."""

    def __init__(self, out_dir: Optional[str] = None, use_wandb: bool = False, run_name: str = "run"):
        self._log = defaultdict(list)
        self.out_dir = out_dir
        self.jsonl = os.path.join(out_dir, "metrics.jsonl") if out_dir else None
        self.wandb = None
        if use_wandb and os.environ.get("WANDB_API_KEY"):
            try:
                import wandb

                wandb.init(project="mdgen_finetune_tpu", name=run_name)
                self.wandb = wandb
            except ImportError:
                pass

    def add(self, key: str, value):
        self._log[key].append(float(value))

    def flush(self, step: int, extra: Optional[dict] = None) -> dict:
        import numpy as np

        out = {k: float(np.nanmean(v)) for k, v in self._log.items()}
        out["step"] = step
        if extra:
            out.update(extra)
        self._log.clear()
        if self.jsonl:
            os.makedirs(self.out_dir, exist_ok=True)
            with open(self.jsonl, "a") as f:
                f.write(json.dumps(out) + "\n")
        if self.wandb:
            self.wandb.log(out)
        return out


@contextlib.contextmanager
def timer(store: dict, key: str):
    """Wall-clock section timer (reference model_dur/general_step_dur counters)."""
    t0 = time.time()
    yield
    store[key] = store.get(key, 0.0) + time.time() - t0


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace around a code region when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
