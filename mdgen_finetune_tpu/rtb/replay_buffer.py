"""Host-side replay buffer (src/rtb_utils/replay_buffer.py:29-59): deque of
(x, log_r, loss) with uniform or reward-softmax sampling and a 1/4
high-reward mix."""
from __future__ import annotations

from collections import deque

import numpy as np


class ReplayBuffer:
    def __init__(self, capacity: int = 1000, mode: str = "uniform", seed: int = 0):
        self.buf = deque(maxlen=capacity)
        self.mode = mode
        self.rng = np.random.default_rng(seed)

    def add(self, x: np.ndarray, log_r: np.ndarray, loss: np.ndarray):
        for i in range(len(x)):
            self.buf.append((np.asarray(x[i]), float(np.asarray(log_r[i])), float(np.asarray(loss[i]))))

    def __len__(self):
        return len(self.buf)

    def sample(self, n: int):
        if not self.buf:
            raise ValueError("empty replay buffer")
        log_rs = np.array([b[1] for b in self.buf])
        if self.mode == "reward":
            p = np.exp(log_rs - log_rs.max())
            p = p / p.sum()
            idx = self.rng.choice(len(self.buf), n, p=p)
        else:
            idx = self.rng.choice(len(self.buf), n)
        # mix in 1/4 highest-reward samples (replay_buffer.py:50-55)
        k = max(n // 4, 1) if n >= 4 else 0
        if k:
            top = np.argsort(log_rs)[-k:]
            idx[:k] = top
        xs = np.stack([self.buf[i][0] for i in idx])
        lrs = np.array([self.buf[i][1] for i in idx], dtype=np.float32)
        return xs, lrs
