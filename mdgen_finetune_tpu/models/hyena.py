"""Hyena time-mixing operator (order-2 gated implicit FFT long convolution).

Rebuild of the reference's standalone Hyena (src/mdgen/model/standalone_hyena.py,
itself from HazyResearch/safari) as flax + jnp.fft — XLA lowers the rfft/irfft
pair to the TPU FFT, giving the O(T log T) frame mixer the reference offers as
the --hyena ablation. Numerical conventions (the L-1 output window, forward-norm
irfft, filter positional encoding with (emb_dim-1)//2 complex bands) are kept
exactly for parity.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import default_init, dense


def fftconv(u: jnp.ndarray, k: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Causal long conv: u (B, C, L), k (C, L), D (C,) residual gain
    (src/mdgen/model/standalone_hyena.py:15-26)."""
    L = u.shape[-1]
    fft_size = 2 * L
    k_f = jnp.fft.rfft(k.astype(jnp.float32), n=fft_size) / fft_size
    u_f = jnp.fft.rfft(u.astype(jnp.float32), n=fft_size)
    y = jnp.fft.irfft(u_f * k_f, n=fft_size, norm="forward")[..., L - 1 : 2 * L - 1]
    return (y + u.astype(jnp.float32) * D[:, None]).astype(u.dtype)


def _positional_z(emb_dim: int, seq_len: int) -> np.ndarray:
    """Complex-exponential positional features (standalone_hyena.py:60-79)."""
    t = np.linspace(0, 1, seq_len)[:, None]
    bands = (emb_dim - 1) // 2
    t_rescaled = np.linspace(0, seq_len - 1, seq_len)[:, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = np.linspace(1e-4, bands - 1, bands)[None, :]
    z = np.exp(-1j * f * w)
    return np.concatenate([t, z.real, z.imag], axis=-1).astype(np.float32), t.astype(np.float32)


class Sin(nn.Module):
    dim: int
    w: float = 1.0

    @nn.compact
    def __call__(self, x):
        freq = self.param("freq", nn.initializers.constant(self.w), (1, self.dim))
        return jnp.sin(freq * x)


class HyenaFilter(nn.Module):
    """Implicit MLP filter with exponential decay modulation
    (standalone_hyena.py:112-185)."""

    d_model: int
    emb_dim: int = 3
    order: int = 64
    seq_len: int = 1024
    w: float = 1.0
    num_inner_mlps: int = 2
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    target: float = 1e-2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        z, t = _positional_z(self.emb_dim, self.seq_len)
        self._z_init, self._t = z, t
        self.z = self.param("pos_z", lambda key: jnp.asarray(self._z_init))  # trainable, lr shared
        self.bias = self.param("bias", nn.initializers.normal(1.0), (self.d_model,))
        self.mlp_in = dense(self.order, name="mlp_in")
        self.sins = [Sin(self.order, w=self.w, name=f"sin_{i}") for i in range(self.num_inner_mlps + 1)]
        self.mlps = [dense(self.order, name=f"mlp_{i}") for i in range(self.num_inner_mlps)]
        self.mlp_out = nn.Dense(self.d_model, use_bias=False, kernel_init=default_init, name="mlp_out")
        max_decay = math.log(self.target) / self.fast_decay_pct
        min_decay = math.log(self.target) / self.slow_decay_pct
        self.deltas = jnp.linspace(min_decay, max_decay, self.d_model)[None, :]

    def filter(self, L: int) -> jnp.ndarray:
        h = self.sins[0](self.mlp_in(self.z[:L]))
        for mlp, sin in zip(self.mlps, self.sins[1:]):
            h = sin(mlp(h))
        h = self.mlp_out(h)  # (L, d_model)
        decay = jnp.exp(-jnp.asarray(self._t[:L]) * jnp.abs(self.deltas))
        return h * decay


class HyenaOperator(nn.Module):
    """(standalone_hyena.py:188-254). Input/output (B, T, C)."""

    d_model: int
    l_max: int
    order: int = 2
    filter_order: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        B, T, C = u.shape
        l_filter = min(T, self.l_max)
        inner = C * (self.order + 1)

        u = dense(inner, name="in_proj", dtype=self.dtype)(u)  # (B, T, inner)
        # depthwise short conv, kernel 3, causal-ish padding 2, crop to length
        uc = nn.Conv(
            features=inner,
            kernel_size=(3,),
            padding=[(2, 2)],
            feature_group_count=inner,
            name="short_filter",
            dtype=self.dtype,
        )(u)[:, :l_filter]
        uc = uc.transpose(0, 2, 1)  # (B, inner, L)

        parts = jnp.split(uc, self.order + 1, axis=1)
        x, v = parts[:-1], parts[-1]

        filt = HyenaFilter(
            d_model=C * (self.order - 1), order=self.filter_order, seq_len=self.l_max, name="filter_fn"
        )
        k = filt.filter(l_filter)  # (L, (order-1)*C)
        k = k.T.reshape(self.order - 1, C, l_filter)
        bias = filt.bias.reshape(self.order - 1, C)

        for o, x_i in enumerate(reversed(x[1:])):
            v = v * x_i
            v = fftconv(v, k[o], bias[o])

        y = (v * x[0]).transpose(0, 2, 1)
        return dense(C, name="out_proj", dtype=self.dtype)(y)
