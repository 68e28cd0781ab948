"""DiT-style building blocks (AdaLN modulation, timestep embedding, output head).

Rebuilds src/mdgen/model/layers.py:14-85 in flax. LayerNorms in the denoiser
blocks carry no affine params (eps 1e-6), matching the reference.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# reference init: every Linear is xavier-uniform with zero bias
# (src/mdgen/model/latent_model.py:134-142)
default_init = nn.initializers.xavier_uniform()
zero_init = nn.initializers.zeros


def dense(features, name=None, kernel_init=default_init, use_bias=True, dtype=None):
    return nn.Dense(
        features,
        name=name,
        kernel_init=kernel_init,
        bias_init=zero_init,
        use_bias=use_bias,
        dtype=dtype,
    )


def gelu_erf(x):
    """erf-form GELU (src/mdgen/model/layers.py:78-85)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


import jax  # noqa: E402  (used by gelu_erf above)


def layer_norm(x, eps=1e-6):
    """Non-affine LayerNorm in f32 regardless of activation dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def modulate(x, shift, scale):
    """AdaLN modulate: shift/scale are (B, C), broadcast over middle dims
    (src/mdgen/model/layers.py:14-15)."""
    expand = (slice(None),) + (None,) * (x.ndim - 2)
    return x * (1 + scale[expand]) + shift[expand]


def gate(x, g):
    expand = (slice(None),) + (None,) * (x.ndim - 2)
    return g[expand] * x


def timestep_embedding(t, dim, max_period=10000):
    """Sinusoidal features, cos-first (src/mdgen/model/layers.py:30-50)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedder(nn.Module):
    """(src/mdgen/model/layers.py:17-55); MLP weights init N(0, 0.02)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        normal02 = nn.initializers.normal(stddev=0.02)
        h = nn.Dense(self.hidden_size, kernel_init=normal02, bias_init=zero_init, name="mlp0", dtype=self.dtype)(
            timestep_embedding(t, self.frequency_embedding_size)
        )
        h = nn.silu(h)
        return nn.Dense(self.hidden_size, kernel_init=normal02, bias_init=zero_init, name="mlp2", dtype=self.dtype)(h)


class FinalLayer(nn.Module):
    """AdaLN output head, zero-initialized (src/mdgen/model/layers.py:58-75,
    zero init at latent_model.py:172-177)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mod = dense(2 * x.shape[-1], name="adaLN", kernel_init=zero_init, dtype=self.dtype)(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(layer_norm(x), shift, scale)
        return dense(self.out_channels, name="linear", kernel_init=zero_init, dtype=self.dtype)(x)


def sincos_pos_embed(embed_dim: int, length: int) -> np.ndarray:
    """Fixed 1D sin-cos table, sin-half then cos-half
    (src/mdgen/model/latent_model.py:22-40)."""
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", np.arange(length, dtype=np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


class LNParams(nn.Module):
    """Declares an affine nn.LayerNorm's params (same names/inits) and
    returns them raw, for fused kernels."""

    features: int

    @nn.compact
    def __call__(self):
        sc = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", zero_init, (self.features,))
        return sc, b


class DenseParams(nn.Module):
    """Declares a Dense layer's params (same names/init/shapes as nn.Dense —
    checkpoint-path compatible) and returns them raw, for call sites that
    fuse several projections into one matmul or feed Pallas kernels."""

    features: int
    in_features: int
    kernel_init: Any = default_init

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, (self.in_features, self.features))
        b = self.param("bias", zero_init, (self.features,))
        return k, b
