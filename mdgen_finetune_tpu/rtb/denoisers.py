"""Alternative "outsourced" denoiser policies for the RTB chain.

The reference ships two UNet families as alternative DDPM policies
(src/rtb_utils/denoisers.py: a vendored guided-diffusion UNet at :13-503 and
``UNet3DSeqModel`` at :504-636, which folds (B, T, L, D) -> (B*T, 1, L, D)
and runs an HF 2D UNet per frame). The MDGen fine-tune path conditions the
LatentMDGen denoiser instead, but the outsourced option is part of the public
surface; here it is a per-frame residue-axis conv UNet in flax with
sinusoidal time embedding — same folding trick, TPU-friendly channels-last
convolutions.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..models.layers import dense, timestep_embedding


class ResBlock1D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        h = nn.GroupNorm(num_groups=min(8, self.channels), dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME", dtype=self.dtype)(h)
        h = h + dense(self.channels, dtype=self.dtype)(nn.silu(t_emb))[:, None, :]
        h = nn.GroupNorm(num_groups=min(8, self.channels), dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME", dtype=self.dtype)(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1,), dtype=self.dtype)(x)
        return x + h


class UNetSeqDenoiser(nn.Module):
    """Per-frame residue-axis UNet: (B, T, L, D) folded to (B*T, L, D).

    Frames share the timestep embedding; no cross-frame mixing (matching
    UNet3DSeqModel's per-frame folding, denoisers.py:560-610).
    """

    out_dim: int
    widths: Sequence[int] = (64, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, mask=None, **_):
        B, T, L, D = x.shape
        h = x.reshape(B * T, L, D).astype(self.dtype)
        h = nn.Conv(self.widths[0], (3,), padding="SAME", dtype=self.dtype)(h)  # stem
        t_emb = dense(self.widths[0], dtype=self.dtype)(
            timestep_embedding(jnp.repeat(t, T), 128)
        )

        skips = []
        for w in self.widths:
            h = ResBlock1D(w, dtype=self.dtype)(h, t_emb)
            skips.append(h)
        h = ResBlock1D(self.widths[-1], dtype=self.dtype)(h, t_emb)
        for w, s in zip(reversed(self.widths), reversed(skips)):
            h = ResBlock1D(w, dtype=self.dtype)(jnp.concatenate([h, s], axis=-1), t_emb)
        out = nn.Conv(self.out_dim, (3,), padding="SAME", kernel_init=nn.initializers.zeros, dtype=self.dtype)(h)
        return out.reshape(B, T, L, self.out_dim).astype(jnp.float32)
