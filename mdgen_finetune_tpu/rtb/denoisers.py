"""Alternative "outsourced" denoiser policies for the RTB chain.

The reference ships two UNet families as alternative DDPM policies
(src/rtb_utils/denoisers.py: a vendored guided-diffusion UNet at :13-503 and
``UNet3DSeqModel`` at :504-636, which folds (B, T, L, D) -> (B*T, 1, L, D)
and runs an HF 2D UNet per frame). The MDGen fine-tune path conditions the
LatentMDGen denoiser instead, but the outsourced option is part of the public
surface. Two tiers here:

- ``UNetSeqDenoiser``: a light per-frame residue-axis conv UNet (cheap policy
  for tests/small latents);
- ``UNet2D`` / ``UNet3DSeq``: a full guided-diffusion-capability UNet
  (src/rtb_utils/denoisers.py:13-278) — per-level residual stacks with
  channel multipliers, self-attention blocks at configured downsample rates,
  FiLM/scale-shift timestep conditioning, learned up/downsampling, optional
  class conditioning, zero-initialized output conv — written TPU-first: NHWC
  channels-last convolutions, attention as batched dense matmuls over folded
  spatial tokens, everything static-shaped for a single XLA trace. Note the
  reference file's ``UNetModel`` is dead code (its ResBlock/AttentionBlock
  helpers are never defined or imported anywhere in the repo); this is a
  working rebuild of the capability it advertises.
"""
from __future__ import annotations

from typing import Optional, Sequence

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


# ---------------------------------------------------------------------------
# Full guided-diffusion-capability UNet (src/rtb_utils/denoisers.py:13-278)
# ---------------------------------------------------------------------------


def _group_norm(channels: int, dtype) -> nn.GroupNorm:
    # guided-diffusion normalization(ch) uses 32 groups; shrink for thin stacks
    g = 32
    while channels % g:
        g //= 2
    return nn.GroupNorm(num_groups=max(g, 1), dtype=dtype)


class ResBlock2D(nn.Module):
    """Guided-diffusion ResBlock (denoisers.py:106-115 usage): GN-SiLU-conv,
    timestep FiLM (use_scale_shift_norm) or additive embedding, zero-init
    second conv, 1x1 skip projection, optional fused up/downsample."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = nn.silu(_group_norm(x.shape[-1], self.dtype)(x))
        if self.up:
            h = _upsample_nearest(h)
            x = _upsample_nearest(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype)(h)

        emb_width = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = dense(emb_width, dtype=self.dtype)(nn.silu(emb))[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _group_norm(self.out_channels, self.dtype)(h) * (1 + scale) + shift
        else:
            h = _group_norm(self.out_channels, self.dtype)(h + emb_out)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.out_channels, (3, 3), padding="SAME",
            kernel_init=nn.initializers.zeros, dtype=self.dtype,
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttentionBlock2D(nn.Module):
    """Spatial self-attention over folded H*W tokens (denoisers.py:117-126
    usage); qkv from one dense, zero-init output projection, residual."""

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        heads = C // self.num_head_channels if self.num_head_channels > 0 else self.num_heads
        hd = C // heads
        h = _group_norm(C, self.dtype)(x).reshape(N, H * W, C)
        qkv = dense(3 * C, name="qkv", dtype=self.dtype)(h).reshape(N, H * W, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(hd).astype(self.dtype)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(N, H * W, C)
        out = dense(C, name="proj_out", kernel_init=nn.initializers.zeros, dtype=self.dtype)(out)
        return x + out.reshape(N, H, W, C)


def _upsample_nearest(x):
    N, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class Downsample2D(nn.Module):
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample2D(nn.Module):
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _upsample_nearest(x)
        if self.use_conv:
            x = nn.Conv(x.shape[-1], (3, 3), padding="SAME", dtype=self.dtype)(x)
        return x


class UNet2D(nn.Module):
    """The full UNet: conv stem; per-level ResBlock stacks with channel
    multipliers and attention at the downsample rates in
    ``attention_resolutions``; middle Res-Attn-Res; skip-concat decoder;
    GN-SiLU-zero-conv head. Mirrors the capability surface of the reference's
    ``UNetModel`` (src/rtb_utils/denoisers.py:43-278) as a flax module."""

    model_channels: int = 32
    out_channels: int = 1
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (2,)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, y=None, deterministic: bool = True):
        assert (y is not None) == (self.num_classes is not None)
        emb = dense(4 * self.model_channels, dtype=self.dtype)(
            timestep_embedding(timesteps, self.model_channels)
        )
        emb = dense(4 * self.model_channels, dtype=self.dtype)(nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, 4 * self.model_channels, dtype=self.dtype)(y)

        def res(ch, **kw):
            return ResBlock2D(
                ch, dropout=self.dropout, use_scale_shift_norm=self.use_scale_shift_norm,
                dtype=self.dtype, **kw,
            )

        def attn():
            return AttentionBlock2D(
                num_heads=self.num_heads, num_head_channels=self.num_head_channels, dtype=self.dtype
            )

        h = nn.Conv(self.channel_mult[0] * self.model_channels, (3, 3), padding="SAME", dtype=self.dtype)(
            x.astype(self.dtype)
        )
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res(mult * self.model_channels)(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = attn()(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(h.shape[-1], down=True)(h, emb, deterministic)
                else:
                    h = Downsample2D(self.conv_resample, dtype=self.dtype)(h)
                hs.append(h)
                ds *= 2

        h = res(h.shape[-1])(h, emb, deterministic)
        h = attn()(h)
        h = res(h.shape[-1])(h, emb, deterministic)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = res(mult * self.model_channels)(
                    jnp.concatenate([h, hs.pop()], axis=-1), emb, deterministic
                )
                if ds in self.attention_resolutions:
                    h = attn()(h)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(h.shape[-1], up=True)(h, emb, deterministic)
                    else:
                        h = Upsample2D(self.conv_resample, dtype=self.dtype)(h)
                    ds //= 2

        h = nn.silu(_group_norm(h.shape[-1], self.dtype)(h))
        out = nn.Conv(
            self.out_channels, (3, 3), padding="SAME",
            kernel_init=nn.initializers.zeros, dtype=self.dtype,
        )(h)
        return out.astype(jnp.float32)


class UNet3DSeq(nn.Module):
    """UNet3DSeqModel equivalent (src/rtb_utils/denoisers.py:504-561): fold
    frames into the batch — (B, T, L, D) -> (B*T, L, D, 1) NHWC — run the 2D
    UNet per frame with a shared timestep embedding, unfold. Call signature
    matches the RTB policy convention (x, t, **condition ignored), so it
    drops into RTBTrainer/DiffuserTrainer as an outsourced policy."""

    out_dim: int
    model_channels: int = 32
    num_res_blocks: int = 2
    channel_mult: Sequence[int] = (1, 2)
    attention_resolutions: Sequence[int] = (2,)
    num_head_channels: int = 16
    dropout: float = 0.0
    num_classes: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, y=None, mask=None, deterministic: bool = True, **_):
        B, T, L, D = x.shape
        h = x.reshape(B * T, L, D, 1)
        # pad the folded (L, D) plane to a multiple of the total downsample
        # factor so odd widths (e.g. latent_dim=21) survive the skip concats;
        # static padding, cropped back after the UNet
        m = 1 << (len(self.channel_mult) - 1)
        Lp, Dp = -(-L // m) * m, -(-D // m) * m
        if (Lp, Dp) != (L, D):
            h = jnp.pad(h, ((0, 0), (0, Lp - L), (0, Dp - D), (0, 0)))
        tt = jnp.asarray(t, jnp.float32) * jnp.ones((B,), jnp.float32)  # scalar or (B,)
        tt = jnp.repeat(tt, T)
        yy = jnp.repeat(y, T) if y is not None else None
        # the latent channel axis rides as UNet width; out_channels folds back
        out = UNet2D(
            model_channels=self.model_channels,
            out_channels=1,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            dropout=self.dropout,
            channel_mult=tuple(self.channel_mult),
            num_classes=self.num_classes,
            num_head_channels=self.num_head_channels,
            dtype=self.dtype,
        )(h, tt, y=yy, deterministic=deterministic)
        out = out[:, :L, :D].reshape(B, T, L, D)
        if D != self.out_dim:
            out = dense(self.out_dim)(out)
        return out
