"""Multi-head self-attention with RoPE and learned bias-KV token.

Functional rebuild of the reference's fairseq-derived MHA
(src/mdgen/model/mha.py:60-407), batch-first and einsum-based so XLA maps the
contraction onto the MXU. Semantics preserved for checkpoint parity:

- q scaled by head_dim**-0.5 before RoPE (mha.py:263);
- learned bias_k / bias_v appended as one extra KV position at the sequence
  end, always attendable (mha.py:117-121, 265-280);
- RoPE applied after the bias append, so the bias token carries position N
  (mha.py:356-357);
- key-padding positions masked to -inf before a f32 softmax.

The (B*T, L) / (B*L, T) factorized batching of the denoiser keeps sequence
lengths modest (4-1000), so a dense masked softmax-attention is the right
baseline on TPU; a Pallas flash kernel plugs in behind the same interface for
long-T configs (see ops/fused_attention.py).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fused_attention import fused_attention
from ..ops.residue_attention import residue_attention
from ..ops.time_attention import time_attention
from .layers import DenseParams, dense
from .rope import apply_rope

_NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    use_rope: bool = True
    dropout: float = 0.0  # on attention probabilities (reference mha.py:383-386)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None,
                 axis: str = "time", train: bool = False,
                 tl: tuple | None = None) -> jnp.ndarray:
        """x: (B, N, C) with mask (B, N); or, for the factorized stages,
        x: (B, T*L, C) with ``tl=(T, L)`` — with axis="time" attention runs
        over T with (B, L) as batch and mask (B, L, T); with axis="residue"
        it runs over L with (B, T) as batch and mask (B, T, L). The
        factorized paths keep the trunk's flat (B, T*L, C) layout for every
        matmul — a physically 4D (..., L, C) tensor pads L to 8 sublanes on
        TPU, doubling the slots of every op touching it — and the 4D views
        handed to the fused kernels cancel against the kernels' internal
        reshapes (ops/time_attention.py, ops/residue_attention.py).
        1 = valid. Returns the same shape as x. (A 4D x is accepted and
        flattened for backward compatibility.)"""
        unflatten = None
        if x.ndim == 4:
            B4, T4, L4, C4 = x.shape
            x = x.reshape(B4, T4 * L4, C4)
            tl = (T4, L4)
            unflatten = lambda o: o.reshape(B4, T4, L4, C4)

        C = x.shape[-1]
        H = self.num_heads
        D = C // H

        # one fused (C -> 3C) projection matmul — params stay split under
        # q_proj/k_proj/v_proj (checkpoint-compatible); the reference's
        # head_dim**-0.5 query scaling (mha.py:263) folds into the weights
        wq, bq = DenseParams(C, C, name="q_proj")()
        wk, bk2 = DenseParams(C, C, name="k_proj")()
        wv, bv2 = DenseParams(C, C, name="v_proj")()
        scale = D**-0.5
        wqkv = jnp.concatenate([wq * scale, wk, wv], axis=1).astype(self.dtype)
        bqkv = jnp.concatenate([bq * scale, bk2, bv2]).astype(self.dtype)
        qkv = x.astype(self.dtype) @ wqkv + bqkv
        q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]

        # xavier_normal on a (1, 1, C) tensor => std = sqrt(2 / (1 + C))
        bias_std = (2.0 / (1 + C)) ** 0.5
        bias_k = self.param("bias_k", nn.initializers.normal(bias_std), (1, 1, C))
        bias_v = self.param("bias_v", nn.initializers.normal(bias_std), (1, 1, C))

        drop = self.dropout > 0.0 and train  # dropout needs the dense-probs path

        if tl is not None:
            T4, L4 = tl
            B4 = x.shape[0]
            if not self.use_rope:
                raise NotImplementedError("factorized-attention paths assume RoPE")
            if not drop:
                attend = time_attention if axis == "time" else residue_attention
                q4, k4, v4 = (a.reshape(B4, T4, L4, C) for a in (q, k, v))
                out = attend(
                    q4, k4, v4, bias_k.astype(q.dtype), bias_v.astype(v.dtype), mask,
                    num_heads=H,
                )
                out = dense(C, name="out_proj", dtype=self.dtype)(out.reshape(B4, T4 * L4, C))
                return unflatten(out) if unflatten is not None else out
            # training with dropout: fold to the (parity-tested-equal) 3D view
            if axis == "residue":
                q, k, v = (a.reshape(B4 * T4, L4, C) for a in (q, k, v))
                mask3, unfold = mask.reshape(B4 * T4, L4), lambda o: o.reshape(B4, T4 * L4, C)
            else:
                q, k, v = (a.reshape(B4, T4, L4, C).transpose(0, 2, 1, 3).reshape(B4 * L4, T4, C)
                           for a in (q, k, v))
                mask3 = mask.reshape(B4 * L4, T4)
                unfold = lambda o: o.reshape(B4, L4, T4, C).transpose(0, 2, 1, 3).reshape(B4, T4 * L4, C)
            out = self._dense_attn(q, k, v, mask3, bias_k, bias_v, H, D, drop)
            out = dense(C, name="out_proj", dtype=self.dtype)(unfold(out))
            return unflatten(out) if unflatten is not None else out

        out = self._dense_attn(q, k, v, mask, bias_k, bias_v, H, D, drop)
        return dense(C, name="out_proj", dtype=self.dtype)(out)

    def _dense_attn(self, q, k, v, mask, bias_k, bias_v, H, D, drop):
        if drop:
            return dense_attn(q, k, v, mask, bias_k, bias_v, H,
                              use_rope=self.use_rope,
                              dropout=lambda p: nn.Dropout(self.dropout)(p, deterministic=False))
        return dense_attn(q, k, v, mask, bias_k, bias_v, H, use_rope=self.use_rope)


def dense_attn(q, k, v, mask, bias_k, bias_v, H, use_rope=True, dropout=None):
    """Bias-KV + (RoPE) + masked softmax attention on (B, N, C) — the
    module's dense path as a pure function (raw-weight callers, e.g. the
    fused IPA-encoder twin, share it for bit-identical semantics)."""
    B, N, C = q.shape
    D = C // H
    k = jnp.concatenate([k, jnp.broadcast_to(bias_k.astype(k.dtype), (B, 1, C))], axis=1)
    v = jnp.concatenate([v, jnp.broadcast_to(bias_v.astype(v.dtype), (B, 1, C))], axis=1)

    def split_heads(t):
        return t.reshape(t.shape[0], t.shape[1], H, D).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    if use_rope:
        q, k = apply_rope(q, k)

    key_valid = None
    if mask is not None:
        key_valid = jnp.concatenate(
            [mask.astype(q.dtype), jnp.ones((B, 1), dtype=q.dtype)], axis=1
        )  # bias token always valid
    if dropout is not None:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if key_valid is not None:
            logits = logits + (1.0 - key_valid)[:, None, None, :] * _NEG_INF
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        probs = dropout(probs)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    else:
        out = fused_attention(q, k, v, key_valid)

    return out.transpose(0, 2, 1, 3).reshape(B, N, C)


class MHAParams(nn.Module):
    """Declares exactly MultiheadAttention's parameter tree (q/k/v/out_proj
    Dense params + learned bias_k/bias_v token) and returns the raw values,
    for fused block kernels that consume the weights directly
    (ops/time_attention.time_attention_block). Interchangeable with a
    MultiheadAttention module of the same name in the checkpoint."""

    embed_dim: int

    @nn.compact
    def __call__(self):
        C = self.embed_dim
        wq, bq = DenseParams(C, C, name="q_proj")()
        wk, bk = DenseParams(C, C, name="k_proj")()
        wv, bv = DenseParams(C, C, name="v_proj")()
        wo, bo = DenseParams(C, C, name="out_proj")()
        bias_std = (2.0 / (1 + C)) ** 0.5
        bias_k = self.param("bias_k", nn.initializers.normal(bias_std), (1, 1, C))
        bias_v = self.param("bias_v", nn.initializers.normal(bias_std), (1, 1, C))
        return (wq, bq, wk, bk, wv, bv, wo, bo, bias_k, bias_v)
