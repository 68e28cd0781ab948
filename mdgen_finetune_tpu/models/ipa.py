"""Invariant Point Attention (c_z = 0 variant) in pure XLA einsums.

Rebuild of the AF2 IPA used by the reference (src/mdgen/model/ipa.py:34-255)
with the pair representation removed (the denoiser instantiates c_z=0,
src/mdgen/model/latent_model.py:62-70). The O(L^2 * H * P) point-distance
attention is expressed with |q - k|^2 = |q|^2 + |k|^2 - 2 q.k so the cross
term rides the MXU instead of materializing a (L, L, H, P, 3) difference
tensor — algebraically identical to the reference's direct subtraction
(src/mdgen/model/ipa.py:170-185) but O(L^2 H P) memory -> O(L^2 H).

Shapes: s (..., L, C); frames: Rigid broadcastable to (..., L); mask (..., L).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rigid import Rigid
from .layers import zero_init

_INF = 1e5


def _softplus_inverse(x: float) -> float:
    return float(np.log(np.expm1(x)))


class InvariantPointAttention(nn.Module):
    c_s: int
    c_hidden: int = 32
    no_heads: int = 4
    no_qk_points: int = 8
    no_v_points: int = 8
    dropout: float = 0.0  # on attention weights (reference ipa.py:204)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s: jnp.ndarray, r: Rigid, frame_mask: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        H, Ch, Pq, Pv = self.no_heads, self.c_hidden, self.no_qk_points, self.no_v_points
        ws = ipa_collect_params(self, self.c_s, H, Ch, Pq, Pv)
        dropout = None
        if self.dropout > 0.0 and train:
            dropout = lambda a: nn.Dropout(self.dropout)(a, deterministic=False)
        return ipa_forward(s, r, frame_mask, ws, H, Ch, Pq, Pv,
                           dtype=self.dtype, dropout=dropout)


def ipa_collect_params(scope, c_s, H, Ch, Pq, Pv):
    """Declare IPA's parameter tree (names/shapes/inits identical to the
    previous nn.Dense-based layout) and return the raw values."""
    from .layers import DenseParams

    wq = DenseParams(H * Ch, c_s, name="linear_q")()
    wkv = DenseParams(2 * H * Ch, c_s, name="linear_kv")()
    wqp = DenseParams(H * Pq * 3, c_s, name="linear_q_points")()
    wkvp = DenseParams(H * (Pq + Pv) * 3, c_s, name="linear_kv_points")()
    head_weights = scope.param(
        "head_weights", nn.initializers.constant(_softplus_inverse(1.0)), (H,)
    )
    feat = H * Ch + 3 * H * Pv + H * Pv
    wout = DenseParams(c_s, feat, kernel_init=zero_init, name="linear_out")()
    return (*wq, *wkv, *wqp, *wkvp, head_weights, *wout)


def ipa_forward(s, r: Rigid, frame_mask, ws, H, Ch, Pq, Pv, dtype, dropout=None):
    """IPA on raw weights — the module body as a pure function, shared with
    the fused encoder's XLA twin (ops/ipa_encoder.py) for bit-identical
    semantics. ``ws`` is ipa_collect_params' tuple."""
    (wq, bq, wkv, bkv, wqp, bqp, wkvp, bkvp, head_weights, wout, bout) = ws
    *batch, L, _ = s.shape
    sd = s.astype(dtype)

    def lin(x, w, b):
        # flax Dense promote_dtype semantics: the INPUT is cast to
        # dtype too (an f32 operand would silently promote the whole
        # downstream computation to f32)
        return x.astype(dtype) @ w.astype(dtype) + b.astype(dtype)

    q = lin(sd, wq, bq).reshape(*batch, L, H, Ch)
    kv = lin(sd, wkv, bkv).reshape(*batch, L, H, 2 * Ch)
    k, v = jnp.split(kv, 2, axis=-1)

    def to_points(t):
        # reference layout: all x-coords, then y, then z (src/mdgen/model/ipa.py:130-135)
        t = t.reshape(*batch, L, 3, -1)
        return jnp.swapaxes(t, -1, -2)  # (..., L, H*P, 3)

    q_pts = to_points(lin(sd, wqp, bqp))
    kv_pts = to_points(lin(sd, wkvp, bkvp))

    # lift points to the global frame
    r1 = Rigid(r.rot[..., None, :, :], r.trans[..., None, :])  # (..., L, 1)
    q_pts = r1.apply(q_pts).reshape(*batch, L, H, Pq, 3)
    kv_pts = r1.apply(kv_pts).reshape(*batch, L, H, Pq + Pv, 3)
    k_pts, v_pts = jnp.split(kv_pts, [Pq], axis=-2)

    # scalar attention (..., H, Lq, Lk)
    a = jnp.einsum("...qhc,...khc->...hqk", q, k) * math.sqrt(1.0 / (3 * Ch))

    # point attention via expanded squared distance
    hw = jax.nn.softplus(head_weights) * math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
    sq = jnp.sum(q_pts**2, axis=-1)  # (..., L, H, P)
    sk = jnp.sum(k_pts**2, axis=-1)
    cross = jnp.einsum("...qhpx,...khpx->...hqk", q_pts, k_pts)
    sum_sq = jnp.sum(sq, axis=-1)  # (..., L, H)
    sum_sk = jnp.sum(sk, axis=-1)
    pt_att = (
        jnp.swapaxes(sum_sq, -1, -2)[..., :, None]  # (..., H, Lq, 1)
        + jnp.swapaxes(sum_sk, -1, -2)[..., None, :]  # (..., H, 1, Lk)
        - 2 * cross
    )
    a = a + pt_att * hw[:, None, None] * (-0.5)

    if frame_mask is not None:
        square = frame_mask[..., :, None] * frame_mask[..., None, :]
        a = a + (_INF * (square - 1))[..., None, :, :]

    a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(s.dtype)
    if dropout is not None:
        a = dropout(a)

    o = jnp.einsum("...hqk,...khc->...qhc", a, v).reshape(*batch, L, H * Ch)
    o_pt = jnp.einsum("...hqk,...khpx->...qhpx", a, v_pts)
    o_pt = Rigid(r1.rot, r1.trans).invert_apply(o_pt.reshape(*batch, L, H * Pv, 3))
    o_pt_norm = jnp.sqrt(jnp.sum(o_pt**2, axis=-1) + 1e-8)

    # concat order matches the reference: scalars, x, y, z, norms (ipa.py:250-253)
    feats = jnp.concatenate(
        [o, o_pt[..., 0], o_pt[..., 1], o_pt[..., 2], o_pt_norm], axis=-1
    )
    return lin(feats, wout, bout)
