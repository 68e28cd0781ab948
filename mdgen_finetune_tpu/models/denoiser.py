"""SiT-style latent denoiser with factorized frame x residue attention.

TPU-native rebuild of the reference LatentMDGenModel
(src/mdgen/model/latent_model.py:43-326):

- per-(frame, residue) tokens embed the 21/28(+20)-dim latent plus conditioning
  channels and masks;
- a prepend-IPA encoder summarizes the conditioning frames SE(3)-invariantly
  and its output is broadcast-added to every frame's tokens
  (latent_model.py:179-214, 254-255);
- N LatentMDGenLayer blocks run AdaLN-modulated attention over residues
  (batched over frames) then over frames (batched over residues) then a gated
  MLP (latent_model.py:456-493) — both attentions reuse one MHA kernel on
  reshaped views, which XLA fuses without data movement;
- a zero-initialized AdaLN FinalLayer emits the velocity field; the design head
  pools over frames and adds sequence logits to the simplex channels.

Batching note: the reference's prepend-IPA path crashes for B > 1 (run_ipa
receives a (B*T, L) mask against (B, L) activations, latent_model.py:255);
this implementation uses the evidently-intended semantics — the conditioning
encoder runs once per batch element over (B, L) and broadcasts over frames —
which coincides with the reference wherever the reference runs.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import MDGenConfig
from ..geometry.rigid import Rigid
from ..ops.adaln_mlp import adaln_mlp
from ..ops.fused_layer import fused_layer, fused_trunk
from ..ops.ipa_encoder import fold_encoder_ws, ipa_encoder
from ..ops.time_attention import LOG2E
from ..transport.dirichlet import DirichletConditionalFlow, simplex_proj
from ..transport.transport import t_to_alpha
from .attention import MHAParams, MultiheadAttention
from .hyena import HyenaOperator
from .ipa import InvariantPointAttention
from .layers import (
    DenseParams,
    FinalLayer,
    LNParams,
    TimestepEmbedder,
    dense,
    gate,
    gelu_erf,
    layer_norm,
    modulate,
    sincos_pos_embed,
    zero_init,
)


def latent_to_flat(z, P: int):
    """(B, T, L, lat) latent -> the flat-scan carry layout (B, Tp, L*P):
    rows padded to the 8-sublane multiple, per-residue lane blocks padded to
    P (the folded output head's 128-rounded width). One-time cost at the
    edges of the ODE scan (InferenceEngine._sample / bench.py)."""
    B, T, L, lat = z.shape
    Tp = -(-T // 8) * 8
    z = jnp.pad(z, ((0, 0), (0, Tp - T), (0, 0), (0, P - lat)))
    return z.reshape(B, Tp, L * P)


def flat_to_latent(xf, T: int, L: int, lat: int):
    """Inverse of latent_to_flat: (B, Tp, L*P) -> (B, T, L, lat)."""
    B, Tp, LP = xf.shape
    return xf.reshape(B, Tp, L, LP // L)[:, :T, :, :lat]


def _ipa_kwargs(cfg: MDGenConfig, dtype):
    m = cfg.model
    return dict(
        c_s=m.embed_dim,
        c_hidden=m.ipa_head_dim,
        no_heads=m.ipa_heads,
        no_qk_points=m.ipa_qk,
        no_v_points=m.ipa_v,
        dtype=dtype,
    )


class IPALayer(nn.Module):
    """Conditioning-encoder block: IPA + residue MHA + MLP with 6-way AdaLN
    (src/mdgen/model/latent_model.py:341-394)."""

    cfg: MDGenConfig
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x, t_emb, mask, frames: Rigid):
        C = self.cfg.model.embed_dim
        mod = dense(6 * C, name="adaLN", kernel_init=zero_init, dtype=self.dtype)(nn.silu(t_emb))
        sh_l, sc_l, g_l, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)

        ipa_in = nn.LayerNorm(epsilon=1e-5, name="ipa_norm", dtype=self.dtype)(x)
        x = x + InvariantPointAttention(
            **_ipa_kwargs(self.cfg, self.dtype), dropout=self.cfg.model.dropout, name="ipa"
        )(ipa_in, frames, frame_mask=mask, train=self.train)

        residual = x
        x = modulate(layer_norm(x), sh_l, sc_l)
        x = MultiheadAttention(
            C, self.cfg.model.mha_heads, use_rope=not self.cfg.model.no_rope,
            dropout=self.cfg.model.dropout, name="mha_l", dtype=self.dtype
        )(x, mask=mask, train=self.train)
        x = residual + gate(x, g_l)

        # fused LN + modulate + MLP + gate + residual (one VMEM pass on TPU;
        # XLA composition elsewhere — ops/adaln_mlp.py)
        w1, b1 = DenseParams(4 * C, C, name="fc1")()
        w2, b2 = DenseParams(C, 4 * C, name="fc2")()
        return adaln_mlp(x, sh_m, sc_m, g_m, w1.astype(self.dtype), b1.astype(self.dtype),
                         w2.astype(self.dtype), b2.astype(self.dtype))


class _IPAParams(nn.Module):
    """InvariantPointAttention's parameter tree via ipa_collect_params."""

    cfg: MDGenConfig

    @nn.compact
    def __call__(self):
        from .ipa import ipa_collect_params

        m = self.cfg.model
        return ipa_collect_params(self, m.embed_dim, m.ipa_heads,
                                  m.ipa_head_dim, m.ipa_qk, m.ipa_v)


class IPALayerParams(nn.Module):
    """IPALayer's parameter tree without the compute (names/shapes/inits
    identical — checkpoint-interchangeable). The parent-orchestrated encoder
    feeds the raw weights to the fused IPA-encoder kernel on TPU
    (ops/ipa_encoder.py) or its XLA twin elsewhere."""

    cfg: MDGenConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        C = self.cfg.model.embed_dim
        wmod, bmod = DenseParams(6 * C, C, kernel_init=zero_init, name="adaLN")()
        ln = LNParams(C, name="ipa_norm")()
        ipa = _IPAParams(self.cfg, name="ipa")()
        mha = MHAParams(C, name="mha_l")()
        fc1 = DenseParams(4 * C, C, name="fc1")()
        fc2 = DenseParams(C, 4 * C, name="fc2")()
        return (wmod, bmod), (*ln, *ipa, *mha, *fc1, *fc2)


def _fold_fused_args(mha_l, mha_t, fc1, fc2, num_heads: int, dt):
    """Fold the raw MHA/MLP params into fused_layer's 16 weight args
    (query scale into the q columns, qkv concatenated, cast to dt)."""
    (wql, bql, wkl, bkl_, wvl, bvl_, wol, bol, bias_kl, bias_vl) = mha_l
    (wqt, bqt, wkt, bkt_, wvt, bvt_, wot, bot, bias_kt, bias_vt) = mha_t
    w1, b1 = fc1
    w2, b2 = fc2
    C = wol.shape[0]
    scale = (C // num_heads) ** -0.5
    # BOTH attention q's additionally carry log2(e): every consumer of the
    # folded wqkv_t / wqkv_l computes softmax via exp2 (ops/time_attention.
    # LOG2E) — exp's own lowering is exp2(log2e * x), so folding the constant
    # into the already-folded q scale deletes a full-logits-surface multiply
    # from the kernels (measured -1.7% whole-layer time for stage 2, PERF.md
    # r3). For stage 1 the fold is what lets the merged residue-attention
    # core drop its max tree (static exp2 overflow cap, ops/fused_layer.py).
    scale_t = scale * LOG2E
    wqkv_l = jnp.concatenate([wql * scale_t, wkl, wvl], axis=1).astype(dt)
    bqkv_l = jnp.concatenate([bql * scale_t, bkl_, bvl_]).astype(dt)
    wqkv_t = jnp.concatenate([wqt * scale_t, wkt, wvt], axis=1).astype(dt)
    bqkv_t = jnp.concatenate([bqt * scale_t, bkt_, bvt_]).astype(dt)
    return (wqkv_l, bqkv_l, wol.astype(dt), bol.astype(dt),
            wqkv_t, bqkv_t, wot.astype(dt), bot.astype(dt),
            w1.astype(dt), b1.astype(dt), w2.astype(dt), b2.astype(dt),
            bias_kl.astype(dt), bias_vl.astype(dt),
            bias_kt.astype(dt), bias_vt.astype(dt))


def _final_xla(h, modf, wfin, bfin, dtype):
    """FinalLayer math on raw weights (bit-identical to models.layers.
    FinalLayer): non-affine f32 LN -> bf16 modulate -> zero-init linear.
    ``modf`` (B, 2C) = the adaLN projection of silu(t_emb)."""
    sh, sc = jnp.split(modf, 2, axis=-1)
    x = modulate(layer_norm(h), sh, sc)
    return x @ wfin.astype(dtype) + bfin.astype(dtype)


class FinalLayerParams(nn.Module):
    """FinalLayer's parameter tree without the compute (same names/inits —
    checkpoint-interchangeable); the parent trunk folds the output head into
    the streaming kernel's last program or applies _final_xla."""

    out_channels: int
    cfg: MDGenConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        C = self.cfg.model.embed_dim
        wmod, bmod = DenseParams(2 * C, C, kernel_init=zero_init, name="adaLN")()
        wfin, bfin = DenseParams(self.out_channels, C, kernel_init=zero_init,
                                 name="linear")()
        return wmod, bmod, wfin, bfin


class FusedLayerParams(nn.Module):
    """LatentMDGenLayer's fused-branch parameter tree WITHOUT the layer
    compute — identical submodule names/shapes/inits, so checkpoints are
    interchangeable with LatentMDGenLayer. Used by the parent-orchestrated
    whole-trunk mega-kernel (ops/fused_layer.fused_trunk), which needs every
    layer's weights and AdaLN projection up front."""

    cfg: MDGenConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        C = self.cfg.model.embed_dim
        wmod, bmod = DenseParams(9 * C, C, kernel_init=zero_init, name="adaLN")()
        mha_l = MHAParams(C, name="mha_l")()
        mha_t = MHAParams(C, name="mha_t")()
        fc1 = DenseParams(4 * C, C, name="fc1")()
        fc2 = DenseParams(C, 4 * C, name="fc2")()
        return (wmod, bmod), _fold_fused_args(
            mha_l, mha_t, fc1, fc2, self.cfg.model.mha_heads, self.dtype)


class LatentMDGenLayer(nn.Module):
    """Factorized frame x residue attention block with 9-way AdaLN
    (src/mdgen/model/latent_model.py:397-493)."""

    cfg: MDGenConfig
    dtype: jnp.dtype = jnp.float32
    train: bool = False
    padded: bool = False  # x arrives (B, Tp, L*C) frame-padded (parent's
    # padded-trunk fast path; only valid when this layer takes the fused-op
    # branch). A module attribute, not a call arg, so nn.remat never traces it.

    @nn.compact
    def __call__(self, x, t_emb, mask, frames: Optional[Rigid] = None):
        """x: (B, T*L, C) flat trunk layout (mask (B, T, L) carries the
        factorization). A (..., L, C) tensor with small L pads L to 8
        sublanes on TPU, so the trunk NEVER computes in 4D — every LN /
        modulate / matmul runs on the flat (B, T*L, C) view and 4D shapes
        exist only between cancelling reshapes at the attention kernels."""
        padded = self.padded
        B, T, L = mask.shape
        C = x.shape[-1] // L if padded else x.shape[-1]
        m = self.cfg.model
        mod = dense(9 * C, name="adaLN", kernel_init=zero_init, dtype=self.dtype)(nn.silu(t_emb))
        sh_l, sc_l, g_l, sh_t, sc_t, g_t, sh_m, sc_m, g_m = jnp.split(mod, 9, axis=-1)

        if m.interleave_ipa:
            x4 = x.reshape(B, T, L, C)
            ipa_in = nn.LayerNorm(epsilon=1e-5, name="ipa_norm", dtype=self.dtype)(x4)
            x4 = x4 + InvariantPointAttention(
                **_ipa_kwargs(self.cfg, self.dtype), dropout=m.dropout, name="ipa"
            )(ipa_in, Rigid(frames.rot[:, None], frames.trans[:, None]), frame_mask=mask, train=self.train)
            x = x4.reshape(B, T * L, C)

        if padded:
            assert not (m.interleave_ipa or m.hyena or m.no_rope
                        or (m.dropout > 0.0 and self.train))
        if not (m.hyena or m.no_rope or (m.dropout > 0.0 and self.train)):
            # the WHOLE layer (residue attn -> frame attn -> MLP, each with
            # AdaLN modulate/gate) as one fused op: single Pallas kernel per
            # batch element on TPU, XLA composition of the same math
            # elsewhere (ops/fused_layer.py). Param trees stay identical to
            # the modular path (MHAParams/DenseParams mirror the modules).
            args = _fold_fused_args(
                MHAParams(C, name="mha_l")(), MHAParams(C, name="mha_t")(),
                DenseParams(4 * C, C, name="fc1")(),
                DenseParams(C, 4 * C, name="fc2")(),
                m.mha_heads, self.dtype)
            return fused_layer(
                x, mod, *args, mask,
                num_heads=m.mha_heads, tl=(T, L), padded_io=padded,
            )

        # attention over residues, frames as batch
        residual = x
        x = modulate(layer_norm(x), sh_l, sc_l)
        if m.no_rope:
            x = MultiheadAttention(
                C, m.mha_heads, use_rope=False, dropout=m.dropout, name="mha_l", dtype=self.dtype
            )(x.reshape(B * T, L, C), mask=mask.reshape(B * T, L), train=self.train).reshape(B, T * L, C)
        else:
            # factorized residue-attention path (fused small-L Pallas kernel
            # on TPU, ops/residue_attention.py)
            x = MultiheadAttention(
                C, m.mha_heads, use_rope=True, dropout=m.dropout, name="mha_l", dtype=self.dtype
            )(x, mask=mask, axis="residue", train=self.train, tl=(T, L))
        x = residual + gate(x, g_l)

        # attention (or Hyena) over frames, residues as batch
        residual = x
        x = modulate(layer_norm(x), sh_t, sc_t)
        if m.hyena:
            xt = x.reshape(B, T, L, C).transpose(0, 2, 1, 3).reshape(B * L, T, C)
            xt = HyenaOperator(
                d_model=C, l_max=self.cfg.data.num_frames, order=2,
                filter_order=m.hyena_filter_order, name="mha_t", dtype=self.dtype,
            )(xt)
            x = xt.reshape(B, L, T, C).transpose(0, 2, 1, 3).reshape(B, T * L, C)
        elif m.no_rope:
            xt = x.reshape(B, T, L, C).transpose(0, 2, 1, 3).reshape(B * L, T, C)
            xt = MultiheadAttention(
                C, m.mha_heads, use_rope=False, dropout=m.dropout, name="mha_t", dtype=self.dtype
            )(xt, mask=mask.transpose(0, 2, 1).reshape(B * L, T), train=self.train)
            x = xt.reshape(B, L, T, C).transpose(0, 2, 1, 3).reshape(B, T * L, C)
        else:
            # factorized frame-attention path (fused Pallas kernel on TPU,
            # ops/time_attention.py)
            x = MultiheadAttention(
                C, m.mha_heads, use_rope=True, dropout=m.dropout, name="mha_t", dtype=self.dtype
            )(x, mask=mask.transpose(0, 2, 1), train=self.train, tl=(T, L))
        x = residual + gate(x, g_t)

        # fused LN + modulate + MLP + gate + residual (one VMEM pass on TPU;
        # XLA composition elsewhere — ops/adaln_mlp.py)
        w1, b1 = DenseParams(4 * C, C, name="fc1")()
        w2, b2 = DenseParams(C, 4 * C, name="fc2")()
        return adaln_mlp(x, sh_m, sc_m, g_m, w1.astype(self.dtype), b1.astype(self.dtype),
                         w2.astype(self.dtype), b2.astype(self.dtype))


class LatentMDGen(nn.Module):
    """Top-level denoiser. __call__(x, t, mask, ...) -> velocity latents."""

    cfg: MDGenConfig
    latent_dim: int
    dtype: jnp.dtype = jnp.float32
    train: bool = False  # enables attention-prob dropout (reference mha.py:383, ipa.py:204)

    def setup(self):
        cfg = self.cfg
        m = cfg.model
        C = m.embed_dim
        task = cfg.task

        self.latent_to_emb = dense(C, name="latent_to_emb", dtype=self.dtype)
        if cfg.doubled_offsets:
            self.latent_to_emb_f = dense(C, name="latent_to_emb_f", dtype=self.dtype)
            self.latent_to_emb_r = dense(C, name="latent_to_emb_r", dtype=self.dtype)

        cond_dim = self.latent_dim - (20 if task.design else 0)
        self.cond_to_emb = dense(C, name="cond_to_emb", dtype=self.dtype)
        embed_init = nn.initializers.normal(1.0)  # torch nn.Embedding default
        self.mask_to_emb = nn.Embed(2, C, name="mask_to_emb", embedding_init=embed_init, dtype=self.dtype)
        if task.design:
            self.x_d_to_emb = dense(C, name="x_d_to_emb", dtype=self.dtype)

        layer_cls = nn.remat(LatentMDGenLayer) if m.grad_checkpointing else LatentMDGenLayer
        self.fused_trunk = not (m.interleave_ipa or m.hyena or m.no_rope
                                or (m.dropout > 0.0 and self.train))
        # parent-orchestrated trunk: the parent collects every layer's
        # weights + AdaLN and runs ops/fused_layer.fused_trunk — on TPU one
        # mega-kernel per batch element covers ALL layers (inter-layer
        # activations never leave VMEM). Parameter trees are identical to
        # the per-layer modules. grad_checkpointing keeps the per-layer
        # remat'd modules (the mega path saves its own minimal residuals
        # but remat semantics belong to the per-layer loop).
        self.parent_trunk = self.fused_trunk and not m.grad_checkpointing

        if m.prepend_ipa:
            if not m.no_aa_emb:
                self.aatype_to_emb = nn.Embed(
                    21, C, name="aatype_to_emb", embedding_init=nn.initializers.normal(1.0), dtype=self.dtype
                )
            if self.parent_trunk:
                # raw-weight twins: the whole encoder stack runs as ONE
                # streaming Pallas grid (ops/ipa_encoder.py)
                self.ipa_layers = [
                    IPALayerParams(cfg, dtype=self.dtype, name=f"ipa_layers_{i}")
                    for i in range(m.num_layers)
                ]
            else:
                self.ipa_layers = [
                    IPALayer(cfg, dtype=self.dtype, train=self.train, name=f"ipa_layers_{i}")
                    for i in range(m.num_layers)
                ]
        if self.parent_trunk:
            self.layers = [
                FusedLayerParams(cfg, dtype=self.dtype, name=f"layers_{i}")
                for i in range(m.num_layers)
            ]
        else:
            self.layers = [
                layer_cls(cfg, dtype=self.dtype, train=self.train,
                          padded=self.fused_trunk, name=f"layers_{i}")
                for i in range(m.num_layers)
            ]

        if not (task.dynamic_mpnn or task.mpnn):
            if self.parent_trunk:
                # raw-weight twin: the output head folds into the streaming
                # trunk kernel's last program (or runs as _final_xla)
                self.emb_to_latent = FinalLayerParams(
                    self.latent_dim, cfg, name="emb_to_latent", dtype=self.dtype)
            else:
                self.emb_to_latent = FinalLayer(self.latent_dim, name="emb_to_latent", dtype=self.dtype)
        if task.design:
            self.fc1 = dense(C, name="fc1", dtype=self.dtype)
            self.fc2 = dense(C, name="fc2", dtype=self.dtype)
            self.fc3 = dense(C, name="fc3", dtype=self.dtype)
            self.emb_to_logits = dense(20, name="emb_to_logits", dtype=self.dtype)

        self.t_embedder = TimestepEmbedder(C, name="t_embedder", dtype=self.dtype)
        if m.abs_pos_emb:
            self.pos_embed = jnp.asarray(sincos_pos_embed(C, cfg.data.crop))
        if m.abs_time_emb:
            self.time_embed = jnp.asarray(sincos_pos_embed(C, cfg.data.num_frames))

        if task.design:
            self.condflow = DirichletConditionalFlow(K=20, alpha_spacing=0.001, alpha_max=cfg.transport.alpha_max)

    # ------------------------------------------------------------------
    def make_encoder_pack(self):
        """Parent-path encoder weights: per-layer AdaLN projections
        concatenated (one matmul for every layer's 6-way mod) + the 27-tuple
        of NL-stacked fused-encoder weights (ops/ipa_encoder.fold_encoder_ws)."""
        m = self.cfg.model
        packs = [layer() for layer in self.ipa_layers]
        wmods = jnp.concatenate([p[0][0] for p in packs], axis=1).astype(self.dtype)
        bmods = jnp.concatenate([p[0][1] for p in packs]).astype(self.dtype)
        folded = [fold_encoder_ws(p[1], m.mha_heads, m.ipa_heads,
                                  m.ipa_head_dim, m.ipa_qk, m.ipa_v, self.dtype)
                  for p in packs]
        ws = tuple(jnp.stack([f[k] for f in folded]) for k in range(len(folded[0])))
        return wmods, bmods, ws

    def _encode(self, x, t_emb, mask, frames, enc_pack, mods=None):
        """One encoder pass: fused stack (parent path) or the IPALayer
        modules. ``mods``: precomputed encoder AdaLN rows (the flat-latent
        fast path batches them into the trunk's mods matmul)."""
        m = self.cfg.model
        if self.parent_trunk:
            if mods is None:
                wmods, bmods, _ws = (enc_pack if enc_pack is not None
                                     else self.make_encoder_pack())
                se = nn.silu(t_emb).astype(self.dtype)
                mods = se @ wmods + bmods  # (B, NL*6C)
            ws = (enc_pack if enc_pack is not None else self.make_encoder_pack())[2]
            return ipa_encoder(x, mods, ws, frames, mask,
                               num_heads_mha=m.mha_heads, Hi=m.ipa_heads,
                               Ch=m.ipa_head_dim, Pq=m.ipa_qk, Pv=m.ipa_v)
        for layer in self.ipa_layers:
            x = layer(x, t_emb, mask, frames=frames)
        return x

    def make_encoder_tokens(self, mask, aatype, start_frames, end_frames, x_d=None):
        """The encoder's input tokens — pure functions of the conditioning
        (aatype / endpoint frames), i.e. loop-invariant under an ODE scan.
        ``mask`` (B, L). Returns a 1- or 2-tuple matching run_ipa's
        ``tokens=``."""
        cfg = self.cfg
        if cfg.task.sim_condition or cfg.task.mpnn or cfg.task.cond_interval:
            B, L = mask.shape
            x = jnp.zeros((B, L, cfg.model.embed_dim), dtype=self.dtype)
            if aatype is not None and not cfg.model.no_aa_emb:
                x = x + self.aatype_to_emb(aatype)
            if cfg.task.design:
                x = x + self.x_d_to_emb(x_d)
            return (x,)
        x_f = self.latent_to_emb_f(start_frames.invert().compose(end_frames).to_tensor_7().astype(self.dtype))
        x_r = self.latent_to_emb_r(end_frames.invert().compose(start_frames).to_tensor_7().astype(self.dtype))
        if aatype is not None and not cfg.model.no_aa_emb:
            x_f = x_f + self.aatype_to_emb(aatype)
            x_r = x_r + self.aatype_to_emb(aatype)
        if cfg.task.design:
            x_f = x_f + self.x_d_to_emb(x_d)
            x_r = x_r + self.x_d_to_emb(x_d)
        return (x_f, x_r)

    def run_ipa(self, t_emb, mask, start_frames, end_frames, aatype, x_d=None,
                enc_pack=None, enc_mods=None, tokens=None):
        """Conditioning encoder over (B, L) (src/mdgen/model/latent_model.py:179-214)."""
        cfg = self.cfg
        if tokens is None:
            tokens = self.make_encoder_tokens(mask, aatype, start_frames, end_frames, x_d)
        if cfg.task.sim_condition or cfg.task.mpnn or cfg.task.cond_interval:
            return self._encode(tokens[0], t_emb, mask, start_frames, enc_pack,
                                mods=enc_mods)
        # tps / inpainting / dynamic_mpnn: forward+reverse relative-frame tokens
        x_f, x_r = tokens
        x_r = self._encode(x_r, t_emb, mask, start_frames, enc_pack, mods=enc_mods)
        x_f = self._encode(x_f, t_emb, mask, end_frames, enc_pack, mods=enc_mods)
        return x_r + x_f

    def make_trunk_pack(self):
        """Precompute the parent-trunk weight pack (AdaLN projections
        concatenated + the 16 fused args folded and NL-stacked). Samplers
        call this ONCE per sample (via apply(params, method=...)) and pass
        the result through ``trunk_pack`` so the ~26 MB fold+stack runs
        outside the ODE-step scan instead of once per step (measured ~0.1 ms
        per denoiser step at the bench shape)."""
        if not self.parent_trunk:
            return None
        packs = [layer() for layer in self.layers]
        # the FinalLayer's 2C adaLN rides in the same concatenated projection
        # (per-column equality with separate dense calls)
        fin = None
        wmod_cols = [p[0][0] for p in packs]
        bmod_cols = [p[0][1] for p in packs]
        task = self.cfg.task
        if not (task.dynamic_mpnn or task.mpnn):
            wmod2, bmod2, wfin, bfin = self.emb_to_latent()
            wmod_cols.append(wmod2)
            bmod_cols.append(bmod2)
            fin = (wfin, bfin)
        wmods = jnp.concatenate(wmod_cols, axis=1).astype(self.dtype)
        bmods = jnp.concatenate(bmod_cols).astype(self.dtype)
        from ..ops.fused_layer import pad_stage2_ws
        ws = pad_stage2_ws(
            tuple(jnp.stack([p[1][k] for p in packs]) for k in range(16)),
            self.cfg.model.mha_heads)
        enc = self.make_encoder_pack() if self.cfg.model.prepend_ipa else None
        # combined AdaLN projection: trunk (+FinalLayer) columns followed by
        # the encoder layers' columns — the flat-latent fast path computes
        # every per-step mod row with ONE (B, C) @ (C, ·) matmul and slices
        big = None
        if enc is not None:
            big = (jnp.concatenate([wmods, enc[0]], axis=1),
                   jnp.concatenate([bmods, enc[1]]), wmods.shape[1])
        return (wmods, bmods, ws, fin, enc, big)

    @staticmethod
    def flat_scan_ok(cfg: MDGenConfig) -> bool:
        """True when the flat-latent sampling fast path applies: the
        parent-orchestrated fused trunk with the output head folded (plain
        continuous latents — no design/mpnn reshaping of x)."""
        m, task = cfg.model, cfg.task
        return not (m.interleave_ipa or m.hyena or m.no_rope or m.grad_checkpointing
                    or task.design or task.mpnn or task.dynamic_mpnn)

    def embed_times(self, t):
        """t (N,) or (N, B) -> timestep embeddings (N, C) / (N, B, C). The
        ODE-step t grid is known before the scan, so samplers precompute the
        whole sinusoidal + MLP chain in ONE batched call and feed rows per
        step via ``t_emb=`` (scan xs), deleting the per-step t-embedder ops."""
        mult = self.cfg.model.time_multiplier
        flat = t.reshape(-1)
        emb = self.t_embedder(flat * mult).astype(self.dtype)
        return emb.reshape(*t.shape, emb.shape[-1])

    def make_scan_consts(self, x_cond, x_cond_mask, mask, aatype=None,
                         start_frames=None, end_frames=None):
        """Per-ODE-step-constant embed terms for the flat-latent sampling
        fast path, computed ONCE per sample call. Everything here depends
        only on the conditioning — not on (x, t) — yet the reference (and
        our plain ``__call__``) re-computes it per denoiser call
        (src/mdgen/model/latent_model.py:216-247); under a 100-step ODE scan
        it is loop-invariant, and XLA does not hoist it out of the scan.

        Returns ``(wlat_p, const_add, biases)``:
          - ``wlat_p`` (P, C): the latent_to_emb kernel, rows zero-padded to
            P = the folded output head's 128-rounded lane-block width, so
            ``x_flat[:, :, l*P:(l+1)*P] @ wlat_p`` consumes the carry's pad
            lanes harmlessly (they are exactly zero anyway — the folded
            head's padded wfin columns emit zeros there);
          - ``const_add`` (B, Tp, L*C): latent_to_emb bias + abs pos/time
            tables + cond/mask embeddings, summed in the padded trunk
            layout (pad rows zero);
          - ``biases``: the trunk kernel's additive mask biases
            (ops/fused_layer.make_trunk_biases), equally loop-invariant;
          - ``tokens``: the encoder's input tokens (make_encoder_tokens),
            when the conditioning args are supplied — else None and
            _flat_call rebuilds them per step."""
        cfg = self.cfg
        B, T, L = mask.shape
        C = cfg.model.embed_dim
        Tp = -(-T // 8) * 8
        P = -(-self.latent_dim // 128) * 128

        wlat = self.latent_to_emb.variables["params"]["kernel"]  # (lat, C)
        blat = self.latent_to_emb.variables["params"]["bias"]
        wlat_p = jnp.pad(wlat.astype(self.dtype), ((0, P - wlat.shape[0]), (0, 0)))

        add = jnp.broadcast_to(blat.astype(self.dtype), (B, T * L, C))
        if cfg.model.abs_pos_emb:
            if L > self.pos_embed.shape[0]:
                raise ValueError(
                    f"peptide length {L} exceeds the absolute position table "
                    f"(cfg.data.crop = {self.pos_embed.shape[0]})")
            add = add + jnp.tile(self.pos_embed[:L].astype(self.dtype), (T, 1))[None]
        if cfg.model.abs_time_emb:
            add = add + jnp.repeat(self.time_embed[:T].astype(self.dtype), L, axis=0)[None]
        if x_cond is not None:
            add = (add + self.cond_to_emb(x_cond.astype(self.dtype).reshape(B, T * L, -1))
                   + self.mask_to_emb(x_cond_mask.reshape(B, T * L)))
        add = add.reshape(B, T, L * C)
        if Tp != T:
            add = jnp.pad(add, ((0, 0), (0, Tp - T), (0, 0)))
        from ..ops.fused_layer import make_trunk_biases
        tokens = None
        if cfg.model.prepend_ipa and (aatype is not None or start_frames is not None):
            tokens = self.make_encoder_tokens(mask[:, 0], aatype,
                                              start_frames, end_frames)
        return (wlat_p, add.astype(self.dtype),
                make_trunk_biases(mask, T, L, C), tokens)

    def __call__(
        self,
        x,
        t,
        mask,
        start_frames: Optional[Rigid] = None,
        end_frames: Optional[Rigid] = None,
        x_cond=None,
        x_cond_mask=None,
        aatype=None,
        trunk_pack=None,
        scan_consts=None,
        ode_dt=None,
        t_emb=None,
        enc=None,
        mods=None,
    ):
        cfg = self.cfg
        task = cfg.task
        if scan_consts is not None:
            # flat-latent sampling fast path: ``x`` arrives in the padded
            # trunk layout (B, Tp, L*P) and the velocity — or with ``ode_dt``
            # the euler-updated carry — is returned in the same layout; no
            # embed matmul chain, pad, tile, slice, or reshape runs per ODE
            # step (the per-step-constant embed terms were precomputed by
            # make_scan_consts; ~0.3 ms/step of XLA glue at the bench shape,
            # PERF.md r3)
            return self._flat_call(x, t, mask, scan_consts, trunk_pack,
                                   start_frames, end_frames, aatype,
                                   ode_dt=ode_dt, t_emb=t_emb, enc=enc,
                                   mods=mods)
        if task.dynamic_mpnn:
            sel = jnp.array([0, x.shape[1] - 1])
            x, x_cond, x_cond_mask, mask = x[:, sel], x_cond[:, sel], x_cond_mask[:, sel], mask[:, sel]
        if task.mpnn:
            x, x_cond, x_cond_mask, mask = x[:, :1], x_cond[:, :1], x_cond_mask[:, :1], mask[:, :1]

        x_d = x[..., -20:].mean(axis=1) if task.design else None  # (B, L, 20)

        # flat (B, T*L, C) embed + trunk: a physical (..., L, C) tensor with
        # small L pads L to 8 sublanes on TPU (2x memory on every embed-stage
        # op, plus relayouts at the trunk boundary), so the latent projection
        # and every conditioning add run on the flat rows — position/time/
        # encoder terms are tiled to rows (identical values to the broadcast
        # adds; row t*L+l <- (t, l))
        B, T, L = mask.shape
        x = x.astype(self.dtype)
        h = self.latent_to_emb(x.reshape(B, T * L, x.shape[-1]))
        C = h.shape[-1]
        if cfg.model.abs_pos_emb:
            if L > self.pos_embed.shape[0]:
                raise ValueError(
                    f"peptide length {L} exceeds the absolute position table "
                    f"(cfg.data.crop = {self.pos_embed.shape[0]}); with "
                    f"--abs_pos_emb the model is built for crop-length "
                    f"peptides (reference latent_model.py pos_embed)")
            pos = self.pos_embed[:L].astype(self.dtype)  # (L, C)
            h = h + jnp.tile(pos, (T, 1))[None]
        if cfg.model.abs_time_emb:
            tim = self.time_embed[:T].astype(self.dtype)  # (T, C)
            h = h + jnp.repeat(tim, L, axis=0)[None]
        if x_cond is not None:
            h = (h + self.cond_to_emb(x_cond.astype(self.dtype).reshape(B, T * L, -1))
                 + self.mask_to_emb(x_cond_mask.reshape(B, T * L)))

        t_emb = self.t_embedder(t * cfg.model.time_multiplier).astype(self.dtype)  # (B, C)

        pack = None
        if self.parent_trunk:
            pack = trunk_pack if trunk_pack is not None else self.make_trunk_pack()

        enc = None
        if cfg.model.prepend_ipa:
            enc = self.run_ipa(
                t_emb, mask[:, 0], start_frames, end_frames, aatype, x_d=x_d,
                enc_pack=pack[4] if pack is not None else None,
            )
        if not self.fused_trunk and enc is not None:
            h = h + jnp.tile(enc, (1, T, 1))  # row t*L+l <- enc[:, l]
        if self.fused_trunk:
            # padded-trunk fast path: the frame-pad to Tp (and its inverse
            # slice) happens ONCE here instead of inside every fused layer,
            # so the inter-layer (B, Tp, L*C) activations flow kernel to
            # kernel with no pad/slice/reshape relayouts between them
            Tp = -(-T // 8) * 8
            h = h.reshape(B, T, L * C)
            if enc is not None:
                # broadcast add in the trunk layout (lane-block l <- enc[:, l])
                # — a row-tile here would relayout the full trunk
                h = h + enc.reshape(B, 1, L * C)
            if Tp != T:
                h = jnp.pad(h, ((0, 0), (0, Tp - T), (0, 0)))
            if self.parent_trunk:
                # every layer's AdaLN (and the FinalLayer's) in ONE matmul:
                # concat the zero-init projections' columns (exact
                # per-column equality with the per-layer dense calls)
                wmods, bmods, ws, fin, _enc = pack[:5]
                NL = len(self.layers)
                se = nn.silu(t_emb).astype(self.dtype)
                mods_all = se @ wmods + bmods  # (B, NL*9C [+ 2C])
                mods = mods_all[:, :NL * 9 * C]
                modf = mods_all[:, NL * 9 * C:]
                if fin is not None and not task.design:
                    # output head folded into the kernel's last program:
                    # returns the latent directly, (B, Tp, L*OP) f32
                    out = fused_trunk(h, mods, ws, mask,
                                      num_heads=cfg.model.mha_heads, tl=(T, L),
                                      final=(modf, *fin))
                    OP = out.shape[2] // L
                    latent = out.reshape(B, -1, L, OP)[:, :T, :, :self.latent_dim]
                    return latent.astype(jnp.float32)
                h = fused_trunk(h, mods, ws, mask,
                                num_heads=cfg.model.mha_heads, tl=(T, L))
                h = h[:, :T].reshape(B, T * L, C)
                if fin is not None:  # design head needs h too
                    latent = _final_xla(h, modf, *fin, self.dtype).reshape(B, T, L, -1)
            else:
                for layer in self.layers:
                    h = layer(h, t_emb, mask, start_frames)
                h = h[:, :T].reshape(B, T * L, C)
        else:
            for layer in self.layers:
                h = layer(h, t_emb, mask, start_frames)

        if not (task.dynamic_mpnn or task.mpnn) and not self.parent_trunk:
            latent = self.emb_to_latent(h, t_emb).reshape(B, T, L, -1)
        if task.design:
            x_l = self.fc2(gelu_erf(self.fc1(h))).reshape(B, T, L, C).mean(axis=1)  # pool over frames
            logits = self.emb_to_logits(gelu_erf(self.fc3(x_l)))  # (B, L, 20)
            if task.dynamic_mpnn or task.mpnn:
                return logits[:, None]
            latent = latent.at[..., -20:].add(logits[:, None])
        return latent.astype(jnp.float32)

    # ------------------------------------------------------------------
    # (Whole-t-grid precompute history: an r2/r3 attempt feeding RANK-4
    # (N, B, L, C) encoder xs made XLA's compile time scale linearly with
    # the scan length (28+ min at the bench shape). The r4 encode_steps
    # path feeds the same data as RANK-3 (N, B, L*C) xs — compiles in ~70 s
    # and moves the latency-bound per-step encoder kernel off the chain
    # (+0.8% steps/s, the 10k-gate margin). The 4D xs shape was the
    # pathology trigger, not the size.)

    def _flat_call(self, x, t, mask, scan_consts, trunk_pack,
                   start_frames, end_frames, aatype, ode_dt=None, t_emb=None,
                   enc=None, mods=None):
        """Fast-path body: trunk-layout x in, trunk-layout velocity out —
        or, with ``ode_dt``, the euler-updated carry ``x + dt * v`` directly
        (the embed stage AND the update are folded into the trunk kernel, so
        the whole denoiser step is one pallas_call + the encoder kernel).
        Produces bitwise the same valid-row/lane values as ``__call__``
        (pinned by tests/test_flat_scan.py); pad rows carry garbage that no
        valid output reads (attention masks them as keys), and pad lanes
        stay exactly zero (zero wlat_p rows in, zero wfin columns out)."""
        cfg = self.cfg
        consts = tuple(scan_consts) + (None,) * (4 - len(scan_consts))
        wlat_p, const_add, biases, tokens = consts
        B, T, L = mask.shape
        C = cfg.model.embed_dim
        pack = trunk_pack if trunk_pack is not None else self.make_trunk_pack()
        wmods, bmods, ws, fin, encp = pack[:5]
        big = pack[5] if len(pack) > 5 else None
        NL = len(self.layers)
        if mods is not None:
            # whole-t-grid AdaLN precompute (embed_mods): the per-step
            # silu + mods matmul disappears from the scan entirely — the
            # r5 change that put the chain at the kernel-only floor
            assert enc is not None or not cfg.model.prepend_ipa, \
                "mods= precompute requires enc= (encode_steps) with prepend_ipa"
            mods_all = mods
        else:
            if t_emb is None:
                t_emb = self.t_embedder(t * cfg.model.time_multiplier).astype(self.dtype)
            se = nn.silu(t_emb).astype(self.dtype)
            # one matmul for every per-step AdaLN row: trunk layers +
            # FinalLayer + the encoder layers (columns concatenated in
            # make_trunk_pack); with a precomputed ``enc`` (encode_steps)
            # only the trunk columns run
            enc_mods = None
            if big is not None and cfg.model.prepend_ipa and enc is None:
                wbig, bbig, ncut = big
                mall = se @ wbig + bbig
                mods_all, enc_mods = mall[:, :ncut], mall[:, ncut:]
            else:
                mods_all = se @ wmods + bmods
            if enc is None and cfg.model.prepend_ipa:
                enc = self.run_ipa(t_emb, mask[:, 0], start_frames, end_frames,
                                   aatype, enc_pack=encp, enc_mods=enc_mods,
                                   tokens=tokens)
        mods = mods_all[:, :NL * 9 * C]
        modf = mods_all[:, NL * 9 * C:]
        return fused_trunk(x, mods, ws, mask, num_heads=cfg.model.mha_heads,
                           tl=(T, L), final=(modf, *fin),
                           embed=(wlat_p, const_add, enc),
                           step_dt=ode_dt, biases=biases)  # (B, Tp, L*P) f32

    def embed_mods(self, t_embs, trunk_pack=None):
        """Whole-t-grid AdaLN precompute: ``t_embs`` (S, B, C) from
        embed_times -> (S, B, NL*9*C + 2C) trunk+FinalLayer modulation rows,
        fed per step through scan xs (``mods=``). Removes the per-step
        silu + (B, C) @ (C, ~19k C) matmul from the sampling chain — with
        encode_steps this makes each euler step exactly ONE pallas_call
        (measured r5: the frozen-xs chain runs 1.4% faster than the
        per-step-mods chain; this captures that gap for the real sampler).
        ~250 MB bf16 at S=100/B=64 — scan xs slices stream it from HBM at
        ~3 us/step."""
        pack = trunk_pack if trunk_pack is not None else self.make_trunk_pack()
        wmods, bmods = pack[0], pack[1]
        Sn, B, C = t_embs.shape
        se = nn.silu(t_embs.reshape(Sn * B, C)).astype(self.dtype)
        mall = se @ wmods + bmods
        return mall.reshape(Sn, B, mall.shape[-1])

    def encode_steps(self, ts, mask, scan_consts, trunk_pack,
                     start_frames=None, end_frames=None, aatype=None):
        """Precompute the prepend-IPA encoder output for a whole t grid in
        chunk-batched kernel calls: ``ts`` (S, B) -> enc (S, B, L*C). The
        per-step encoder kernel is latency-bound (5 tiny programs over L*B
        rows, ~0.064 ms at the bench shape); batching the S steps' rows into
        ~512-row chunks amortizes that dependent-op latency, and the scan
        then passes ``enc`` slices into _flat_call so the per-step cost is
        ONE pallas_call (the trunk). Conditioning (mask/frames/aatype/
        tokens) is step-invariant — only t_emb varies."""
        cfg = self.cfg
        if not cfg.model.prepend_ipa:
            return None
        consts = tuple(scan_consts) + (None,) * (4 - len(scan_consts))
        _, _, _, tokens = consts
        B, T, L = mask.shape
        C = cfg.model.embed_dim
        Sn = ts.shape[0]
        pack = trunk_pack if trunk_pack is not None else self.make_trunk_pack()
        encp = pack[4]
        big = pack[5] if len(pack) > 5 else None
        t_embs = self.t_embedder(
            ts.reshape(-1) * cfg.model.time_multiplier).astype(self.dtype)
        se = nn.silu(t_embs).astype(self.dtype)
        enc_mods = None
        if big is not None:
            wbig, bbig, ncut = big
            enc_mods = se @ wbig[:, ncut:] + bbig[ncut:]
        tile = lambda a: jnp.broadcast_to(a[None], (Sn,) + a.shape).reshape(
            (Sn * a.shape[0],) + a.shape[1:])
        toks = tokens if tokens is not None else self.make_encoder_tokens(
            mask[:, 0], aatype, start_frames, end_frames)
        toks_t = tuple(tile(tk) for tk in toks)
        f_s = (jax.tree_util.tree_map(tile, start_frames)
               if start_frames is not None else None)
        f_e = (jax.tree_util.tree_map(tile, end_frames)
               if end_frames is not None else None)
        mask_t = tile(mask[:, 0])
        aat_t = tile(aatype) if aatype is not None else None
        rows = Sn * B
        CH = max(B, 512 // max(L, 1))
        sl_tree = lambda t_, s: jax.tree_util.tree_map(lambda a: a[s], t_)
        parts = []
        for i0 in range(0, rows, CH):
            s = slice(i0, min(i0 + CH, rows))
            parts.append(self.run_ipa(
                t_embs[s], mask_t[s],
                sl_tree(f_s, s) if f_s is not None else None,
                sl_tree(f_e, s) if f_e is not None else None,
                aat_t[s] if aat_t is not None else None,
                enc_pack=encp,
                enc_mods=enc_mods[s] if enc_mods is not None else None,
                tokens=tuple(tk[s] for tk in toks_t)))
        enc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return enc.reshape(Sn, B, L * C)

    def flat_euler_steps(self, x, ts, mask, scan_consts, trunk_pack,
                         start_frames=None, end_frames=None, aatype=None,
                         ode_dt=None, t_embs=None):
        """S euler steps in ONE fused-trunk kernel call (the multi-step fold,
        ops/fused_layer.fused_trunk ode_steps=S). ``ts`` (S, B); ``x`` the
        flat f32 carry (B, Tp, L*P). All S steps' AdaLN rows come from one
        (S*B, C) matmul and all S encoder passes from one batched encoder
        kernel call; the inter-step carry never leaves VMEM. Bitwise equal
        to S successive single-step _flat_call euler updates (pinned by
        tests/test_flat_scan.py)."""
        cfg = self.cfg
        consts = tuple(scan_consts) + (None,) * (4 - len(scan_consts))
        wlat_p, const_add, biases, tokens = consts
        B, T, L = mask.shape
        C = cfg.model.embed_dim
        Sn = ts.shape[0]
        pack = trunk_pack if trunk_pack is not None else self.make_trunk_pack()
        wmods, bmods, ws, fin, encp = pack[:5]
        big = pack[5] if len(pack) > 5 else None
        NL = len(self.layers)
        if t_embs is None:
            t_embs = self.t_embedder(
                ts.reshape(-1) * cfg.model.time_multiplier).astype(self.dtype)
        t_embs = t_embs.reshape(Sn * B, C)
        se = nn.silu(t_embs).astype(self.dtype)
        enc_mods = None
        if big is not None and cfg.model.prepend_ipa:
            wbig, bbig, ncut = big
            mall = se @ wbig + bbig  # (S*B, ncut + enc cols)
            mods_all, enc_mods = mall[:, :ncut], mall[:, ncut:]
        else:
            mods_all = se @ wmods + bmods
        enc = None
        if cfg.model.prepend_ipa:
            tile = lambda a: jnp.broadcast_to(a[None], (Sn,) + a.shape).reshape(
                (Sn * a.shape[0],) + a.shape[1:])
            toks = tokens if tokens is not None else self.make_encoder_tokens(
                mask[:, 0], aatype, start_frames, end_frames)
            toks_t = tuple(tile(tk) for tk in toks)
            f_s = (jax.tree_util.tree_map(tile, start_frames)
                   if start_frames is not None else None)
            f_e = (jax.tree_util.tree_map(tile, end_frames)
                   if end_frames is not None else None)
            mask_t = tile(mask[:, 0])
            aat_t = tile(aatype) if aatype is not None else None
            # the fused encoder kernel holds every row of its batch in one
            # program (grid (NL,)), so large S*B groups must chunk the rows
            # — VMEM scales linearly and ~512 L*rows sits well under the cap
            rows = Sn * B
            CH = max(B, 512 // max(L, 1))
            sl_tree = lambda t, s: jax.tree_util.tree_map(lambda a: a[s], t)
            parts = []
            for i0 in range(0, rows, CH):
                s = slice(i0, min(i0 + CH, rows))
                parts.append(self.run_ipa(
                    t_embs[s], mask_t[s],
                    sl_tree(f_s, s) if f_s is not None else None,
                    sl_tree(f_e, s) if f_e is not None else None,
                    aat_t[s] if aat_t is not None else None,
                    enc_pack=encp,
                    enc_mods=enc_mods[s] if enc_mods is not None else None,
                    tokens=tuple(tk[s] for tk in toks_t)))
            enc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            # rows are (s, b)-major; the kernel wants (B, S, L*C)
            enc = enc.reshape(Sn, B, L * C).transpose(1, 0, 2)
        mods = mods_all[:, :NL * 9 * C].reshape(Sn, B, NL * 9 * C)
        mods = mods.transpose(1, 0, 2).reshape(B, Sn * NL * 9 * C)
        modf = mods_all[:, NL * 9 * C:].reshape(Sn, B, 2 * C).transpose(1, 0, 2)
        return fused_trunk(x, mods, ws, mask, num_heads=cfg.model.mha_heads,
                           tl=(T, L), final=(modf, *fin),
                           embed=(wlat_p, const_add, enc),
                           step_dt=ode_dt, biases=biases,
                           ode_steps=Sn)  # (B, Tp, L*P) f32

    # ------------------------------------------------------------------
    def forward_inference(self, x, t, mask, **kwargs):
        """Sampling-time forward; transforms design logits into the Dirichlet
        conditional-flow field (src/mdgen/model/latent_model.py:272-326) fully
        on-device."""
        cfg = self.cfg
        task = cfg.task
        if not task.design or task.dynamic_mpnn or task.mpnn:
            return self(x, t, mask, **kwargs)

        x_discrete = x[..., -20:]
        latent = self(x, t, mask, **kwargs)
        latent_continuous = latent[..., :-20]
        logits = latent[..., -20:]

        flow_probs = jax.nn.softmax(logits / cfg.transport.dirichlet_flow_temp, axis=-1)
        flow_probs = simplex_proj(flow_probs)

        alpha, dalpha_dt = t_to_alpha(t[0], cfg.transport.alpha_max)
        alpha = jnp.clip(alpha, 1.0, cfg.transport.alpha_max - self.condflow.alpha_spacing)
        c_factor = self.condflow.c_factor(x_discrete, alpha)
        if cfg.transport.allow_nan_cfactor:
            c_factor = jnp.nan_to_num(c_factor)

        eye = jnp.eye(20, dtype=x_discrete.dtype)
        cond_flows = (eye - x_discrete[..., None]) * c_factor[..., None, :]
        flow = jnp.sum(flow_probs[..., None, :] * cond_flows, axis=-1) * dalpha_dt
        return jnp.concatenate([latent_continuous, flow], axis=-1)
