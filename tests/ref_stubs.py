"""Import stubs so the reference torch model can run as a parity oracle.

The reference imports `esm.rotary_embedding.RotaryEmbedding` (fair-esm) and
`Bio.PDB` (biopython), neither of which is installed. We provide:
- a faithful reimplementation of ESM's public rotary-embedding math (the same
  half-split RoPE used by the reference's MHA, src/mdgen/model/mha.py:129-130,
  356-357) — this doubles as the oracle for our JAX RoPE;
- an empty Bio.PDB stub (only touched when parsing PDBs, which tests don't do).

Import this module BEFORE importing anything from `mdgen.model`.
"""
import sys
import types

import torch


def _rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat((-x2, x1), dim=-1)


def _apply_rotary_pos_emb(x, cos, sin):
    cos = cos[:, : x.shape[-2], :]
    sin = sin[:, : x.shape[-2], :]
    return (x * cos) + (_rotate_half(x) * sin)


class RotaryEmbedding(torch.nn.Module):
    """ESM-style rotary embedding: inv_freq over head_dim, half-split rotation."""

    def __init__(self, dim: int, *_, **__):
        super().__init__()
        inv_freq = 1.0 / (10000 ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer("inv_freq", inv_freq)
        self._seq_len_cached = None
        self._cos_cached = None
        self._sin_cached = None

    def _update_cos_sin_tables(self, x, seq_dimension=-2):
        seq_len = x.shape[seq_dimension]
        if seq_len != self._seq_len_cached or self._cos_cached.device != x.device:
            self._seq_len_cached = seq_len
            t = torch.arange(seq_len, device=x.device).type_as(self.inv_freq)
            freqs = torch.einsum("i,j->ij", t, self.inv_freq)
            emb = torch.cat((freqs, freqs), dim=-1).to(x.device)
            self._cos_cached = emb.cos()[None, :, :]
            self._sin_cached = emb.sin()[None, :, :]
        return self._cos_cached, self._sin_cached

    def forward(self, q, k):
        self._cos_cached, self._sin_cached = self._update_cos_sin_tables(k, seq_dimension=-2)
        return (
            _apply_rotary_pos_emb(q, self._cos_cached, self._sin_cached),
            _apply_rotary_pos_emb(k, self._cos_cached, self._sin_cached),
        )


def _stub_module(name, **attrs):
    if name in sys.modules:
        return
    try:
        __import__(name)
        return
    except ImportError:
        pass
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def install():
    # pytorch_lightning: only LightningModule subclassing is exercised by
    # wrapper.prep_batch parity tests
    class _LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

    _stub_module(
        "pytorch_lightning",
        LightningModule=_LightningModule,
        Trainer=object,
    )
    _stub_module("wandb", log=lambda *a, **k: None, init=lambda *a, **k: None)
    if "torchdiffeq" not in sys.modules:
        try:
            import torchdiffeq  # noqa: F401
        except ImportError:
            td = types.ModuleType("torchdiffeq")
            td.odeint = None  # only referenced, never called, in the modules we test
            sys.modules["torchdiffeq"] = td
    if "esm" not in sys.modules:
        esm = types.ModuleType("esm")
        rot = types.ModuleType("esm.rotary_embedding")
        rot.RotaryEmbedding = RotaryEmbedding
        esm.rotary_embedding = rot
        sys.modules["esm"] = esm
        sys.modules["esm.rotary_embedding"] = rot
    if "Bio" not in sys.modules:
        try:
            import Bio  # noqa: F401
        except ImportError:
            bio = types.ModuleType("Bio")
            pdb = types.ModuleType("Bio.PDB")
            pdb.PDBParser = object
            bio.PDB = pdb
            sys.modules["Bio"] = bio
            sys.modules["Bio.PDB"] = pdb
