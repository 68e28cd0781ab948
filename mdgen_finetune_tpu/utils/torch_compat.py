"""Convert reference PyTorch checkpoints into this framework's param pytrees.

The released MDGen checkpoints (reference README.md:71-75) and any state_dict
of the reference ``LatentMDGenModel`` (src/mdgen/model/latent_model.py:43) can
be mapped name-for-name onto ``models.LatentMDGen`` parameters. Conventions:

- torch ``Linear.weight`` is (out, in); flax ``Dense.kernel`` is (in, out);
- torch ``Embedding.weight`` maps to flax ``Embed.embedding`` unchanged;
- torch ``LayerNorm.weight/bias`` map to flax ``scale/bias``;
- torch ``Conv1d.weight`` (out, in/groups, k) maps to flax ``Conv.kernel``
  (k, in/groups, out);
- fairseq MHA stores ``bias_k/bias_v`` as (1, 1, C) tensors, kept as-is.

Only used host-side (loading); never imported by compute-path modules.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _np(w) -> np.ndarray:
    return np.asarray(w)


def torch_mha_to_flax(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    out = {}
    for name in ["q_proj", "k_proj", "v_proj", "out_proj"]:
        out[name] = {"kernel": _t(sd[f"{prefix}.{name}.weight"]), "bias": _np(sd[f"{prefix}.{name}.bias"])}
    out["bias_k"] = _np(sd[f"{prefix}.bias_k"])
    out["bias_v"] = _np(sd[f"{prefix}.bias_v"])
    return out


def torch_ipa_to_flax(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    out = {}
    for name in ["linear_q", "linear_kv", "linear_q_points", "linear_kv_points", "linear_out"]:
        out[name] = {"kernel": _t(sd[f"{prefix}.{name}.weight"]), "bias": _np(sd[f"{prefix}.{name}.bias"])}
    out["head_weights"] = _np(sd[f"{prefix}.head_weights"])
    return out


def _linear(sd, name) -> dict:
    entry = {"kernel": _t(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        entry["bias"] = _np(sd[f"{name}.bias"])
    return entry


def _layernorm(sd, name) -> dict:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _ipa_layer(sd, p) -> dict:
    return {
        "adaLN": _linear(sd, f"{p}.adaLN_modulation.1"),
        "ipa_norm": _layernorm(sd, f"{p}.ipa_norm"),
        "ipa": torch_ipa_to_flax(sd, f"{p}.ipa"),
        "mha_l": torch_mha_to_flax(sd, f"{p}.mha_l.attn"),
        "fc1": _linear(sd, f"{p}.fc1"),
        "fc2": _linear(sd, f"{p}.fc2"),
    }


def _hyena_to_flax(sd, p) -> dict:
    filt = {
        "pos_z": _np(sd[f"{p}.filter_fn.pos_emb.z"]).reshape(-1, _np(sd[f"{p}.filter_fn.pos_emb.z"]).shape[-1]),
        "bias": _np(sd[f"{p}.filter_fn.bias"]),
        "mlp_in": _linear(sd, f"{p}.filter_fn.implicit_filter.0"),
        "sin_0": {"freq": _np(sd[f"{p}.filter_fn.implicit_filter.1.freq"])},
        "mlp_0": _linear(sd, f"{p}.filter_fn.implicit_filter.2"),
        "sin_1": {"freq": _np(sd[f"{p}.filter_fn.implicit_filter.3.freq"])},
        "mlp_1": _linear(sd, f"{p}.filter_fn.implicit_filter.4"),
        "sin_2": {"freq": _np(sd[f"{p}.filter_fn.implicit_filter.5.freq"])},
        "mlp_out": _linear(sd, f"{p}.filter_fn.implicit_filter.6"),
    }
    conv_w = _np(sd[f"{p}.short_filter.weight"])  # (out, in/groups, k)
    return {
        "in_proj": _linear(sd, f"{p}.in_proj"),
        "out_proj": _linear(sd, f"{p}.out_proj"),
        "short_filter": {
            "kernel": np.ascontiguousarray(conv_w.transpose(2, 1, 0)),
            "bias": _np(sd[f"{p}.short_filter.bias"]),
        },
        "filter_fn": filt,
    }


def _main_layer(sd, p, hyena: bool) -> dict:
    out = {
        "adaLN": _linear(sd, f"{p}.adaLN_modulation.1"),
        "mha_l": torch_mha_to_flax(sd, f"{p}.mha_l.attn"),
        "fc1": _linear(sd, f"{p}.fc1"),
        "fc2": _linear(sd, f"{p}.fc2"),
    }
    if hyena:
        out["mha_t"] = _hyena_to_flax(sd, f"{p}.mha_t")
    else:
        out["mha_t"] = torch_mha_to_flax(sd, f"{p}.mha_t.attn")
    if f"{p}.ipa_norm.weight" in sd:
        out["ipa_norm"] = _layernorm(sd, f"{p}.ipa_norm")
        out["ipa"] = torch_ipa_to_flax(sd, f"{p}.ipa")
    return out


def convert_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference LatentMDGenModel state_dict -> flax params dict for LatentMDGen."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    params["latent_to_emb"] = _linear(sd, "latent_to_emb")
    for name in ["latent_to_emb_f", "latent_to_emb_r", "cond_to_emb", "x_d_to_emb", "fc1", "fc2", "fc3", "emb_to_logits"]:
        if f"{name}.weight" in sd:
            params[name] = _linear(sd, name)
    for name in ["mask_to_emb", "aatype_to_emb"]:
        if f"{name}.weight" in sd:
            params[name] = {"embedding": _np(sd[f"{name}.weight"])}
    params["t_embedder"] = {
        "mlp0": _linear(sd, "t_embedder.mlp.0"),
        "mlp2": _linear(sd, "t_embedder.mlp.2"),
    }
    if "emb_to_latent.linear.weight" in sd:
        params["emb_to_latent"] = {
            "adaLN": _linear(sd, "emb_to_latent.adaLN_modulation.1"),
            "linear": _linear(sd, "emb_to_latent.linear"),
        }

    hyena = any(".mha_t.in_proj.weight" in k for k in sd)
    i = 0
    while f"layers.{i}.adaLN_modulation.1.weight" in sd:
        params[f"layers_{i}"] = _main_layer(sd, f"layers.{i}", hyena)
        i += 1
    i = 0
    while f"ipa_layers.{i}.adaLN_modulation.1.weight" in sd:
        params[f"ipa_layers_{i}"] = _ipa_layer(sd, f"ipa_layers.{i}")
        i += 1
    return {"params": params}


def load_reference_checkpoint(path: str):
    """Load a reference .ckpt (Lightning) and return (flax_params, ema_params_or_None, hparams)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"]
    model_sd = {k[len("model."):]: v.numpy() for k, v in sd.items() if k.startswith("model.")}
    params = convert_state_dict(model_sd)
    ema = None
    if "ema" in ckpt:
        ema_sd = {k: v.numpy() for k, v in ckpt["ema"]["params"].items()}
        ema = convert_state_dict(ema_sd)
    hparams = ckpt.get("hyper_parameters", {})
    return params, ema, hparams
