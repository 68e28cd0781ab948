"""load_reference_checkpoint: Lightning-style .ckpt -> flax params (+EMA)."""
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, "tests")
torch = pytest.importorskip("torch")

import ref_stubs

ref_stubs.install()

import jax.numpy as jnp

from mdgen.model.latent_model import LatentMDGenModel
from test_model_parity import make_args, make_cfg

from mdgen_finetune_tpu.models import LatentMDGen
from mdgen_finetune_tpu.utils.torch_compat import load_reference_checkpoint


def test_load_lightning_checkpoint(tmp_path):
    torch.manual_seed(0)
    args = make_args(prepend_ipa=True)
    ref = LatentMDGenModel(args, 21)
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    ema_params = {k: v.clone() * 0.5 for k, v in ref.state_dict().items()}
    ckpt = {
        "state_dict": sd,
        "ema": {"params": ema_params, "decay": 0.999},
        "hyper_parameters": {"args": vars(args)},
    }
    path = str(tmp_path / "ref.ckpt")
    torch.save(ckpt, path)

    params, ema, hparams = load_reference_checkpoint(path)
    assert ema is not None
    # params load into the flax model and produce output
    cfg = make_cfg(args)
    mine = LatentMDGen(cfg, 21)
    import jax
    from mdgen_finetune_tpu.geometry.rigid import Rigid

    B, T, L = 1, args.num_frames, args.crop
    x = jnp.zeros((B, T, L, 21))
    out = mine.apply(
        params, x, jnp.asarray([0.5]), jnp.ones((B, T, L)),
        start_frames=Rigid.identity((B, L)), end_frames=Rigid.identity((B, L)),
        x_cond=jnp.zeros_like(x), x_cond_mask=jnp.zeros((B, T, L), jnp.int32),
        aatype=jnp.zeros((B, L), jnp.int32),
    )
    assert out.shape == (B, T, L, 21)
    # EMA weights are the scaled copies
    w = np.asarray(params["params"]["latent_to_emb"]["kernel"])
    we = np.asarray(ema["params"]["latent_to_emb"]["kernel"])
    np.testing.assert_allclose(we, 0.5 * w, atol=1e-6)
    assert hparams["args"]["prepend_ipa"] is True
