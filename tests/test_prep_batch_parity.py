"""Golden parity of tasks.prep_batch vs the reference wrapper's batch prep
(src/mdgen/wrapper.py:283-365) across conditioning tasks."""
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, "tests")
torch = pytest.importorskip("torch")

import ref_stubs

ref_stubs.install()

import jax.numpy as jnp  # noqa: E402

from mdgen.wrapper import NewMDGenWrapper  # noqa: E402

from test_model_parity import make_args, make_cfg  # noqa: E402

from mdgen_finetune_tpu.tasks import prep_batch  # noqa: E402

RNG = np.random.default_rng(21)


def _batch(T=5, L=4, B=2):
    from mdgen_finetune_tpu.geometry.rigid import quat_to_rotmat

    q = RNG.normal(size=(B, T, L, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    tors = RNG.normal(size=(B, T, L, 7, 2)).astype(np.float32)
    tors /= np.linalg.norm(tors, axis=-1, keepdims=True)
    return {
        "rots": rots,
        "trans": (5 * RNG.normal(size=(B, T, L, 3))).astype(np.float32),
        "torsions": tors,
        "torsion_mask": (RNG.uniform(size=(B, L, 7)) > 0.2).astype(np.float32),
        "seqres": RNG.integers(0, 20, size=(B, L)),
        "mask": np.ones((B, L), np.float32),
    }


@pytest.mark.parametrize(
    "task_kw,latent_dim",
    [
        (dict(), 21),  # sim_condition default
        (dict(sim_condition=False, tps_condition=True), 28),
        (dict(sim_condition=False, inpainting=True, design=True, no_torsion=True), 48),
        (dict(cond_interval=2), 21),
        (dict(no_offsets=True), 21),
    ],
)
def test_prep_batch_parity(task_kw, latent_dim):
    args = make_args(prepend_ipa=True, num_layers=1, **task_kw)
    wrapper = NewMDGenWrapper(args)
    assert wrapper.latent_dim == latent_dim

    batch = _batch()
    ref_prep = wrapper.prep_batch({
        k: (torch.tensor(v) if k != "seqres" else torch.tensor(v)) for k, v in batch.items()
    })
    mine = prep_batch(make_cfg(args), {k: jnp.asarray(v) for k, v in batch.items()})

    # latents: quaternion offsets up to sign already canonicalized by both
    ref_lat = ref_prep["latents"].numpy()
    np.testing.assert_allclose(np.asarray(mine["latents"]), ref_lat, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mine["loss_mask"]), ref_prep["loss_mask"].numpy(), atol=1e-6)
    for k in ["mask", "aatype", "x_cond", "x_cond_mask"]:
        np.testing.assert_allclose(
            np.asarray(mine["model_kwargs"][k]),
            ref_prep["model_kwargs"][k].numpy(),
            atol=2e-4,
            err_msg=k,
        )
    # conditioning frames
    ref_sf = ref_prep["model_kwargs"]["start_frames"]
    np.testing.assert_allclose(
        np.asarray(mine["model_kwargs"]["start_frames"].rot),
        ref_sf.get_rots().get_rot_mats().numpy(),
        atol=1e-5,
    )
