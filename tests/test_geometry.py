"""Numerical parity of the JAX geometry core vs the torch reference implementation."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import mdgen.geometry as ref_geom  # noqa: E402  (reference, torch)
from mdgen.rigid_utils import Rigid as RefRigid, Rotation as RefRotation  # noqa: E402

from mdgen_finetune_tpu.geometry import frames as F  # noqa: E402
from mdgen_finetune_tpu.geometry.rigid import Rigid, quat_to_rotmat, rotmat_to_quat  # noqa: E402

RNG = np.random.default_rng(0)


def random_rotmats(shape):
    q = RNG.normal(size=(*shape, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(quat_to_rotmat(jnp.asarray(q, dtype=jnp.float64)))


def test_quat_roundtrip():
    rots = random_rotmats((50,))
    q = rotmat_to_quat(jnp.asarray(rots))
    rots2 = quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(rots2), rots, atol=1e-5)


def test_rigid_algebra_vs_reference():
    rot_a, rot_b = random_rotmats((7, 5)), random_rotmats((7, 5))
    t_a = RNG.normal(size=(7, 5, 3)).astype(np.float32)
    t_b = RNG.normal(size=(7, 5, 3)).astype(np.float32)
    pts = RNG.normal(size=(7, 5, 3)).astype(np.float32)

    mine_a = Rigid(jnp.asarray(rot_a, jnp.float32), jnp.asarray(t_a))
    mine_b = Rigid(jnp.asarray(rot_b, jnp.float32), jnp.asarray(t_b))
    ref_a = RefRigid(RefRotation(rot_mats=torch.tensor(rot_a, dtype=torch.float32)), torch.tensor(t_a))
    ref_b = RefRigid(RefRotation(rot_mats=torch.tensor(rot_b, dtype=torch.float32)), torch.tensor(t_b))

    comp = mine_a.compose(mine_b)
    ref_comp = ref_a.compose(ref_b)
    np.testing.assert_allclose(np.asarray(comp.rot), ref_comp.get_rots().get_rot_mats().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp.trans), ref_comp.get_trans().numpy(), atol=1e-5)

    inv = mine_a.invert()
    ref_inv = ref_a.invert()
    np.testing.assert_allclose(np.asarray(inv.trans), ref_inv.get_trans().numpy(), atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(mine_a.apply(jnp.asarray(pts))), ref_a.apply(torch.tensor(pts)).numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mine_a.invert_apply(jnp.asarray(pts))),
        ref_a.invert_apply(torch.tensor(pts)).numpy(),
        atol=1e-4,
    )

    # to_tensor_7: quaternions equal up to sign
    t7 = np.asarray(mine_a.to_tensor_7())
    ref_t7 = ref_a.to_tensor_7().numpy()
    sign = np.sign(t7[..., :1] * ref_t7[..., :1])
    np.testing.assert_allclose(t7[..., :4] * sign, ref_t7[..., :4], atol=1e-4)
    np.testing.assert_allclose(t7[..., 4:], ref_t7[..., 4:], atol=1e-5)


def _random_atom14(T=3, L=5):
    aatype = RNG.integers(0, 20, size=(L,))
    # idealized reconstruction gives physically-plausible atom positions
    frames = Rigid.from_quat_trans(
        jnp.asarray(RNG.normal(size=(T, L, 4)), jnp.float32),
        jnp.asarray(10 * RNG.normal(size=(T, L, 3)), jnp.float32),
    )
    tors = RNG.normal(size=(T, L, 7, 2))
    tors /= np.linalg.norm(tors, axis=-1, keepdims=True)
    aat = jnp.asarray(np.broadcast_to(aatype, (T, L)))
    atom14 = F.frames_torsions_to_atom14(frames, jnp.asarray(tors, jnp.float32), aat)
    return np.asarray(atom14), np.asarray(aat), frames, tors


def test_atom_map_parity():
    atom14, aatype, _, _ = _random_atom14()
    mine37 = np.asarray(F.atom14_to_atom37(jnp.asarray(atom14), jnp.asarray(aatype)))
    ref37 = ref_geom.atom14_to_atom37(atom14, torch.tensor(aatype))
    np.testing.assert_allclose(mine37, np.asarray(ref37), atol=1e-5)

    back = np.asarray(F.atom37_to_atom14(jnp.asarray(mine37), jnp.asarray(aatype)))
    ref14 = ref_geom.atom37_to_atom14(np.asarray(ref37), torch.tensor(aatype))
    np.testing.assert_allclose(back, np.asarray(ref14), atol=1e-5)


def test_atom14_to_frames_parity():
    atom14, aatype, _, _ = _random_atom14()
    mine = F.atom14_to_frames(jnp.asarray(atom14))
    ref = ref_geom.atom14_to_frames(torch.tensor(atom14))
    np.testing.assert_allclose(np.asarray(mine.rot), ref.get_rots().get_rot_mats().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mine.trans), ref.get_trans().numpy(), atol=1e-5)


def test_torsions_parity():
    atom14, aatype, _, _ = _random_atom14()
    atom37 = np.asarray(F.atom14_to_atom37(jnp.asarray(atom14), jnp.asarray(aatype)))
    mine_t, mine_m = F.atom37_to_torsions(jnp.asarray(atom37), jnp.asarray(aatype))
    ref_t, ref_m = ref_geom.atom37_to_torsions(atom37, torch.tensor(aatype))
    np.testing.assert_allclose(np.asarray(mine_m), ref_m.numpy(), atol=1e-5)
    # undefined torsions (mask 0) hold numerically-unstable garbage; compare valid only
    m = ref_m.numpy()[..., None]
    np.testing.assert_allclose(np.asarray(mine_t) * m, ref_t.numpy() * m, atol=2e-4)


def test_frames_torsions_to_atom14_parity():
    atom14, aatype, frames, tors = _random_atom14()
    ref_frames = RefRigid(
        RefRotation(rot_mats=torch.tensor(np.asarray(frames.rot))), torch.tensor(np.asarray(frames.trans))
    )
    ref14 = ref_geom.frames_torsions_to_atom14(
        ref_frames, torch.tensor(tors, dtype=torch.float32), torch.tensor(aatype)
    )
    np.testing.assert_allclose(atom14, ref14.numpy(), atol=1e-4)


def test_roundtrip_consistency():
    """atom14 -> (frames, torsions) -> atom14 reproduces backbone-consistent coords."""
    atom14, aatype, frames, tors = _random_atom14()
    rec_frames = F.atom14_to_frames(jnp.asarray(atom14))
    tvec = np.asarray(rec_frames.trans)
    np.testing.assert_allclose(tvec, np.asarray(frames.trans), atol=1e-3)
    np.testing.assert_allclose(np.asarray(rec_frames.rot), np.asarray(frames.rot), atol=1e-3)

    atom37 = F.atom14_to_atom37(jnp.asarray(atom14), jnp.asarray(aatype))
    rec_tors, mask = F.atom37_to_torsions(atom37, jnp.asarray(aatype))
    err = (np.asarray(rec_tors) - tors) * np.asarray(mask)[..., None]
    # chi torsions round-trip exactly; omega/phi cross residues and are only
    # defined for chain-consistent coordinates, so restrict to psi + chis
    assert np.abs(err[..., 2:, :]).max() < 1e-3


def test_featurize_batch_matches_reference_dataset_path():
    """On-device featurizer == the reference dataset's CPU featurization
    (src/mdgen/dataset.py:73-91) for the same atom14 window."""
    from mdgen_finetune_tpu.data.featurize import featurize_atom14_batch

    atom14, aatype, _, _ = _random_atom14(T=4, L=5)
    # reference path (torch)
    frames_ref = ref_geom.atom14_to_frames(torch.tensor(atom14))
    atom37_ref = torch.tensor(ref_geom.atom14_to_atom37(atom14, torch.tensor(aatype)))
    torsions_ref, torsion_mask_ref = ref_geom.atom37_to_torsions(atom37_ref, torch.tensor(aatype))

    feats = featurize_atom14_batch(
        jnp.asarray(atom14[None]), jnp.asarray(aatype[0][None]), jnp.ones((1, 5), jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(feats["rots"])[0], frames_ref.get_rots().get_rot_mats().numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(feats["trans"])[0], frames_ref.get_trans().numpy(), atol=1e-5)
    m = torsion_mask_ref.numpy()[..., None]
    np.testing.assert_allclose(
        np.asarray(feats["torsions"])[0] * m, torsions_ref.numpy() * m, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(feats["torsion_mask"])[0], torsion_mask_ref.numpy()[0], atol=1e-6)
