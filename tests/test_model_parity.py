"""Golden parity: JAX denoiser vs the reference torch model with identical weights."""
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, "tests")
torch = pytest.importorskip("torch")

import ref_stubs  # noqa: E402

ref_stubs.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mdgen.model.latent_model import LatentMDGenModel  # noqa: E402
from mdgen.model.mha import MultiheadAttention as RefMHA  # noqa: E402
from mdgen.model.ipa import InvariantPointAttention as RefIPA  # noqa: E402
from mdgen.rigid_utils import Rigid as RefRigid, Rotation as RefRotation  # noqa: E402

from mdgen_finetune_tpu.config import DataConfig, MDGenConfig, ModelConfig, TaskConfig  # noqa: E402
from mdgen_finetune_tpu.geometry.rigid import Rigid, quat_to_rotmat  # noqa: E402
from mdgen_finetune_tpu.models import LatentMDGen  # noqa: E402
from mdgen_finetune_tpu.models.attention import MultiheadAttention  # noqa: E402
from mdgen_finetune_tpu.models.ipa import InvariantPointAttention  # noqa: E402
from mdgen_finetune_tpu.utils.torch_compat import convert_state_dict, torch_ipa_to_flax, torch_mha_to_flax  # noqa: E402

RNG = np.random.default_rng(7)


def make_args(**kw):
    d = dict(
        design=False, tps_condition=False, inpainting=False, dynamic_mpnn=False, mpnn=False,
        sim_condition=True, cond_interval=None, hyena=False, no_rope=False, dropout=0.0,
        prepend_ipa=False, interleave_ipa=False, no_aa_emb=False, abs_pos_emb=True, abs_time_emb=True,
        num_layers=2, embed_dim=32, mha_heads=4, ipa_heads=2, ipa_head_dim=8, ipa_qk=4, ipa_v=4,
        time_multiplier=100.0, crop=4, num_frames=5, grad_checkpointing=False,
        alpha_max=8, dirichlet_flow_temp=1.0, allow_nan_cfactor=False,
        no_torsion=False, supervise_all_torsions=False, supervise_no_torsions=False,
        design_key_frames=False, no_design_torsion=False, no_offsets=False, no_frames=False,
        path_type="GVP", prediction="velocity", ema=False,
    )
    d.update(kw)
    return types.SimpleNamespace(**d)


def make_cfg(args):
    return MDGenConfig(
        model=ModelConfig(
            num_layers=args.num_layers, embed_dim=args.embed_dim, mha_heads=args.mha_heads,
            ipa_heads=args.ipa_heads, ipa_head_dim=args.ipa_head_dim, ipa_qk=args.ipa_qk,
            ipa_v=args.ipa_v, hyena=args.hyena, no_rope=args.no_rope,
            prepend_ipa=args.prepend_ipa, interleave_ipa=args.interleave_ipa,
            no_aa_emb=args.no_aa_emb, abs_pos_emb=args.abs_pos_emb, abs_time_emb=args.abs_time_emb,
            time_multiplier=args.time_multiplier,
        ),
        data=DataConfig(num_frames=args.num_frames, crop=args.crop),
        task=TaskConfig(
            sim_condition=args.sim_condition, tps_condition=args.tps_condition,
            inpainting=args.inpainting, design=args.design, dynamic_mpnn=args.dynamic_mpnn,
            mpnn=args.mpnn, cond_interval=args.cond_interval,
            design_key_frames=args.design_key_frames, no_torsion=args.no_torsion,
            no_design_torsion=args.no_design_torsion,
            supervise_all_torsions=args.supervise_all_torsions,
            supervise_no_torsions=args.supervise_no_torsions,
            no_offsets=args.no_offsets, no_frames=args.no_frames,
        ),
    )


def random_frames(shape):
    q = RNG.normal(size=(*shape, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rots = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    trans = (5 * RNG.normal(size=(*shape, 3))).astype(np.float32)
    return rots, trans


def test_mha_parity():
    torch.manual_seed(0)
    C, H, B, N = 32, 4, 3, 7
    ref = RefMHA(C, H, add_bias_kv=True, dropout=0.0, use_rotary_embeddings=True).eval()
    x = RNG.normal(size=(B, N, C)).astype(np.float32)
    mask = np.ones((B, N), dtype=np.float32)
    mask[1, -2:] = 0

    xt = torch.tensor(x).transpose(0, 1)  # seq-first
    with torch.no_grad():
        ref_out, _ = ref(query=xt, key=xt, value=xt, key_padding_mask=torch.tensor(1 - mask))
    ref_out = ref_out.transpose(0, 1).numpy()

    mine = MultiheadAttention(C, H, use_rope=True)
    params = {"params": torch_mha_to_flax(
        {f"x.{k}": v.numpy() for k, v in ref.state_dict().items()}, "x")}
    out = np.asarray(mine.apply(params, jnp.asarray(x), mask=jnp.asarray(mask)))
    # masked (padded) query rows attend over valid keys either way but their
    # outputs are unused downstream; compare valid positions
    np.testing.assert_allclose(out * mask[..., None], ref_out * mask[..., None], atol=2e-5)


def test_ipa_parity():
    torch.manual_seed(1)
    C = 32
    ref = RefIPA(c_s=C, c_z=0, c_hidden=8, no_heads=2, no_qk_points=4, no_v_points=4).eval()
    # reference zero-init of linear_out happens in the parent model; give it
    # real weights here so the test is nontrivial
    torch.nn.init.xavier_uniform_(ref.linear_out.weight)

    B, L = 2, 6
    s = RNG.normal(size=(B, L, C)).astype(np.float32)
    mask = np.ones((B, L), dtype=np.float32)
    mask[0, -1] = 0
    rots, trans = random_frames((B, L))
    ref_r = RefRigid(RefRotation(rot_mats=torch.tensor(rots)), torch.tensor(trans))
    with torch.no_grad():
        ref_out = ref(torch.tensor(s), ref_r, frame_mask=torch.tensor(mask)).numpy()

    mine = InvariantPointAttention(c_s=C, c_hidden=8, no_heads=2, no_qk_points=4, no_v_points=4)
    params = {"params": torch_ipa_to_flax({f"x.{k}": v.numpy() for k, v in ref.state_dict().items()}, "x")}
    out = np.asarray(
        mine.apply(params, jnp.asarray(s), Rigid(jnp.asarray(rots), jnp.asarray(trans)), frame_mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(out, ref_out, atol=5e-5)


class FixedRef(LatentMDGenModel):
    """Reference model with the run_ipa mask-shape bug fixed for B=1
    (src/mdgen/model/latent_model.py:255 passes a (B*T, L) mask into a (B, L)
    encoder; at B=1 the first row is the correct per-residue mask)."""

    def run_ipa(self, t, mask, start_frames, end_frames, aatype, x_d=None):
        B = start_frames.shape[0]
        assert B == 1
        return super().run_ipa(t, mask[:B], start_frames, end_frames, aatype, x_d=x_d)


def _full_model_case(args, latent_dim, B, with_frames=True, x_cond_dim=None):
    torch.manual_seed(2)
    ref = (FixedRef if args.prepend_ipa else LatentMDGenModel)(args, latent_dim).eval()
    cfg = make_cfg(args)
    assert cfg.latent_dim == latent_dim
    mine = LatentMDGen(cfg, latent_dim)

    T, L = args.num_frames, args.crop
    x = RNG.normal(size=(B, T, L, latent_dim)).astype(np.float32)
    t = RNG.uniform(0.1, 0.9, size=(B,)).astype(np.float32)
    mask = np.ones((B, T, L), dtype=np.float32)
    cond_dim = latent_dim - (20 if args.design else 0)
    x_cond = RNG.normal(size=(B, T, L, cond_dim)).astype(np.float32)
    x_cond_mask = (RNG.uniform(size=(B, T, L)) < 0.3).astype(np.int64)
    aatype = RNG.integers(0, 20, size=(B, L))
    rots, trans = random_frames((B, L))

    ref_r = RefRigid(RefRotation(rot_mats=torch.tensor(rots)), torch.tensor(trans))
    with torch.no_grad():
        ref_out = ref(
            torch.tensor(x), torch.tensor(t), torch.tensor(mask),
            start_frames=ref_r, end_frames=ref_r,
            x_cond=torch.tensor(x_cond), x_cond_mask=torch.tensor(x_cond_mask),
            aatype=torch.tensor(aatype),
        ).numpy()

    params = convert_state_dict({k: v.numpy() for k, v in ref.state_dict().items()})
    out = np.asarray(
        mine.apply(
            params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask),
            start_frames=Rigid(jnp.asarray(rots), jnp.asarray(trans)),
            end_frames=Rigid(jnp.asarray(rots), jnp.asarray(trans)),
            x_cond=jnp.asarray(x_cond), x_cond_mask=jnp.asarray(x_cond_mask),
            aatype=jnp.asarray(aatype),
        )
    )
    np.testing.assert_allclose(out, ref_out, atol=2e-4)


def test_full_model_no_ipa_batched():
    _full_model_case(make_args(prepend_ipa=False), 21, B=2)


def test_full_model_prepend_ipa():
    _full_model_case(make_args(prepend_ipa=True), 21, B=1)


def test_full_model_tps():
    _full_model_case(make_args(prepend_ipa=True, sim_condition=False, tps_condition=True), 28, B=1)


def test_full_model_design():
    _full_model_case(make_args(prepend_ipa=True, sim_condition=False, inpainting=True, design=True), 48, B=1)


def test_full_model_hyena():
    _full_model_case(make_args(prepend_ipa=False, hyena=True), 21, B=2)


def test_full_model_interleave_ipa():
    _full_model_case(make_args(prepend_ipa=False, interleave_ipa=True), 21, B=2)


def test_full_model_mpnn():
    """MPNN mode: frame-0 slice only, design logits output (latent_model.py:226-229,266-267).

    abs_time_emb must be off: the reference re-broadcasts the sliced frame dim
    against the full-length time table (latent_model.py:247) and crashes —
    this implementation slices the table instead.
    """
    args = make_args(prepend_ipa=True, sim_condition=False, mpnn=True, design=True, abs_time_emb=False)
    torch.manual_seed(3)
    ref = FixedRef(args, 41).eval()
    cfg = make_cfg(args)
    mine = LatentMDGen(cfg, 41)

    B, T, L = 1, args.num_frames, args.crop
    x = RNG.normal(size=(B, T, L, 41)).astype(np.float32)
    t = RNG.uniform(0.1, 0.9, size=(B,)).astype(np.float32)
    mask = np.ones((B, T, L), dtype=np.float32)
    x_cond = RNG.normal(size=(B, T, L, 21)).astype(np.float32)
    x_cond_mask = np.zeros((B, T, L), dtype=np.int64)
    aatype = RNG.integers(0, 20, size=(B, L))
    rots, trans = random_frames((B, L))
    ref_r = RefRigid(RefRotation(rot_mats=torch.tensor(rots)), torch.tensor(trans))
    with torch.no_grad():
        ref_out = ref(
            torch.tensor(x), torch.tensor(t), torch.tensor(mask), start_frames=ref_r,
            end_frames=ref_r, x_cond=torch.tensor(x_cond),
            x_cond_mask=torch.tensor(x_cond_mask), aatype=torch.tensor(aatype),
        ).numpy()
    params = convert_state_dict({k: v.numpy() for k, v in ref.state_dict().items()})
    out = np.asarray(mine.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask),
        start_frames=Rigid(jnp.asarray(rots), jnp.asarray(trans)),
        end_frames=Rigid(jnp.asarray(rots), jnp.asarray(trans)),
        x_cond=jnp.asarray(x_cond), x_cond_mask=jnp.asarray(x_cond_mask),
        aatype=jnp.asarray(aatype),
    ))
    np.testing.assert_allclose(out, ref_out, atol=2e-4)


def test_full_model_dynamic_mpnn():
    """dynamic-MPNN: first+last frame slice, logits output (latent_model.py:221-225);
    abs_time_emb off (same reference re-broadcast bug as mpnn)."""
    args = make_args(prepend_ipa=True, sim_condition=False, dynamic_mpnn=True, design=True,
                     abs_time_emb=False)
    torch.manual_seed(4)
    ref = FixedRef(args, 48).eval()
    cfg = make_cfg(args)
    assert cfg.latent_dim == 48
    mine = LatentMDGen(cfg, 48)

    B, T, L = 1, args.num_frames, args.crop
    x = RNG.normal(size=(B, T, L, 48)).astype(np.float32)
    t = RNG.uniform(0.1, 0.9, size=(B,)).astype(np.float32)
    mask = np.ones((B, T, L), dtype=np.float32)
    x_cond = RNG.normal(size=(B, T, L, 28)).astype(np.float32)
    x_cond_mask = np.zeros((B, T, L), dtype=np.int64)
    aatype = RNG.integers(0, 20, size=(B, L))
    rots, trans = random_frames((B, L))
    ref_r = RefRigid(RefRotation(rot_mats=torch.tensor(rots)), torch.tensor(trans))
    with torch.no_grad():
        ref_out = ref(
            torch.tensor(x), torch.tensor(t), torch.tensor(mask), start_frames=ref_r,
            end_frames=ref_r, x_cond=torch.tensor(x_cond),
            x_cond_mask=torch.tensor(x_cond_mask), aatype=torch.tensor(aatype),
        ).numpy()
    params = convert_state_dict({k: v.numpy() for k, v in ref.state_dict().items()})
    out = np.asarray(mine.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask),
        start_frames=Rigid(jnp.asarray(rots), jnp.asarray(trans)),
        end_frames=Rigid(jnp.asarray(rots), jnp.asarray(trans)),
        x_cond=jnp.asarray(x_cond), x_cond_mask=jnp.asarray(x_cond_mask),
        aatype=jnp.asarray(aatype),
    ))
    np.testing.assert_allclose(out, ref_out, atol=2e-4)


def test_forward_inference_dirichlet_parity():
    """Design-mode sampling forward: Dirichlet conditional-flow transform of the
    simplex channels (latent_model.py:276-326) — ours is device-resident, the
    reference interpolates scipy betainc tables on the host."""
    args = make_args(prepend_ipa=True, sim_condition=False, inpainting=True, design=True)
    torch.manual_seed(5)
    ref = FixedRef(args, 48).eval()
    cfg = make_cfg(args)
    mine = LatentMDGen(cfg, 48)

    B, T, L = 1, args.num_frames, args.crop
    rng2 = np.random.default_rng(11)
    x_cont = rng2.normal(size=(B, T, L, 28)).astype(np.float32)
    x_disc = rng2.dirichlet(np.ones(20), size=(B, L)).astype(np.float32)
    x_disc = np.broadcast_to(x_disc[:, None], (B, T, L, 20))
    x = np.concatenate([x_cont, x_disc], -1)
    t = np.full((B,), 0.45, np.float32)
    mask = np.ones((B, T, L), np.float32)
    x_cond = rng2.normal(size=(B, T, L, 28)).astype(np.float32)
    x_cond_mask = np.zeros((B, T, L), np.int64)
    aatype = rng2.integers(0, 20, size=(B, L))
    rots, trans = random_frames((B, L))
    ref_r = RefRigid(RefRotation(rot_mats=torch.tensor(rots)), torch.tensor(trans))
    with torch.no_grad():
        ref_out = ref.forward_inference(
            torch.tensor(x), torch.tensor(t), torch.tensor(mask), start_frames=ref_r,
            end_frames=ref_r, x_cond=torch.tensor(x_cond),
            x_cond_mask=torch.tensor(x_cond_mask), aatype=torch.tensor(aatype),
        ).numpy()
    params = convert_state_dict({k: v.numpy() for k, v in ref.state_dict().items()})
    out = np.asarray(mine.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask),
        method=mine.forward_inference,
        start_frames=Rigid(jnp.asarray(rots), jnp.asarray(trans)),
        end_frames=Rigid(jnp.asarray(rots), jnp.asarray(trans)),
        x_cond=jnp.asarray(x_cond), x_cond_mask=jnp.asarray(x_cond_mask),
        aatype=jnp.asarray(aatype),
    ))
    # continuous channels: exact model parity
    np.testing.assert_allclose(out[..., :28], ref_out[..., :28], atol=2e-4)
    # simplex-flow channels: same conditional-flow field (table interp tolerance)
    scale = np.abs(ref_out[..., 28:]).max()
    np.testing.assert_allclose(out[..., 28:], ref_out[..., 28:], atol=2e-3 * max(scale, 1.0))
