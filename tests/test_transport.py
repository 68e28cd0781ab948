"""Transport layer: path parity vs reference, integrator accuracy, loss semantics."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mdgen.transport.path as ref_path  # noqa: E402

from mdgen_finetune_tpu.config import MDGenConfig, TaskConfig, TransportConfig  # noqa: E402
from mdgen_finetune_tpu.transport import create_transport, sample_ode  # noqa: E402
from mdgen_finetune_tpu.transport.dirichlet import DirichletConditionalFlow, simplex_proj  # noqa: E402
from mdgen_finetune_tpu.transport.paths import get_path, expand_t  # noqa: E402
from mdgen_finetune_tpu.transport.samplers import ode_dopri5  # noqa: E402


@pytest.mark.parametrize(
    "name,ref_cls", [("Linear", ref_path.ICPlan), ("GVP", ref_path.GVPCPlan), ("VP", ref_path.VPCPlan)]
)
def test_path_parity(name, ref_cls):
    mine, ref = get_path(name), ref_cls()
    t = np.linspace(0.05, 0.95, 19).astype(np.float32)
    tt = torch.tensor(t)

    a_m, da_m = mine.alpha(jnp.asarray(t))
    a_r, da_r = ref.compute_alpha_t(tt)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_r), atol=1e-5)
    np.testing.assert_allclose(np.broadcast_to(np.asarray(da_m), t.shape), np.broadcast_to(np.asarray(da_r), t.shape), atol=1e-5)

    s_m, ds_m = mine.sigma(jnp.asarray(t))
    s_r, ds_r = ref.compute_sigma_t(tt)
    np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_r), atol=1e-5)
    np.testing.assert_allclose(np.broadcast_to(np.asarray(ds_m), t.shape), np.broadcast_to(np.asarray(ds_r), t.shape), atol=2e-4)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(19, 3)).astype(np.float32)
    te = expand_t(jnp.asarray(t), jnp.asarray(x))
    d_m, v_m = mine.drift(jnp.asarray(x), te)
    d_r, v_r = ref.compute_drift(torch.tensor(x), tt)
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_r), atol=1e-4)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(v_m), x.shape), np.broadcast_to(np.asarray(v_r), x.shape), atol=1e-4
    )

    vel = rng.normal(size=(19, 3)).astype(np.float32)
    sc_m = mine.score_from_velocity(jnp.asarray(vel), jnp.asarray(x), te)
    sc_r = ref.get_score_from_velocity(torch.tensor(vel), torch.tensor(x), tt)
    np.testing.assert_allclose(np.asarray(sc_m), np.asarray(sc_r), atol=1e-3)


def test_interpolate_matches_reference_plan():
    mine, ref = get_path("GVP"), ref_path.GVPCPlan()
    rng = np.random.default_rng(1)
    t = rng.uniform(0.01, 0.99, size=(8,)).astype(np.float32)
    x0 = rng.normal(size=(8, 4, 3)).astype(np.float32)
    x1 = rng.normal(size=(8, 4, 3)).astype(np.float32)
    xt_m, ut_m = mine.interpolate(expand_t(jnp.asarray(t), jnp.asarray(x1)), jnp.asarray(x0), jnp.asarray(x1))
    _, xt_r, ut_r = ref.plan(torch.tensor(t), torch.tensor(x0), torch.tensor(x1))
    np.testing.assert_allclose(np.asarray(xt_m), np.asarray(xt_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ut_m), np.asarray(ut_r), atol=1e-5)


def test_integrators_linear_ode():
    # dx/dt = -x  =>  x(1) = x0 * exp(-1)
    drift = lambda x, t: -x
    x0 = jnp.ones((2, 3))
    for method, steps, tol in [("euler", 400, 2e-3), ("heun", 100, 1e-4), ("dopri5", 0, 1e-4)]:
        out = sample_ode(drift, x0, t0=0.0, t1=1.0, method=method, num_steps=steps)
        np.testing.assert_allclose(np.asarray(out), np.exp(-1.0) * np.ones((2, 3)), atol=tol)


def test_dopri5_nonautonomous():
    # dx/dt = 2t  =>  x(1) = x0 + 1
    drift = lambda x, t: jnp.broadcast_to(2 * t[:, None], x.shape)
    x0 = jnp.zeros((4, 5))
    out = ode_dopri5(drift, x0, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.ones((4, 5)), atol=1e-5)


def test_training_losses_velocity():
    cfg = MDGenConfig(task=TaskConfig(sim_condition=True))
    tr = create_transport(cfg)
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.normal(size=(4, 6, 5, 21)), jnp.float32)
    mask = jnp.ones_like(x1)

    def model_fn(x, t, **kw):
        return jnp.zeros_like(x)

    terms = jax.jit(lambda k: tr.training_losses(model_fn, k, x1, mask=mask))(jax.random.key(0))
    assert terms["loss"].shape == (4,)
    # with zero prediction the loss is the masked mean square of u_t
    t = terms["t"]
    assert np.all(np.asarray(terms["loss"]) > 0)


def test_dirichlet_c_factor_vs_scipy_oracle():
    import scipy.special as sp

    K, spacing, amax = 20, 0.01, 8.0
    flow = DirichletConditionalFlow(K=K, alpha_max=amax, alpha_spacing=spacing)

    # independent numpy oracle implementing the same definition
    alphas = np.arange(1.0, amax + spacing, spacing)
    bs_grid = np.linspace(0, 1, 1000)
    cdfs = sp.betainc(alphas[:, None], K - 1, bs_grid[None, :])
    dcdf = np.diff(cdfs, axis=0) / spacing

    rng = np.random.default_rng(3)
    bs = rng.dirichlet(np.ones(K), size=7).astype(np.float32)
    for alpha in [1.5, 3.0, 7.5]:
        beta = sp.beta(alpha, K - 1)
        beta_div = np.where(bs < 1, beta / ((1 - bs) ** (K - 1)), 0)
        beta_div_full = np.where((bs ** (alpha - 1)) > 0, beta_div / (bs ** (alpha - 1)), 0)
        row = dcdf[np.argmin(np.abs(alpha - alphas))]
        oracle = -np.interp(bs, bs_grid, row) * beta_div_full

        mine = np.asarray(flow.c_factor(jnp.asarray(bs), jnp.asarray(alpha, jnp.float32)))
        np.testing.assert_allclose(mine, oracle, atol=2e-3, rtol=1e-2)


def test_simplex_proj():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(10, 20)).astype(np.float32)
    p = np.asarray(simplex_proj(jnp.asarray(x)))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    assert (p >= 0).all()
    # already-on-simplex points are fixed points
    d = rng.dirichlet(np.ones(20), size=5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(simplex_proj(jnp.asarray(d))), d, atol=1e-5)


def test_likelihood_ode_linear_drift():
    """For drift v(x,t) = a*x the exact divergence is a*dim; check the
    Hutchinson estimate integrates to the closed form."""
    from mdgen_finetune_tpu.transport.samplers import ode_likelihood

    a = 0.5
    dim = 6
    drift = lambda x, t: a * x
    rng = np.random.default_rng(5)
    x1 = jnp.asarray(rng.normal(size=(64, dim)), jnp.float32)
    x0, delta_logp = ode_likelihood(drift, x1, jax.random.key(0), num_steps=200)
    # reversed integration: x0 = x1 * exp(-a); divergence integral = a * dim
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1) * np.exp(-a), rtol=3e-3)
    np.testing.assert_allclose(np.asarray(delta_logp).mean(), a * dim, rtol=0.05)


def test_sde_terminal_time_pinned():
    """Constant drift, zero diffusion: total displacement must be exactly
    (t1 - t0) + last_step_size — the reference integrates the full [t0, t1]
    then steps last_step_size beyond (ADVICE r1 medium: no double-counting)."""
    from mdgen_finetune_tpu.transport.samplers import sample_sde

    c = 2.0
    drift = lambda x, t: jnp.full_like(x, c)
    zero = lambda x, te: jnp.zeros_like(x)
    x = jnp.zeros((2, 4))
    t0, t1, s = 0.0, 0.96, 0.04
    for last in ["Mean", "Euler"]:
        out = sample_sde(drift, zero, zero, jax.random.key(0), x,
                         t0=t0, t1=t1, num_steps=16, last_step=last, last_step_size=s)
        np.testing.assert_allclose(np.asarray(out), c * ((t1 - t0) + s), atol=1e-5)
