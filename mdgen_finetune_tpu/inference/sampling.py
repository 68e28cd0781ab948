"""Generative sampling + autoregressive rollout, fully on-device.

Rebuilds NewMDGenWrapper.inference / sample_prior_latent
(src/mdgen/wrapper.py:416-514) and the sim_inference rollout loop
(src/sim_inference.py:62-112). The ODE solve, latent decode, torsion
normalization, and all-atom reconstruction compile into one jitted function
per config; the autoregressive rollout feeds the last generated frame back
through the on-device tokenizer (the reference does this on the CPU,
src/sim_inference.py:90-96).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..config import MDGenConfig
from ..data.featurize import featurize_atom14_batch
from ..geometry import frames as G
from ..geometry.rigid import Rigid
from ..models import LatentMDGen
from ..tasks import prep_batch
from ..transport import create_transport
from ..transport.samplers import sample_ode


def _array_entries(batch: dict) -> dict:
    """Drop non-numeric metadata (dataset 'name' strings / string lists) so
    featurized batches can cross the jit boundary as-is."""

    def ok(v):
        if isinstance(v, (str, bytes)):
            return False
        if isinstance(v, (list, tuple)):
            return not any(isinstance(e, (str, bytes)) for e in v)
        return getattr(np.asarray(v), "dtype", None) != np.dtype(object)

    return {k: v for k, v in batch.items() if ok(v)}


def sample_prior_latent(
    key: jax.Array, B: int, T: int, L: int, latent_dim: int, design: bool = False, uniform: bool = False
) -> jnp.ndarray:
    """Prior draw (src/mdgen/wrapper.py:416-434): Gaussian or U[-3, 3], with a
    frame-constant Dirichlet simplex part for design."""
    k1, k2 = jax.random.split(key)
    if design:
        cont_dim = latent_dim - 20
        if uniform:
            zc = jax.random.uniform(k1, (B, T, L, cont_dim), minval=-3.0, maxval=3.0)
        else:
            zc = jax.random.normal(k1, (B, T, L, cont_dim))
        zd = jax.random.dirichlet(k2, jnp.ones(20), (B, L))
        zd = jnp.broadcast_to(zd[:, None], (B, T, L, 20))
        return jnp.concatenate([zc, zd], axis=-1)
    if uniform:
        return jax.random.uniform(k1, (B, T, L, latent_dim), minval=-3.0, maxval=3.0)
    return jax.random.normal(k1, (B, T, L, latent_dim))


class InferenceEngine:
    def __init__(self, cfg: MDGenConfig, params, dtype=None, sampler: str = "ode",
                 sde_opts: dict | None = None, mesh=None):
        """``sampler``: "ode" (default, the reference task CLIs' path) or
        "sde" (reverse-SDE sampling, Sampler.sample_sde in the reference,
        src/mdgen/transport/transport.py:346-450). ``sde_opts`` forwards to
        Transport.make_sde_sampler (num_steps/method/diffusion_form/
        diffusion_norm/last_step/last_step_size). ``mesh``: optional device
        mesh for batched multi-chip sampling — registered so the Pallas
        kernels shard_map over it (parallel/kernel_sharding.py)."""
        self.cfg = cfg
        self.params = params
        if mesh is not None:
            from ..parallel.kernel_sharding import set_kernel_mesh

            set_kernel_mesh(mesh)
        if sampler not in ("ode", "sde"):
            raise ValueError(f"unknown sampler {sampler!r}")
        self.sampler = sampler
        self.sde_opts = dict(sde_opts or {})
        dtype = dtype if dtype is not None else (jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32)
        self.model = LatentMDGen(cfg, cfg.latent_dim, dtype=dtype)
        self.transport = create_transport(cfg)
        self._sample_jit = jax.jit(self._sample)
        self._rollout_step_jit = jax.jit(self._rollout_step)
        self._likelihood_jit = jax.jit(self._log_likelihood, static_argnames=("num_steps",))

    # ------------------------------------------------------------------
    def _decode(self, samples, rigids, seqres):
        """Latents -> (atom14, aa_out) (src/mdgen/wrapper.py:487-514)."""
        cfg = self.cfg
        B, T, L, _ = samples.shape
        offsets = samples[..., :7]
        if cfg.doubled_offsets:
            torsions = samples[..., 14:28]
        else:
            torsions = samples[..., 7:21]
        logits = samples[..., -20:]

        rel = Rigid.from_tensor_7(offsets, normalize_quats=True)
        if cfg.task.no_offsets:
            frames = rel
        else:
            frames = rigids[:, 0:1].compose(rel)
        torsions = torsions.reshape(B, T, L, 7, 2)
        torsions = torsions / jnp.linalg.norm(torsions, axis=-1, keepdims=True)
        aat = jnp.broadcast_to(seqres[:, None], (B, T, L))
        atom14 = G.frames_torsions_to_atom14(frames, torsions, aat)
        aa_out = jnp.argmax(logits, -1) if cfg.task.design else aat
        return atom14, aa_out

    def _sample(self, params, batch, key, zs0=None):
        """Featurized batch -> generated (atom14, aa_out)."""
        cfg = self.cfg
        prep = prep_batch(cfg, batch)
        kw = prep["model_kwargs"]
        B, T, L = kw["mask"].shape

        if cfg.task.mpnn or cfg.task.dynamic_mpnn:
            # sequence-only prediction: one forward at t=1, structures are the
            # conditioning ground truth (src/mdgen/wrapper.py:456-465)
            x1 = prep["latents"]
            xt = jnp.concatenate([x1, jnp.zeros((*x1.shape[:-1], 20), x1.dtype)], axis=-1)
            logits = self.model.apply(
                params, xt, jnp.ones((B,)), method=self.model.forward_inference, **kw
            )
            aa_out = jnp.argmax(logits, -1)
            aat = jnp.broadcast_to(batch["seqres"][:, None], (B, T, L))
            atom14 = G.frames_torsions_to_atom14(prep["rigids"], batch["torsions"], aat)
            return atom14, aa_out

        k_prior, k_sde = jax.random.split(key)
        if zs0 is not None:
            zs = zs0
        else:
            zs = sample_prior_latent(k_prior, B, T, L, cfg.latent_dim, design=cfg.task.design)

        # fold+stack the trunk weights ONCE, outside the ODE-step scan
        # (models/denoiser.make_trunk_pack: ~26 MB of weight prep that XLA
        # does not hoist out of the scan by itself)
        pack = self.model.apply(params, method=self.model.make_trunk_pack)

        use_flat = (
            self.sampler == "ode"
            and cfg.transport.sampling_method == "euler"
            and self.transport.prediction == "velocity"
            and LatentMDGen.flat_scan_ok(cfg)
            and pack is not None
        )
        if use_flat:
            # flat-latent euler fast path: the carry stays in the padded
            # trunk layout and each step is ONE trunk pallas_call (embed +
            # euler update folded, per-step-constant embed terms and mask
            # biases hoisted out of the scan — models/denoiser._flat_call);
            # bitwise the same valid-lane samples as the generic ode_euler
            # chain below (tests/test_flat_scan.py)
            from ..models.denoiser import flat_to_latent, latent_to_flat

            consts = self.model.apply(params, kw["x_cond"], kw["x_cond_mask"],
                                      kw["mask"], aatype=kw.get("aatype"),
                                      start_frames=kw.get("start_frames"),
                                      end_frames=kw.get("end_frames"),
                                      method=self.model.make_scan_consts)
            t0, t1 = self.transport.check_interval(eval=True)
            n = cfg.transport.inference_steps
            dt = (t1 - t0) / n
            ts = t0 + dt * jnp.arange(n, dtype=zs.dtype)
            # the whole t-embedder chain in ONE batched call (the t grid is
            # known before the scan); rows broadcast to (B, C) per step. With
            # t_emb supplied the t argument is unused by the fast path — a
            # loop-invariant dummy avoids a per-step ts slice
            tembs = self.model.apply(params, ts, method=self.model.embed_times)
            # the prepend-IPA encoder for the whole t grid in chunk-batched
            # kernel calls (denoiser.encode_steps): the per-step encoder
            # kernel is latency-bound, so precomputing it moves ~0.06 ms/step
            # off the chain (r4)
            encs = self.model.apply(
                params, jnp.broadcast_to(ts[:, None], (ts.shape[0], B)),
                kw["mask"], consts, pack,
                start_frames=kw.get("start_frames"),
                end_frames=kw.get("end_frames"), aatype=kw.get("aatype"),
                method=self.model.encode_steps)
            P = -(-cfg.latent_dim // 128) * 128
            t_dummy = jnp.zeros((B,), zs.dtype)

            if encs is not None:
                # whole-t-grid AdaLN rows precomputed too (embed_mods): the
                # per-step silu + mods matmul leaves the scan — each euler
                # step is exactly ONE trunk pallas_call (bitwise-equal
                # output; +0.6% measured r5, 9,955 -> 10,018 steps/s)
                modss = self.model.apply(
                    params,
                    jnp.broadcast_to(tembs[:, None, :],
                                     (ts.shape[0], B, tembs.shape[-1])),
                    pack, method=self.model.embed_mods)

                def step(xc, xs_row):
                    mo, en = xs_row
                    return self.model.apply(
                        params, xc, t_dummy, kw["mask"],
                        start_frames=kw.get("start_frames"),
                        end_frames=kw.get("end_frames"),
                        aatype=kw.get("aatype"), trunk_pack=pack,
                        scan_consts=consts, ode_dt=dt, enc=en, mods=mo), None

                xs_rows = (modss, encs)
                step_fn = step
            else:
                def step_fn(xc, xs_row):
                    te = xs_row[0]
                    return self.model.apply(
                        params, xc, t_dummy, kw["mask"],
                        start_frames=kw.get("start_frames"),
                        end_frames=kw.get("end_frames"),
                        aatype=kw.get("aatype"), trunk_pack=pack,
                        scan_consts=consts, ode_dt=dt,
                        t_emb=jnp.broadcast_to(te[None], (B, te.shape[-1])),
                        ), None

                xs_rows = (tembs, jnp.zeros((ts.shape[0], 0)))
            # unroll=2: XLA overlaps the per-step XLA glue (mods matmul, xs
            # slices, scan bookkeeping) with the previous step's trunk
            # kernel — +1.9% measured at the bench shape (9,769 -> 9,957
            # steps/s, r5); unroll=4 is not better (9,940)
            xT, _ = jax.lax.scan(step_fn, latent_to_flat(zs, P), xs_rows,
                                 unroll=2)
            samples = flat_to_latent(xT, T, L, cfg.latent_dim)
            return self._decode(samples, prep.get("rigids"), batch["seqres"])

        def model_fn(x, t, **extra):
            return self.model.apply(params, x, t, method=self.model.forward_inference,
                                    trunk_pack=pack, **kw)

        if self.sampler == "sde":
            sde_sample = self.transport.make_sde_sampler(model_fn, **self.sde_opts)
            samples = sde_sample(k_sde, zs)
        else:
            drift = self.transport.drift_fn(model_fn)
            t0, t1 = self.transport.check_interval(eval=True)
            samples = sample_ode(
                drift,
                zs,
                t0=t0,
                t1=t1,
                method=cfg.transport.sampling_method,
                num_steps=cfg.transport.inference_steps,
            )
        return self._decode(samples, prep.get("rigids"), batch["seqres"])

    def sample(self, batch: dict, key) -> tuple:
        """batch: featurized dict (torsions/rots/trans/seqres/mask...).
        Non-array metadata entries (e.g. dataset 'name' strings) are dropped
        before the jit boundary."""
        return self._sample_jit(self.params, _array_entries(batch), key)

    def _sample_with_zs0(self, params, batch, zs0):
        """Deterministic decode from a given prior latent (RTB rollouts,
        src/mdgen/wrapper.py:436 zs0 path)."""
        return self._sample(params, batch, jax.random.key(0), zs0=zs0)

    # ------------------------------------------------------------------
    def _log_likelihood(self, params, batch, key, num_steps: int = 100):
        """Exact log-likelihood of the batch's ground-truth latents under the
        probability-flow ODE (reference Sampler.sample_ode_likelihood,
        src/mdgen/transport/transport.py:452-510): integrate the reversed
        drift with a Hutchinson divergence estimate back to the prior, then
        log p(x) = prior_logp(x0) - delta_logp. Returns (B,) nats."""
        from ..transport.samplers import ode_likelihood

        prep = prep_batch(self.cfg, batch)
        kw = prep["model_kwargs"]
        x1 = prep["latents"]
        if x1.shape[-1] != self.cfg.latent_dim:
            # design configs append the one-hot sequence block to the latents
            aa1h = jax.nn.one_hot(batch["seqres"], 20, dtype=x1.dtype)
            aa1h = jnp.broadcast_to(aa1h[:, None], (*x1.shape[:-1], 20))
            x1 = jnp.concatenate([x1, aa1h], axis=-1)

        pack = self.model.apply(params, method=self.model.make_trunk_pack)

        def model_fn(x, t, **extra):
            return self.model.apply(params, x, t, method=self.model.forward_inference,
                                    trunk_pack=pack, **kw)

        drift = self.transport.drift_fn(model_fn)
        t0, t1 = self.transport.check_interval(eval=True)
        x0, delta_logp = ode_likelihood(drift, x1, key, t0=t0, t1=t1, num_steps=num_steps)
        return self.transport.prior_logp(x0) - delta_logp

    def log_likelihood(self, batch: dict, key, num_steps: int = 100) -> jnp.ndarray:
        """Per-sample log p(latents(batch)) in nats (see _log_likelihood)."""
        return self._likelihood_jit(self.params, _array_entries(batch), key, num_steps=num_steps)

    # ------------------------------------------------------------------
    def _expand_frame0(self, atom14_frame0, seqres, mask):
        """One conditioning frame -> a full-window featurized batch
        (src/sim_inference.py:62-80: every frame copies frame 0)."""
        T = self.cfg.data.num_frames
        B, L = seqres.shape
        atom14 = jnp.broadcast_to(atom14_frame0[:, None], (B, T, L, 14, 3))
        return featurize_atom14_batch(atom14, seqres, mask)

    def _rollout_step(self, params, atom14_frame0, seqres, mask, key):
        batch = self._expand_frame0(atom14_frame0, seqres, mask)
        atom14, aa_out = self._sample(params, batch, key)
        return atom14, atom14[:, -1]

    def rollout(self, atom14_frame0, seqres, mask, num_rollouts: int, key) -> np.ndarray:
        """Autoregressive forward simulation (src/sim_inference.py:105-112).

        Returns atom14 (B, num_rollouts * num_frames, L, 14, 3) on host.
        """
        chunks = []
        cur = jnp.asarray(atom14_frame0)
        seqres = jnp.asarray(seqres)
        mask = jnp.asarray(mask)
        for _ in range(num_rollouts):
            key, k = jax.random.split(key)
            atom14, cur = self._rollout_step_jit(self.params, cur, seqres, mask, k)
            chunks.append(np.asarray(atom14))
        return np.concatenate(chunks, axis=1)
