"""On-chip RTB fine-tuning demonstration (EVIDENCE.md L7 run).

Pipeline (reference loop: src/rtb_utils/gfn_diffusion.py:194-271):
  1. generate a synthetic 4AA MD dataset;
  2. pretrain a flagship-width MDGen prior on it (flow matching);
  3. measure the generated-vs-target energy JSD of the *prior* (LoRA at zero);
  4. RTB fine-tune the LoRA adapter against the surrogate reward through the
     jitted fused-loss path (sampler + frozen-flow decode + reward + RTB loss
     + grad in ONE jit, rtb/trainer.py:_fused_loss);
  5. re-measure the JSD with the trained adapter, write the
     plot_energy_distributions panels + a JSON summary.

"Target" = per-frame surrogate energies of held-out dataset frames; the RTB
posterior ~ prior(x) * exp(-E/temperature) should pull the generated energy
distribution toward (and below) the data's.

Usage:
    python tools/rtb_demo.py [--outdir /tmp/rtb_demo] [--tiny]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/rtb_demo")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke-test scale")
    ap.add_argument("--scale", action="store_true",
                    help="reference-scale trajectories: traj_length 250, "
                         "sampling_length 10 (the reference fine-tunes "
                         "traj_length 1000 / sampling_length 10, "
                         "src/scripts/mdgen_finetune.sh; 250 is the ATLAS "
                         "frame count and keeps the on-chip run < 1 h)")
    ap.add_argument("--pretrain_steps", type=int, default=None)
    ap.add_argument("--rtb_iters", type=int, default=None)
    ap.add_argument("--eval_n", type=int, default=None, help="eval sample count")
    ap.add_argument("--traj_length", type=int, default=None,
                    help="override T (with --scale): --traj_length 1000 is "
                         "the reference's actual fine-tune config "
                         "(src/scripts/mdgen_finetune.sh)")
    ap.add_argument("--rtb_batch", type=int, default=None,
                    help="override the RTB iteration batch size")
    args = ap.parse_args()

    import jax

    if args.tiny:
        # CPU smoke test must not touch the (single-job) TPU relay; env vars
        # cannot switch the backend here (CLAUDE.md), so flip it in-process.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mdgen_finetune_tpu.config import (
        DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig, TransportConfig,
    )
    from mdgen_finetune_tpu.data import MDGenDataset, make_batch_iterator
    from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
    from mdgen_finetune_tpu.rtb.plots import js_divergence, plot_energy_distributions
    from mdgen_finetune_tpu.rtb.priors import MDGenSimulator
    from mdgen_finetune_tpu.rtb.rewards import SurrogateReward
    from mdgen_finetune_tpu.rtb.trainer import RTBConfig, RTBTrainer
    from mdgen_finetune_tpu.training import Trainer

    os.makedirs(args.outdir, exist_ok=True)
    t_start = time.time()

    if args.tiny:
        model_kw = dict(num_layers=1, embed_dim=32, mha_heads=4, ipa_heads=2,
                        ipa_head_dim=8, ipa_qk=4, ipa_v=4)
        T, nframes = 6, 128
        pretrain_steps = args.pretrain_steps or 10
        rtb_iters = args.rtb_iters or 4
        rtb_B, samp_len, eval_n = 2, 3, args.eval_n or 4
        inference_steps = 3
    elif args.scale:
        # reference-scale trajectories (VERDICT r3 item 5): traj_length 250
        # frames per sample, sampling_length 10 DDPM steps — the reference's
        # sampling_length (src/scripts/mdgen_finetune.sh)
        model_kw = {}
        T, nframes = (args.traj_length or 250), 4000
        nframes = max(nframes, 4 * T)
        pretrain_steps = args.pretrain_steps or 4000
        rtb_iters = args.rtb_iters or 300
        rtb_B, samp_len, eval_n = (args.rtb_batch or 8), 10, args.eval_n or 64
        inference_steps = 10
    else:
        # flagship width (src/mdgen/parsing.py:86-93); T kept moderate so the
        # 2x sampling_length chain + ODE decode stays fast per iteration
        model_kw = {}
        T, nframes = 24, 4000
        pretrain_steps = args.pretrain_steps or 4000
        rtb_iters = args.rtb_iters or 300
        rtb_B, samp_len, eval_n = 8, 16, args.eval_n or 64
        inference_steps = 10

    data_dir = os.path.join(args.outdir, "data")
    split = make_synthetic_dataset(data_dir, ["AGHK", "LVSE"], num_frames=nframes)
    cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, use_bf16=not args.tiny,
                          grad_checkpointing=(T >= 500), **model_kw),
        transport=TransportConfig(sampling_method="euler", inference_steps=inference_steps),
        data=DataConfig(data_dir=data_dir, num_frames=T, crop=4),
        task=TaskConfig(sim_condition=True),
        # lr 1e-3 DIVERGES the T=1000 pretrain (grad_norm ~2e13 by step
        # 500, measured r5); long-T runs use the conservative rate
        train=TrainConfig(batch_size=4 if args.tiny else (8 if T >= 500 else 16),
                          lr=3e-4 if T >= 500 else 1e-3),
    )

    # ---- 1. pretrain the prior ----
    trainer = Trainer(cfg, dtype=jnp.bfloat16 if not args.tiny else jnp.float32)
    ds = MDGenDataset(cfg, split)
    it = make_batch_iterator(ds, cfg.train.batch_size, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))
    t0 = time.time()
    state = trainer.fit(state, it, pretrain_steps, jax.random.key(1), log_every=500)
    pretrain_s = time.time() - t0
    print(f"[pretrain] {pretrain_steps} steps in {pretrain_s:.1f}s", flush=True)

    params = jax.tree.map(lambda x: x.astype(jnp.float32), state.ema_params or state.params)
    sim = MDGenSimulator(cfg, params, split, batch_size=2, distinct_peptides=True,
                        out_dir=os.path.join(args.outdir, "samples"))
    reward = SurrogateReward(temperature=50.0)

    rtb = RTBConfig(
        batch_size=rtb_B, sampling_length=samp_len, num_train_timesteps=100,
        lora_rank=16, lr=5e-4, logz_lr=5e-2, learning_cutoff=0.1, seed=0,
        # reference-scale trajectories need the VarGrad logZ estimate: with a
        # learned scalar logZ the residual (logpf_post + logZ - logpf_prior
        # - logr) is unanchored at traj_length 250 and the squared loss
        # explodes (measured r4: loss 1.7e5 -> 2.7e9 over 200 iters while
        # JSD still improved) — the reference's launcher grids over
        # --vargrad for the same reason (src/scripts/mdgen_launcher.sh)
        vargrad=args.scale,
    )
    tr = RTBTrainer(cfg, rtb, sim, reward, workdir=os.path.join(args.outdir, "rtb"))

    # ---- target energy distribution: held-out dataset frames ----
    rng = np.random.default_rng(3)
    target_logr = []
    for name, seqres in sim.dataset.entries:
        arr = np.load(sim.dataset._path(name), mmap_mode="r")
        idx = np.sort(rng.integers(len(arr) // 2, len(arr), size=max(eval_n, 32)))
        frames = jnp.asarray(np.asarray(arr[idx], np.float32))[:, : cfg.data.crop]
        from mdgen_finetune_tpu.rtb.priors import rc_restype_order
        aat = jnp.asarray([rc_restype_order(c) for c in seqres[: cfg.data.crop]], jnp.int32)
        e = reward._energy_jit(frames, aat)  # (N,) per-frame energies
        target_logr.append(np.asarray(-e / reward.temperature))
    target_logr = np.concatenate(target_logr)

    # ---- generated energy distribution for a given adapter ----
    def gen_logr(lora, key):
        out = []
        n_batches = max(1, eval_n // rtb_B)
        for i in range(n_batches):
            k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
            condition, batch = sim.get_cond_args()
            condition = RTBTrainer._replicate(condition, rtb_B)
            batch_rep = RTBTrainer._replicate(
                {k: v for k, v in batch.items() if k != "name"}, rtb_B)
            res = tr._fwd_jit(lora, k1, condition, batch_size=rtb_B)
            atom14, _ = sim.sample(batch_rep, res["x"])  # (B, T, L, 14, 3)
            e = jax.vmap(reward._energy)(atom14, batch_rep["seqres"][:, : cfg.data.crop])
            out.append(np.asarray(-e / reward.temperature).reshape(-1))
        return np.concatenate(out)

    logr_before = gen_logr(tr.lora, jax.random.key(100))
    jsd_before = js_divergence(logr_before, target_logr)
    print(f"[before] mean logr {logr_before.mean():.3f} vs target {target_logr.mean():.3f}; "
          f"JSD {jsd_before:.4f}", flush=True)

    # ---- 4. RTB fine-tune ----
    t0 = time.time()
    hist = tr.run(n_iterations=rtb_iters, log_every=max(1, rtb_iters // 20))
    rtb_s = time.time() - t0
    print(f"[rtb] {rtb_iters} iters in {rtb_s:.1f}s "
          f"({rtb_s / max(1, rtb_iters):.2f} s/iter)", flush=True)

    logr_after = gen_logr(tr.lora, jax.random.key(200))
    jsd_after = js_divergence(logr_after, target_logr)
    print(f"[after] mean logr {logr_after.mean():.3f}; JSD {jsd_after:.4f}", flush=True)

    plot_energy_distributions(logr_before, target_logr,
                              os.path.join(args.outdir, "energy_before.png"))
    plot_energy_distributions(logr_after, target_logr,
                              os.path.join(args.outdir, "energy_after.png"))

    # full training curves (loss / logZ / pf_divergence / logr): the RTB
    # loss alone is NOT a convergence metric — it carries the squared
    # VarGrad-style residual whose spread grows as the posterior departs
    # the prior — so the curves that explain it ship with the summary
    # (VERDICT r3 item 5)
    curves = {k: [round(float(h[k]), 4) for h in hist]
              for k in ("loss", "logr", "logZ", "pf_divergence")}
    with open(os.path.join(args.outdir, "history.json"), "w") as f:
        json.dump(curves, f)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 4, figsize=(16, 3.2))
        for ax, k in zip(axes, ("loss", "logr", "logZ", "pf_divergence")):
            ax.plot(curves[k], lw=1)
            ax.set_title(k)
            ax.set_xlabel("iteration")
            if k == "loss":
                ax.set_yscale("log")
        fig.tight_layout()
        fig.savefig(os.path.join(args.outdir, "curves.png"), dpi=120)
        plt.close(fig)
    except Exception as e:  # matplotlib is present in-image; belt and braces
        print(f"[curves plot skipped: {e}]", flush=True)

    summary = {
        "pretrain_steps": pretrain_steps, "pretrain_s": round(pretrain_s, 1),
        "rtb_iters": rtb_iters, "rtb_s": round(rtb_s, 1),
        "traj_length": T, "sampling_length": samp_len,
        "mean_logr_before": round(float(logr_before.mean()), 3),
        "mean_logr_after": round(float(logr_after.mean()), 3),
        "mean_logr_target": round(float(target_logr.mean()), 3),
        "jsd_before": round(jsd_before, 4), "jsd_after": round(jsd_after, 4),
        "loss_first10": round(float(np.mean([h["loss"] for h in hist[:10]])), 3),
        "loss_last10": round(float(np.mean([h["loss"] for h in hist[-10:]])), 3),
        "logZ_first10": round(float(np.mean([h["logZ"] for h in hist[:10]])), 3),
        "logZ_last10": round(float(np.mean([h["logZ"] for h in hist[-10:]])), 3),
        "pf_div_first10": round(float(np.mean([h["pf_divergence"] for h in hist[:10]])), 3),
        "pf_div_last10": round(float(np.mean([h["pf_divergence"] for h in hist[-10:]])), 3),
        "total_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
