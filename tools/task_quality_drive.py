"""On-chip quality drives for TPS and inpainting/design (EVIDENCE r4).

VERDICT r3 item 6: converged-quality on-chip evidence existed only for
forward-sim (r2) and RTB (r3). This drive trains flagship-width models for
the two remaining generative tasks on synthetic 4AA MD, generates on the
real chip through the task CLIs, and runs the task metrics
(analysis/task_metrics.py — reference src/scripts/analyze_peptide_tps.py
and analyze_peptide_design.py):

  1. TPS: tps_condition model -> endpoint-conditioned path ensemble between
     the MSM's min-flux metastable pair -> validity rate / path probability /
     state-visitation JSD vs MSM bridge samples.
  2. Design: inpainting+design model -> sequence recovery of the designed
     residues vs the ground-truth sequence.

Usage: python tools/task_quality_drive.py [--outdir /tmp/taskq] [--tiny]
"""
import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/taskq")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke scale")
    ap.add_argument("--train_steps", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from mdgen_finetune_tpu.config import (
        DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig,
        TransportConfig,
    )
    from mdgen_finetune_tpu.data import MDGenDataset, make_batch_iterator
    from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
    from mdgen_finetune_tpu.training import Trainer

    os.makedirs(args.outdir, exist_ok=True)
    t_start = time.time()

    if args.tiny:
        model_kw = dict(num_layers=1, embed_dim=32, mha_heads=4, ipa_heads=2,
                        ipa_head_dim=8, ipa_qk=4, ipa_v=4)
        T, nframes, steps, B = 8, 400, 10, 2
        n_batches, batch_size, infer_steps = 1, 2, 3
    else:
        model_kw = {}  # flagship width (src/mdgen/parsing.py:86-93)
        # 12k steps / conservative lrs: the first r4 drive at lr 1e-3
        # diverged the design task (grad_norm 6e5) and left TPS short of
        # converged (EVIDENCE r4 notes)
        T, nframes, steps, B = 100, 6000, 12000, 16
        n_batches, batch_size, infer_steps = 4, 8, 50

    steps = args.train_steps or steps
    data_dir = os.path.join(args.outdir, "data")
    split = make_synthetic_dataset(data_dir, ["AGHK", "LVSE"], num_frames=nframes)
    summary = {}

    def train(cfg, name):
        trainer = Trainer(cfg)
        ds = MDGenDataset(cfg, split)
        it = make_batch_iterator(ds, cfg.train.batch_size, seed=0)
        state = trainer.init_state(jax.random.key(0), next(it))
        hist = []
        t0 = time.time()
        state = trainer.fit(state, it, steps, jax.random.key(1),
                            log_every=max(1, steps // 8),
                            log_fn=lambda m: (hist.append(m),
                                              print(json.dumps(m), flush=True)))
        summary[f"{name}_train_s"] = round(time.time() - t0, 1)
        summary[f"{name}_loss_first"] = hist[0]["loss"]
        summary[f"{name}_loss_last"] = hist[-1]["loss"]
        return trainer.save_checkpoint(state, os.path.join(args.outdir, f"{name}_ckpt"))

    # ---- 1. TPS ----
    tps_cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True,
                          use_bf16=not args.tiny, **model_kw),
        transport=TransportConfig(sampling_method="euler",
                                  inference_steps=infer_steps),
        data=DataConfig(data_dir=data_dir, num_frames=T, crop=4),
        task=TaskConfig(tps_condition=True),
        train=TrainConfig(batch_size=B, lr=5e-4, ema=True),
    )
    ckpt = train(tps_cfg, "tps")

    from mdgen_finetune_tpu.cli.tps_inference import main as tps_main

    tps_out = os.path.join(args.outdir, "tps_out")
    t0 = time.time()
    tps_main(["--sim_ckpt", ckpt, "--data_dir", data_dir, "--split", split,
              "--out_dir", tps_out, "--num_batches", str(n_batches),
              "--batch_size", str(batch_size)])
    summary["tps_gen_s"] = round(time.time() - t0, 1)

    from mdgen_finetune_tpu.cli.analyze_tps import main as atps_main

    tps_res = os.path.join(args.outdir, "tps_analysis")
    atps_main(["--pdbdir", tps_out, "--outdir", tps_res, "--save"])
    for pep in ("AGHK", "LVSE"):
        path = os.path.join(tps_res, f"{pep}.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                res = pickle.load(f)
            summary[f"tps_{pep}"] = {
                k: round(float(res[k]), 4)
                for k in ("gen_prob", "gen_valid_prob", "gen_valid_rate", "gen_JSD")
                if k in res
            }

    # ---- 2. inpainting / design ----
    des_cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, no_aa_emb=True,
                          use_bf16=not args.tiny, **model_kw),
        transport=TransportConfig(sampling_method="euler",
                                  inference_steps=infer_steps),
        data=DataConfig(data_dir=data_dir, num_frames=T, crop=4),
        task=TaskConfig(inpainting=True, design=True, no_torsion=True),
        train=TrainConfig(batch_size=B, lr=2e-4, ema=True),
    )
    ckpt_d = train(des_cfg, "design")

    from mdgen_finetune_tpu.cli.design_inference import main as des_main

    des_out = os.path.join(args.outdir, "design_out")
    t0 = time.time()
    des_main(["--sim_ckpt", ckpt_d, "--data_dir", data_dir, "--split", split,
              "--out_dir", des_out, "--num_batches", str(n_batches),
              "--batch_size", str(batch_size), "--num_frames", str(T),
              "--random_start_idx"])
    summary["design_gen_s"] = round(time.time() - t0, 1)

    from mdgen_finetune_tpu.analysis import sequence_recovery
    from mdgen_finetune_tpu.geometry.tables import str_sequence_to_aatype

    for pep in ("AGHK", "LVSE"):
        path = os.path.join(des_out, f"{pep}_metadata.json")
        if not os.path.exists(path):
            continue
        meta = json.load(open(path))
        aa = np.array([m["aa_out"] for m in meta])
        true = np.asarray(str_sequence_to_aatype(pep))
        rec = sequence_recovery(aa[:, 0] if aa.ndim == 3 else aa, true)
        summary[f"design_{pep}"] = {k: round(float(v), 4) for k, v in rec.items()}

    summary["total_s"] = round(time.time() - t_start, 1)
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
