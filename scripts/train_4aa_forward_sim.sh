#!/bin/bash
# 4AA forward-simulation training (reference README.md:52 command, TPU edition)
python -m mdgen_finetune_tpu.cli.train --sim_condition \
    --train_split splits/4AA_train.csv --val_split splits/4AA_val.csv \
    --data_dir data/4AA_data/ --num_frames 1000 --prepend_ipa --abs_pos_emb \
    --crop 4 --ckpt_freq 40 --val_repeat 25 --suffix _i100 --epochs 10000 \
    --grad_checkpointing --run_name forward_sim "$@"
