#!/bin/bash
# Hyperparameter grid over RTB method/vargrad/replay-buffer
# (reference src/scripts/mdgen_launcher.sh equivalent)
CKPT="$1"
for method in rtb tb; do
  for vg in "" "--vargrad"; do
    for rb in "" "--replay_buffer"; do
      name="rtb_${method}${vg:+_vg}${rb:+_rb}"
      python -m mdgen_finetune_tpu.cli.train_posterior --sim_ckpt "$CKPT" \
        --data_dir data/4AA_data --split splits/4AA_train.csv \
        --method $method $vg $rb --exp_name "$name" "${@:2}"
    done
  done
done
