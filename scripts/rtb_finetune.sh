#!/bin/bash
# RTB posterior fine-tuning (reference src/scripts/mdgen_finetune.sh equivalent)
python -m mdgen_finetune_tpu.cli.train_posterior \
    --sim_ckpt "$1" --data_dir data/4AA_data --split splits/4AA_train.csv \
    --traj_length 1000 --sampling_length 10 --xT_type uniform \
    --batch_size 4 --vargrad --exp_name rtb_finetune "${@:2}"
