#!/usr/bin/env bash
# reference: gcn/config/reddit.config
python -m stochastic_gcn_tpu.cli.train --dataset reddit --normalization graphsage --weight_decay 0 --dropout 0.2 --layer_norm --hidden1 128 --num_fc_layers 2 --epochs 30 --early_stopping 30 --batch_size=512 --test_batch_size=512 --pad_degree=128 "$@"
