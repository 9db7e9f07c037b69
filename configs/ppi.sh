#!/usr/bin/env bash
# reference: gcn/config/ppi.config
python -m stochastic_gcn_tpu.cli.train --dataset ppi --normalization graphsage --weight_decay 0 --dropout 0.2 --layer_norm --batch_size 512 --hidden1 512 --num_fc_layers 2 --epochs 800 "$@"
