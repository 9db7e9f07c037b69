#!/usr/bin/env bash
# reference: gcn/config/nell.config
python -m stochastic_gcn_tpu.cli.train --dataset nell --hidden1 64 --dropout 0.1 --weight_decay 1e-5 "$@"
