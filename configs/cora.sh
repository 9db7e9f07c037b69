#!/usr/bin/env bash
# reference: gcn/config/cora.config
python -m stochastic_gcn_tpu.cli.train --dataset cora "$@"
