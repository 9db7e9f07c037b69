#!/usr/bin/env bash
# reference: gcn/config/citeseer.config
python -m stochastic_gcn_tpu.cli.train --dataset citeseer "$@"
