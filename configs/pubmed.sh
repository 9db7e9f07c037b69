#!/usr/bin/env bash
# reference: gcn/config/pubmed.config
python -m stochastic_gcn_tpu.cli.train --dataset pubmed "$@"
