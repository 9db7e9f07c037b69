"""CLI training driver — the gcn/train.py equivalent.

Usage::

    python -m stochastic_gcn_tpu.cli.train --dataset cora --cv --degree=1 ...

Flag names/semantics match the reference (train.py:25-67); dataset recipes
live in configs/*.sh.
"""

from __future__ import annotations

import sys

import numpy as np

from ..config import parse_flags
from ..data.loaders import load_data
from ..training.loop import Trainer


def main(argv=None):
    cfg = parse_flags(argv)
    np.random.seed(cfg.seed)

    ds = load_data(cfg)
    print("Features shape = {}, training edges = {}, testing edges = {}"
          .format(ds.feats.shape, ds.train_adj.nnz, ds.full_adj.nnz))
    print("{} training data, {} validation data, {} testing data.".format(
        len(ds.train_d), len(ds.val_d), len(ds.test_d)))

    trainer = Trainer(cfg, ds)
    trainer.sgd_train()

    if cfg.gradvar:
        trainer.gradient_variance()

    trainer.run_tests()
    return trainer


if __name__ == "__main__":
    main(sys.argv[1:])
