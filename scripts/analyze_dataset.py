"""Dataset statistics table — the gcn/analyze-dataset.py role:
|V|, |E|, feature dim, classes, avg degree, avg squared degree, split sizes.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stochastic_gcn_tpu.config import parse_flags
from stochastic_gcn_tpu.data.loaders import load_data


def stats(ds):
    deg = np.diff(ds.full_adj.indptr)
    return dict(
        nodes=ds.num_data,
        edges=int(ds.full_adj.nnz),
        train_edges=int(ds.train_adj.nnz),
        features=int(ds.feature_dim),
        classes=int(ds.num_classes),
        avg_degree=float(deg.mean()),
        avg_sq_degree=float((deg.astype(np.float64) ** 2).mean()),
        max_degree=int(deg.max()),
        train=len(ds.train_d), val=len(ds.val_d), test=len(ds.test_d),
        multilabel=bool((ds.labels.sum(1) > 1).any()),
    )


def main(argv=None):
    cfg = parse_flags(argv)
    ds = load_data(cfg)
    s = stats(ds)
    width = max(len(k) for k in s)
    for k, v in s.items():
        print(f"{k:<{width}} : {v}")


if __name__ == "__main__":
    main()
