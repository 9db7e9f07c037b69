from .graph import (Dataset, PaddedGraph, PaddedSparseFeatures, dense_rows,
                    pad_csr, pad_sparse_features)
from .loaders import load_data, synthetic_dataset
from . import preprocess
