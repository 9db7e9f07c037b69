"""stochastic_gcn_tpu — TPU-native stochastic GCN training framework.

A from-scratch JAX/XLA/Pallas re-design of the system described in
"Stochastic Training of Graph Convolutional Networks with Variance
Reduction" (Chen, Zhu, Song — ICML 2018), with the capabilities of the
reference implementation (thu-ml/stochastic_gcn) and a TPU-first
architecture: device-resident graphs, on-device receptive-field sampling,
control-variate estimators over HBM-resident history, and pjit/shard_map
scale-out.
"""

__version__ = "0.1.0"

from .config import Config, parse_flags

__all__ = ["Config", "parse_flags"]
