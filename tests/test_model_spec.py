"""Model-spec construction parity: the layer stack must mirror
GCN._build's flag-driven composition (gcn/models.py:258-337)."""

import pytest

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.models.gcn import (AggSpec, AugDenseSpec, DenseSpec,
                                           DetFCSpec, DropoutSpec,
                                           build_model_spec,
                                           first_param_layer)


def kinds(spec):
    return [type(s).__name__ for s in spec.specs]


def test_default_pp_stack():
    """num_layers=2, preprocess, num_fc_layers=1:
    [Dropout, Dense(PP)] + [Agg, Dropout, Dense]."""
    cfg = Config(num_layers=2, preprocess=True)
    s = build_model_spec(cfg, 100, 7, True, False, False)
    assert kinds(s) == ["DropoutSpec", "DenseSpec", "AggSpec",
                        "DropoutSpec", "DenseSpec"]
    d0, d1 = s.specs[1], s.specs[4]
    assert d0.input_dim == 100 and d0.output_dim == cfg.hidden1
    assert d1.input_dim == cfg.hidden1 and d1.output_dim == 7
    assert d0.relu and not d1.relu           # last layer linear
    assert not d1.norm                       # last layer never normed
    assert s.num_agg_layers == 1
    assert s.history_dims == (cfg.hidden1,)
    assert first_param_layer(s) == "dense0"


def test_no_preprocess_stack():
    """Without PP: L=2 aggregators, agg0 consumes raw features."""
    cfg = Config(num_layers=2, preprocess=False)
    s = build_model_spec(cfg, 100, 7, False, False, False)
    assert kinds(s) == ["AggSpec", "DropoutSpec", "DenseSpec", "AggSpec",
                        "DropoutSpec", "DenseSpec"]
    assert s.num_agg_layers == 2
    assert s.agg0_dim == 100
    assert s.history_dims == (100, cfg.hidden1)
    assert s.specs[2].input_dim == 100


def test_graphsage_dim_doubling():
    """graphsage norm concatenates self features: dim_s=2
    (gcn/models.py:262,306)."""
    cfg = Config(num_layers=2, preprocess=True, normalization="graphsage")
    s = build_model_spec(cfg, 100, 7, True, False, False)
    assert s.specs[1].input_dim == 200           # PP FC sees [X ‖ ÂX]
    assert s.specs[4].input_dim == 2 * cfg.hidden1  # post-agg concat


def test_cvd_uses_aug_dense_except_last():
    """cvd: AugmentedDropoutDense everywhere except after the LAST
    aggregation (gcn/models.py:283-289,319-324)."""
    cfg = Config(num_layers=3, preprocess=True, cv=True, cvd=True,
                 num_fc_layers=1)
    s = build_model_spec(cfg, 64, 5, True, True, True)
    assert kinds(s) == ["AugDenseSpec", "AggSpec", "AugDenseSpec",
                        "AggSpec", "DropoutSpec", "DenseSpec"]


def test_det_dropout_uses_det_fc():
    cfg = Config(num_layers=2, preprocess=True, det_dropout=True)
    s = build_model_spec(cfg, 64, 5, True, True, False)
    assert kinds(s) == ["DetFCSpec", "AggSpec", "DropoutSpec", "DenseSpec"]
    # reference hardwires PP DetFC output to hidden1 (models.py:276-282)
    assert s.specs[0].output_dim == cfg.hidden1
    assert s.n_history_per_layer == 2


def test_reverse_moves_dropout_after_dense():
    """--reverse: dense first, dropout after (except last layer)
    (gcn/models.py:326-335)."""
    cfg = Config(num_layers=3, preprocess=False, reverse=True)
    s = build_model_spec(cfg, 64, 5, False, False, False)
    assert kinds(s) == ["AggSpec", "DenseSpec", "DropoutSpec",
                        "AggSpec", "DenseSpec", "DropoutSpec",
                        "AggSpec", "DenseSpec"]
    assert s.reverse_input_dropout


def test_num_fc_layers_2():
    cfg = Config(num_layers=2, preprocess=True, num_fc_layers=2)
    s = build_model_spec(cfg, 64, 5, True, False, False)
    assert kinds(s) == ["DropoutSpec", "DenseSpec", "DropoutSpec",
                        "DenseSpec", "AggSpec", "DropoutSpec", "DenseSpec",
                        "DropoutSpec", "DenseSpec"]
    # only the very last is linear/unnormed
    dense = [x for x in s.specs if isinstance(x, DenseSpec)]
    assert [d.relu for d in dense] == [True, True, True, False]


def test_weight_decay_targets_first_param_layer():
    from stochastic_gcn_tpu.models.gcn import weight_decay_param_names
    cfg = Config(num_layers=2, preprocess=False)
    s = build_model_spec(cfg, 64, 5, False, False, False)
    # first spec is an aggregator (no params) -> first dense carries the wd
    assert first_param_layer(s) == "dense0"
    # Dense registers only its weights in vars (layers.py:113-115)
    assert weight_decay_param_names(s) == ("dense0", ("weights",))
    # Aug/Det layers register offset/scale too (layers.py:153-158,376-381)
    cfg2 = Config(num_layers=2, preprocess=True, cv=True, cvd=True,
                  layer_norm=True)
    s2 = build_model_spec(cfg2, 64, 5, True, True, True)
    assert weight_decay_param_names(s2) == (
        "dense0", ("weights", "offset", "scale"))
