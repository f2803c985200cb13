"""C7: learnable hyperparameter containers (reference gs_model.py:76-119)."""

import numpy as np

from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
from simplegaussiansplat_tk71_tpu.train.hyper import HyperState


def test_from_config_round_trips_values():
    cfg = TrainConfig()
    h = HyperState.from_config(cfg)
    assert np.isclose(h.value("grad_threshold"), cfg.grad_threshold)
    assert np.isclose(h.value("percent_dense"), cfg.percent_dense)
    assert np.isclose(h.value("prunning_min_opacity"), cfg.prune_min_opacity)
    assert np.isclose(h.value("feature_lr"), cfg.feature_lr)
    # logit-space field round-trips through sigmoid (gs_model.py:83)
    assert np.isclose(h.value("variance_pixel_tile_max_width"), 0.9, atol=1e-5)


def test_frozen_by_default_update_is_identity():
    h = HyperState.from_config(TrainConfig())
    before = h.params.values()
    h.update({"grad_threshold": 1.0})
    assert h.params.values() == before


def test_learnable_update_moves_only_supplied_fields_direction():
    h = HyperState.from_config(TrainConfig(), lr=0.01, learnable=True)
    g0 = h.value("grad_threshold")
    p0 = h.value("percent_dense")
    h.update({"grad_threshold": 1.0})  # positive grad -> value decreases
    assert h.value("grad_threshold") < g0
    assert np.isclose(h.value("percent_dense"), p0)  # no grad -> unchanged


def test_logit_field_stays_in_unit_interval_under_updates():
    h = HyperState.from_config(TrainConfig(), lr=0.1, learnable=True)
    for _ in range(20):
        h.update({"variance_pixel_tile_max_width": -5.0})
    v = h.value("variance_pixel_tile_max_width")
    assert 0.0 < v < 1.0


def test_trainer_reads_thresholds_through_container():
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points

    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    model = init_from_points(xyz, np.full(64, 0.05, np.float32))

    class _DS:
        img_wh = (32, 32)
        extent = 2.0

    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer

    tr = Trainer(model, _DS(), TrainConfig(max_per_tile=64, max_pairs=2048))
    assert np.isclose(tr.hyper.value("grad_threshold"),
                      tr.config.grad_threshold)


def test_set_value_live_threshold():
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.hyper import HyperState

    h = HyperState.from_config(TrainConfig())
    assert abs(h.value("grad_threshold") - 0.0004) < 1e-9
    h.set_value("grad_threshold", 0.001)
    assert abs(h.value("grad_threshold") - 0.001) < 1e-9
    # logit-space field round-trips through natural units
    h.set_value("variance_pixel_tile_max_width", 0.25)
    assert abs(h.value("variance_pixel_tile_max_width") - 0.25) < 1e-6
