"""Reference-recipe presets carry the documented hyperparameters."""

from cmx.config.presets import PRESETS


def test_all_presets_build():
    for name, fn in PRESETS.items():
        cfg = fn()
        # mae_tuned is a variant key: it resolves task.name to its base task
        assert cfg.task.name == name.split("_")[0]


def test_spark_preset_values():
    cfg = PRESETS["spark"]()
    assert cfg.optim.name == "lamb"
    assert cfg.optim.lr == 2e-4 and cfg.optim.base_lr_scaled
    assert cfg.optim.weight_decay == 0.04 and cfg.optim.wd_end == 0.2
    assert cfg.optim.clip_norm == 5.0
    assert cfg.task.mask_ratio == 0.6 and cfg.task.full_unet
    assert cfg.train.epochs == 1600 and cfg.optim.warmup_epochs == 40


def test_moco_preset_values():
    cfg = PRESETS["moco"]()
    assert cfg.optim.name == "sgd" and cfg.optim.lr == 0.03
    assert cfg.task.num_negatives == 65536
    assert cfg.task.ema_momentum == 0.999
    assert cfg.task.temperature == 0.07


def test_genesis_preset_values():
    cfg = PRESETS["genesis"]()
    assert cfg.optim.name == "sgd" and cfg.optim.lr == 1e-2
    assert cfg.train.patience == 50


def test_cmunet_preset_values():
    cfg = PRESETS["cmunet"]()
    assert cfg.task.mask_ratio == 0.65
    assert cfg.optim.name == "adamw"
    assert cfg.task.ema_momentum == 0.996


def test_genesis_tuned_preset_values():
    # RESULTS.md round-3 "Genesis anomaly grounded": nonlinear remap off,
    # every other knob the reference recipe; task resolves to genesis
    cfg = PRESETS["genesis_tuned"]()
    assert cfg.task.name == "genesis"
    assert cfg.task.genesis_nonlinear_rate == 0.0
    assert cfg.task.genesis_paint_rate == 0.9  # rest untouched
    assert cfg.optim.name == "sgd" and cfg.optim.lr == 1e-2
    assert cfg.train.patience == 50


def test_mae_tuned_preset_values():
    # RESULTS.md round-5 ablation winner: ratio 0.75, task resolves to mae
    cfg = PRESETS["mae_tuned"]()
    assert cfg.task.name == "mae"
    assert cfg.task.mask_ratio == 0.75
    assert cfg.task.patch_size == 16
    assert cfg.optim.name == "sgd" and cfg.optim.lr == 1e-2
