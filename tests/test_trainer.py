"""End-to-end trainer: baseline + representation modes on synthetic data."""

import numpy as np
import pytest

from languagegroundedsemseg_tpu.config import Config
from languagegroundedsemseg_tpu.train.trainer import Trainer, select_mode


def _cfg(**kw):
    kw.setdefault("ignore_label", 255)
    kw.setdefault("fixed_capacity", 4096)
    kw.setdefault("dataset", "SyntheticTiny20Dataset")
    kw.setdefault("model", "Res16UNet14A")
    kw.setdefault("batch_size", 2)
    kw.setdefault("val_batch_size", 2)
    kw.setdefault("num_workers", 1)
    kw.setdefault("num_val_workers", 1)
    kw.setdefault("num_devices", 1)
    kw.setdefault("lr", 0.1)
    return Config(**kw)


def test_mode_selection():
    assert select_mode(_cfg()) == "baseline"
    assert select_mode(_cfg(use_embedding_loss="contrastive")) == "representation"
    assert select_mode(_cfg(use_embedding_loss="both")) == "baseline"
    assert select_mode(_cfg(model="ClassifierNet")) == "classifier"


def test_baseline_trainer_fit_and_validate(tmp_path):
    cfg = _cfg(log_dir=str(tmp_path / "run"), balanced_category_sampling=True)
    tr = Trainer(cfg)
    state = tr.fit(max_epochs=2, max_steps_per_epoch=2)
    assert int(state.step) == 4
    m = tr.validate(max_batches=2)
    assert 0.0 <= m["val_miou"] <= 1.0
    assert np.isfinite(m["val_loss"])
    # checkpoints written
    import glob

    assert glob.glob(str(tmp_path / "run" / "last_step=*.ckpt"))
    assert glob.glob(str(tmp_path / "run" / "best_val_miou*.ckpt"))


def test_representation_trainer_step(tmp_path):
    cfg = _cfg(
        log_dir=str(tmp_path / "rep"),
        use_embedding_loss="contrastive",
        model="Res16UNet14A",
        balanced_category_sampling=True,
    )
    tr = Trainer(cfg)
    assert tr.mode == "representation"
    state = tr.fit(max_epochs=1, max_steps_per_epoch=2)
    assert int(state.step) == 2
    m = tr.validate(max_batches=1)
    assert np.isfinite(m["val_loss"])


def test_trainer_resume(tmp_path):
    cfg = _cfg(log_dir=str(tmp_path / "r1"))
    tr = Trainer(cfg)
    tr.fit(max_epochs=1, max_steps_per_epoch=2)

    cfg2 = _cfg(log_dir=str(tmp_path / "r2"), resume=str(tmp_path / "r1"))
    tr2 = Trainer(cfg2)
    tr2.fit(max_epochs=1, max_steps_per_epoch=1)
    assert int(tr2.state.step) == 3  # resumed at 2, +1
