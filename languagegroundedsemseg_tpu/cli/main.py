"""CLI entry point: ``python -m languagegroundedsemseg_tpu.cli.main --model
Res16UNet34C --dataset Scannet200Voxelization2cmDataset ...``

The flag surface mirrors the reference's main.py (reference main.py:55-201);
trainer-mode selection, resume discovery, and train/test dispatch match its
behavior.
"""

from __future__ import annotations

import logging
import os
import sys

from languagegroundedsemseg_tpu.config import get_config
from languagegroundedsemseg_tpu.utils.host_alloc import tune as _tune_host_alloc


def main(argv=None):
    _tune_host_alloc()
    config = get_config(argv)
    logging.basicConfig(
        level=logging.INFO,
        format=f"%(asctime)s [{os.uname().nodename}] %(message)s",
    )

    # Persistent XLA compilation cache: the fixed-capacity design compiles a
    # handful of bucket shapes once, then every restart is a cache hit.
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/lgs_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from languagegroundedsemseg_tpu.train.trainer import Trainer, select_mode

    mode = select_mode(config)
    logging.info("mode=%s model=%s dataset=%s", mode, config.model, config.dataset)

    if mode == "insseg":
        # Downstream instance segmentation (reference ddp_main.py entry):
        # dataset registry classes with "Instance" route here.
        from languagegroundedsemseg_tpu.insseg.dataset import load_instance_dataset
        from languagegroundedsemseg_tpu.insseg.trainer import InssegTrainer

        trainer = InssegTrainer(config, dataset_cls=load_instance_dataset(config.dataset))
        if config.is_train:
            trainer.fit(max_steps=int(config.max_iter))
        metrics = trainer.validate()
        logging.info("final metrics: %s", metrics)
        return metrics

    trainer = Trainer(config)
    if config.is_train:
        trainer.fit()
    metrics = trainer.test()
    logging.info("final metrics: %s", metrics)
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
