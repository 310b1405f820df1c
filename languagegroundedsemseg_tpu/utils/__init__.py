"""Utilities: PLY IO, timers, logging, checkpoint helpers."""

from languagegroundedsemseg_tpu.utils.ply import read_ply, write_ply
from languagegroundedsemseg_tpu.utils.timer import Timer, AverageMeter

__all__ = ["read_ply", "write_ply", "Timer", "AverageMeter"]
