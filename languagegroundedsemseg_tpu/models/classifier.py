"""Classifier + projection models.

- ClassifierNet: plain linear layer over precomputed features (reference
  models/classifier_models.py:4-17), used by the classifier fine-tuning
  trainer.
- AttributeFittingModel: 8 per-attribute linear maps 512 -> 512, pretrained
  offline and used for latent instance augmentation (reference
  models/projection_models.py:4-19, consumed at
  lib/losses/ContrastiveLanguageLoss.py:61-69).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn
import jax.numpy as jnp


class ClassifierNet(nn.Module):
    out_channels: int = 200
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, graph=None, train: bool = False,
                 representation_only: bool = False):
        logits = nn.Dense(self.out_channels, dtype=self.dtype, name="classifier")(
            feats.astype(self.dtype)
        )
        return logits, feats


class AttributeFittingModel(nn.Module):
    """(N, D) -> (N, A, D): each attribute's learned linear projection."""

    feature_dim: int = 512
    num_attributes: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "maps",
            nn.initializers.normal(0.02),
            (self.num_attributes, self.feature_dim, self.feature_dim),
        )
        return jnp.einsum(
            "nd,ade->nae", feats.astype(self.dtype), w.astype(self.dtype)
        )
