"""pixelrec_multimodal_tpu — a TPU-native multimodal recommendation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Joacodef/PixelRec_Multimodal: multimodal (vision + language + ID + numerical)
recommendation on PixelRec-style datasets, with offline preprocessing,
splitting, sharded encoder precompute, pjit training, full-catalog scoring with
on-device top-K, retrieval/ranking evaluation, baselines, and HPO.

Design principles (TPU-first):
  * Item features live in device-resident tables (HBM); compiled steps gather
    by item index — no per-sample host collate.
  * All hot math (encoder forwards, pair scoring, metrics) is jitted XLA with
    static shapes; scale-out is jax.sharding over a (data, model) mesh.
  * Host code handles only IO, orchestration and cheap bookkeeping.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    MODEL_CONFIGS,
    RecommendationConfig,
    TrainingConfig,
)
