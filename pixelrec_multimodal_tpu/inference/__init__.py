"""Inference layer: catalog scorer, recommender API, baselines."""
from .recommender import Recommender  # noqa: F401
from .scorer import CatalogScorer  # noqa: F401
