"""Hyperparameter optimization: native TPE engine with an Optuna-compatible
surface; scripts use real Optuna when it is installed."""
from .search import (  # noqa: F401
    MedianPruner,
    RandomSampler,
    Study,
    TPESampler,
    Trial,
    TrialPruned,
    TrialState,
    create_study,
)
