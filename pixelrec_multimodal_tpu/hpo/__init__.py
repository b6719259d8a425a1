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
from .visualization import (  # noqa: F401
    compute_param_importances,
    plot_optimization_history,
    plot_parallel_coordinate,
    plot_param_importances,
    save_study_visualizations,
)
