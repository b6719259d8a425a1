"""Native HPO visualization artifacts (reference saves plotly HTMLs,
scripts/hyperparameter_search.py:534-555; here matplotlib PNGs)."""
import math

import numpy as np
import pytest

from pixelrec_multimodal_tpu.hpo import (
    TPESampler,
    compute_param_importances,
    create_study,
    save_study_visualizations,
)


def _run_study(n_trials=12, direction='minimize'):
    study = create_study('t', direction=direction, sampler=TPESampler(seed=0))

    def obj(trial):
        lr = trial.suggest_float('lr', 1e-4, 1e-1, log=True)
        fusion = trial.suggest_categorical('fusion', ['a', 'b'])
        return (math.log10(lr) + 2.5) ** 2 + (0.3 if fusion == 'b' else 0.0)

    study.optimize(obj, n_trials=n_trials)
    return study


class TestHPOVisualization:
    def test_saves_all_three_pngs(self, tmp_path):
        study = _run_study()
        written = save_study_visualizations(study, str(tmp_path),
                                            metric_name='val_loss')
        names = sorted(p.split('/')[-1] for p in written)
        assert names == ['optimization_history.png',
                         'parallel_coordinate.png', 'param_importances.png']
        for p in written:
            with open(p, 'rb') as f:
                assert f.read(8).startswith(b'\x89PNG')

    def test_importances_skipped_below_six_trials(self, tmp_path):
        study = _run_study(n_trials=4)
        written = save_study_visualizations(study, str(tmp_path))
        assert not any('param_importances' in p for p in written)

    def test_importances_normalized_and_signal_detected(self):
        study = _run_study(n_trials=30)
        imp = compute_param_importances(study)
        assert set(imp) == {'lr', 'fusion'}
        assert abs(sum(imp.values()) - 1.0) < 1e-9
        assert all(v >= 0 for v in imp.values())

    def test_categorical_dominant_param_ranks_first(self):
        study = create_study('c', direction='maximize',
                             sampler=TPESampler(seed=1))

        def obj(trial):
            trial.suggest_float('noise', 0.0, 1.0)
            choice = trial.suggest_categorical('arch', ['x', 'y'])
            return 10.0 if choice == 'x' else 0.0

        study.optimize(obj, n_trials=25)
        imp = compute_param_importances(study)
        assert max(imp, key=imp.get) == 'arch'

    def test_empty_study_writes_nothing(self, tmp_path):
        study = create_study('e')
        assert save_study_visualizations(study, str(tmp_path)) == []

    def test_failed_trials_excluded(self, tmp_path):
        study = create_study('f', sampler=TPESampler(seed=0))

        def obj(trial):
            v = trial.suggest_float('x', 0.0, 1.0)
            if trial.number % 3 == 0:
                raise RuntimeError('boom')
            return v

        study.optimize(obj, n_trials=9)
        written = save_study_visualizations(study, str(tmp_path))
        assert any('optimization_history' in p for p in written)

    def test_works_with_maximize_direction(self, tmp_path):
        study = _run_study(direction='maximize')
        written = save_study_visualizations(study, str(tmp_path))
        assert len(written) >= 2

    def test_nonfinite_values_ignored(self):
        study = create_study('n')

        def obj(trial):
            x = trial.suggest_float('x', 0.0, 1.0)
            return float('nan') if trial.number == 0 else x

        study.optimize(obj, n_trials=6)
        imp = compute_param_importances(study)
        assert all(np.isfinite(v) for v in imp.values())
