#!/usr/bin/env python
"""HPO sampler quality: native TPE vs random-search control.

BASELINE.md row 5 evidence (VERDICT round-3 missing #4): the native TPE
engine (pixelrec_multimodal_tpu/hpo/search.py) is the PRODUCTION sampler
in this environment (optuna absent), so its optimization quality needs
numbers, not just exercised-in-tests. Reference anchor: the Optuna TPE
study the reference drives at
/root/reference/scripts/hyperparameter_search.py:445-480.

Two modes:

* ``--mode surrogate`` (default): a deterministic HPO-shaped loss
  surface (log-scale LR/weight-decay valley + dropout bowl + a
  categorical fusion offset + seeded noise) through the SAME
  suggest_float/suggest_int/suggest_categorical API the real objective
  uses. Runs ``--n_seeds`` paired studies per sampler and reports mean
  best-value-at-trial-k curves and the TPE win rate. Exits rc=1 if TPE
  does not beat random at the final k (regression guard).
* ``--mode workspace --config <yaml>``: the real training objective on
  a synthetic workspace via scripts/hyperparameter_search.py, one TPE
  and one random study at the same seed; reports the best-at-k curve
  from the study dataframes.

Prints one JSON document on stdout (this is NOT bench.py; no one-line
contract here).
"""
from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pixelrec_multimodal_tpu.hpo import (  # noqa: E402
    RandomSampler,
    TPESampler,
    create_study,
)


def surrogate_objective(seed: int):
    """HPO-shaped loss: smooth valley + per-trial seeded noise.

    Optimum: lr=3e-3, wd=1e-4, dropout=0.15, fusion=gated, 2 layers.
    Noise sigma 0.05 (≈ the val-loss jitter scale of the tiny workspace
    runs), keyed on (seed, trial_number) so reruns are bit-stable.
    """

    def objective(trial):
        lr = trial.suggest_float('learning_rate', 1e-5, 1e-1, log=True)
        wd = trial.suggest_float('weight_decay', 1e-6, 1e-2, log=True)
        dr = trial.suggest_float('dropout_rate', 0.0, 0.5)
        fusion = trial.suggest_categorical(
            'fusion_type', ['concatenate', 'attention', 'gated'])
        n_layers = trial.suggest_int('n_layers', 1, 4)
        loss = (
            0.50 * (math.log10(lr) + 2.52) ** 2
            + 0.15 * (math.log10(wd) + 4.0) ** 2
            + 2.00 * (dr - 0.15) ** 2
            + {'gated': 0.0, 'concatenate': 0.25, 'attention': 0.40}[fusion]
            + 0.10 * abs(n_layers - 2)
        )
        noise_rng = np.random.default_rng((seed + 1) * 100_003
                                          + trial.number)
        return loss + float(noise_rng.normal(0.0, 0.05))

    return objective


def best_at_k(values):
    out, best = [], math.inf
    for v in values:
        if v is not None and math.isfinite(v):
            best = min(best, v)
        out.append(best)
    return out


def run_surrogate(n_seeds: int, n_trials: int) -> dict:
    curves = {'tpe': [], 'random': []}
    for seed in range(n_seeds):
        for name, sampler_cls in (('tpe', TPESampler),
                                  ('random', RandomSampler)):
            study = create_study(study_name=f'{name}-{seed}',
                                 sampler=sampler_cls(seed=seed),
                                 direction='minimize')
            study.optimize(surrogate_objective(seed), n_trials=n_trials)
            values = [t.value for t in study.trials]
            curves[name].append(best_at_k(values))
    tpe = np.asarray(curves['tpe'])        # [seeds, trials]
    rnd = np.asarray(curves['random'])
    ks = sorted({min(n_trials, k) for k in
                 (10, 15, 20, 30, 40, 60, n_trials)})
    report = {
        'mode': 'surrogate',
        'n_seeds': n_seeds,
        'n_trials': n_trials,
        'mean_best_at_k': {
            str(k): {'tpe': round(float(tpe[:, k - 1].mean()), 4),
                     'random': round(float(rnd[:, k - 1].mean()), 4)}
            for k in ks},
        'tpe_win_rate_final': round(
            float((tpe[:, -1] < rnd[:, -1]).mean()), 3),
        'tpe_beats_random_final': bool(
            tpe[:, -1].mean() < rnd[:, -1].mean()),
    }
    return report


def run_workspace(config: str, n_trials: int, out_dir: Path) -> dict:
    from hyperparameter_search import main as hpo_main
    curves = {}
    for name in ('tpe', 'random'):
        d = out_dir / name
        study = hpo_main([
            '--config', config, '--n_trials', str(n_trials),
            '--output_dir', str(d), '--study_name', f'quality-{name}',
            '--storage', str(d / 'study.json'),
            '--sampler', name, '--seed', '42', '--device', 'cpu'])
        values = [t.value for t in study.trials]
        curves[name] = best_at_k(values)
    ks = sorted({min(n_trials, k) for k in (5, 10, 15, 20, n_trials)})
    return {
        'mode': 'workspace',
        'n_trials': n_trials,
        'best_at_k': {
            str(k): {'tpe': round(curves['tpe'][k - 1], 5),
                     'random': round(curves['random'][k - 1], 5)}
            for k in ks},
        'curve_tpe': [round(v, 5) for v in curves['tpe']],
        'curve_random': [round(v, 5) for v in curves['random']],
        'tpe_beats_random_final':
            bool(curves['tpe'][-1] <= curves['random'][-1]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--mode', choices=['surrogate', 'workspace'],
                   default='surrogate')
    p.add_argument('--n_seeds', type=int, default=20)
    p.add_argument('--n_trials', type=int, default=40)
    p.add_argument('--config', type=str, default=None,
                   help='workspace mode: config yaml of the synthetic ws')
    p.add_argument('--output_dir', type=str, default='/tmp/hpo_quality')
    args = p.parse_args()

    if args.mode == 'surrogate':
        report = run_surrogate(args.n_seeds, args.n_trials)
    else:
        if not args.config:
            p.error('--mode workspace requires --config')
        report = run_workspace(args.config, args.n_trials,
                               Path(args.output_dir))
    print(json.dumps(report, indent=2))
    if not report['tpe_beats_random_final']:
        print('FAIL: TPE did not beat random search', file=sys.stderr)
        sys.exit(1)


if __name__ == '__main__':
    main()
