# pixelrec_multimodal_tpu/hpo/search.py
"""Self-contained hyperparameter search engine (Optuna-compatible surface).

The reference drives HPO through Optuna (reference
scripts/hyperparameter_search.py:31-635: TPESampler, MedianPruner, storage
with resume, trials_dataframe). This module provides the same capabilities
natively so the framework has no hard Optuna dependency:

  * :class:`Trial` — suggest_float/int/categorical, user attrs, intermediate
    reports, pruning checks.
  * :class:`TPESampler` — independent Tree-structured Parzen Estimator per
    parameter: after startup, split observed trials at the γ-quantile into
    good/bad, model each side with a Gaussian KDE (log-space for log params),
    and pick the candidate maximizing l(x)/g(x). Categoricals use smoothed
    good-trial frequencies.
  * :class:`MedianPruner` — prune when an intermediate value is worse than
    the median of other trials' values at the same step.
  * :class:`Study` — optimize loop, best_trial, trials_dataframe, and JSON
    persistence for resume (the `storage` argument is a filesystem path; a
    ``sqlite:///x.db`` URL is mapped to ``x.db.json``).

scripts/hyperparameter_search.py uses real Optuna when importable and this
engine otherwise — identical call sites either way.
"""
from __future__ import annotations

import json
import math
import os
import random as _random
import threading
from contextlib import contextmanager
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import numpy as np

try:
    import fcntl
except ImportError:  # non-POSIX: storage still works, just unlocked
    fcntl = None


class TrialPruned(Exception):
    """Raised to abandon an unpromising trial."""


class TrialState:
    COMPLETE = 'COMPLETE'
    PRUNED = 'PRUNED'
    FAIL = 'FAIL'
    RUNNING = 'RUNNING'


@dataclass
class FrozenTrial:
    number: int
    state: str = TrialState.RUNNING
    value: Optional[float] = None
    params: Dict[str, Any] = field(default_factory=dict)
    distributions: Dict[str, Dict[str, Any]] = field(default_factory=dict)
    user_attrs: Dict[str, Any] = field(default_factory=dict)
    intermediate_values: Dict[int, float] = field(default_factory=dict)

    def to_json(self):
        return {'number': self.number, 'state': self.state,
                'value': self.value, 'params': self.params,
                'distributions': self.distributions,
                'user_attrs': self.user_attrs,
                'intermediate_values': {str(k): v for k, v in
                                        self.intermediate_values.items()}}

    @classmethod
    def from_json(cls, d):
        t = cls(number=d['number'], state=d['state'], value=d.get('value'),
                params=d.get('params', {}),
                distributions=d.get('distributions', {}),
                user_attrs=d.get('user_attrs', {}))
        t.intermediate_values = {int(k): v for k, v in
                                 d.get('intermediate_values', {}).items()}
        return t


class Trial:
    """Live trial handle passed to the objective."""

    def __init__(self, study: 'Study', record: FrozenTrial):
        self.study = study
        self._record = record

    @property
    def number(self) -> int:
        return self._record.number

    @property
    def params(self) -> Dict[str, Any]:
        return dict(self._record.params)

    def _remember(self, name, value, dist):
        self._record.params[name] = value
        self._record.distributions[name] = dist
        return value

    def suggest_float(self, name, low, high, *, log: bool = False,
                      step: Optional[float] = None) -> float:
        v = self.study.sampler.sample_numeric(
            self.study, name, low, high, log=log)
        if step:
            v = low + round((v - low) / step) * step
        return self._remember(name, float(np.clip(v, low, high)),
                              {'type': 'float', 'low': low, 'high': high,
                               'log': log})

    def suggest_int(self, name, low, high, *, log: bool = False) -> int:
        v = self.study.sampler.sample_numeric(
            self.study, name, low, high, log=log)
        return self._remember(name, int(np.clip(round(v), low, high)),
                              {'type': 'int', 'low': low, 'high': high})

    def suggest_categorical(self, name, choices):
        v = self.study.sampler.sample_categorical(self.study, name,
                                                  list(choices))
        return self._remember(name, v,
                              {'type': 'categorical',
                               'choices': list(choices)})

    def set_user_attr(self, key, value):
        self._record.user_attrs[key] = value

    def report(self, value: float, step: int):
        self._record.intermediate_values[step] = float(value)

    def should_prune(self) -> bool:
        if self.study.pruner is None:
            return False
        return self.study.pruner.should_prune(self.study, self._record)


class TPESampler:
    """Independent TPE per parameter; random sampling during startup."""

    def __init__(self, seed: Optional[int] = None, n_startup_trials: int = 10,
                 n_ei_candidates: int = 24, gamma: float = 0.25):
        self.rng = np.random.default_rng(seed)
        self.py_rng = _random.Random(seed)
        self.n_startup_trials = n_startup_trials
        self.n_ei_candidates = n_ei_candidates
        self.gamma = gamma

    # -------------------------------------------------------------- history
    def _observations(self, study: 'Study', name: str):
        obs = [(t.params[name], t.value) for t in study.trials
               if t.state == TrialState.COMPLETE and t.value is not None
               and name in t.params and math.isfinite(t.value)]
        return obs

    def _split(self, obs, direction: str):
        values = sorted(obs, key=lambda x: x[1],
                        reverse=(direction == 'maximize'))
        n_good = max(1, int(math.ceil(self.gamma * len(values))))
        good = [v for v, _ in values[:n_good]]
        bad = [v for v, _ in values[n_good:]] or good
        return good, bad

    # -------------------------------------------------------------- numeric
    @staticmethod
    def _parzen(pts, lo: float, hi: float):
        """Parzen-mixture components over [lo, hi] (Optuna's estimator).

        Per-point bandwidth = max distance to the nearest sorted
        neighbor, magic-clipped to [span/min(100, n+1), span]; plus a
        range-wide Gaussian PRIOR component centered mid-range. Two
        earlier designs measurably LOST to random search on a noiseless
        quadratic (mean best at 40 trials: 0.71 with a fixed span/20
        bandwidth floor — proposals random-walk at floor resolution;
        0.97 with a Scott-rule global bandwidth — near-duplicate
        incumbent clusters shrink the bandwidth and freeze the
        optimizer on a premature cluster). Neighbor-distance bandwidths
        keep kernels wide where observations are sparse (directional
        signal from the bad side survives) and sharp only where
        evidence is genuinely dense.
        """
        span = max(hi - lo, 1e-12)
        mus = np.sort(np.asarray(pts, dtype=float))
        n = len(mus)
        if n == 1:
            bws = np.asarray([span])
        else:
            left = np.diff(mus, prepend=mus[0])
            right = np.diff(mus, append=mus[-1])
            bws = np.maximum(left, right)
        bws = np.clip(bws, span / min(100, n + 1), span)
        mus = np.append(mus, 0.5 * (lo + hi))   # prior component
        bws = np.append(bws, span)
        return mus, bws

    @staticmethod
    def _mixture_logpdf(x, mus, bws, lo, hi):
        """Log-density of the truncated-normal Parzen mixture at x."""
        z = (x[:, None] - mus[None, :]) / bws[None, :]
        pdf = np.exp(-0.5 * z ** 2) / (bws[None, :] * math.sqrt(2 * math.pi))
        # Truncation mass of each component inside [lo, hi].
        erf = np.vectorize(math.erf)
        cdf = lambda v: 0.5 * (1.0 + erf(v / math.sqrt(2)))  # noqa: E731
        mass = cdf((hi - mus) / bws) - cdf((lo - mus) / bws)
        comp = pdf / np.maximum(mass, 1e-12)[None, :]
        return np.log(comp.mean(axis=1) + 1e-300)

    def sample_numeric(self, study, name, low, high, log=False) -> float:
        obs = self._observations(study, name)
        tf = math.log if log else (lambda x: x)
        itf = math.exp if log else (lambda x: x)
        lo, hi = tf(low), tf(high)
        if len(obs) < self.n_startup_trials:
            return itf(self.rng.uniform(lo, hi))

        good, bad = self._split([(tf(v), y) for v, y in obs],
                                study.direction)
        g_mus, g_bws = self._parzen(good, lo, hi)
        b_mus, b_bws = self._parzen(bad, lo, hi)

        # Draw candidates from the good-side mixture (the prior
        # component gives decaying-probability global exploration),
        # score by the TPE acquisition log l(x) - log g(x).
        n_c = self.n_ei_candidates
        comp = self.rng.integers(0, len(g_mus), size=n_c)
        cands = np.clip(g_mus[comp] + self.rng.normal(0.0, 1.0, n_c)
                        * g_bws[comp], lo, hi)
        score = (self._mixture_logpdf(cands, g_mus, g_bws, lo, hi)
                 - self._mixture_logpdf(cands, b_mus, b_bws, lo, hi))
        return itf(float(cands[int(np.argmax(score))]))

    # ---------------------------------------------------------- categorical
    def sample_categorical(self, study, name, choices):
        obs = self._observations(study, name)
        if len(obs) < self.n_startup_trials:
            return self.py_rng.choice(choices)
        good, bad = self._split(obs, study.direction)

        def weights(side):
            counts = {repr(c): 1.0 for c in choices}  # +1 smoothing
            for v in side:
                counts[repr(v)] = counts.get(repr(v), 1.0) + 1.0
            total = sum(counts.values())
            return np.asarray([counts[repr(c)] / total for c in choices])

        score = np.log(weights(good)) - np.log(weights(bad))
        probs = np.exp(score - score.max())
        probs /= probs.sum()
        return choices[int(self.rng.choice(len(choices), p=probs))]


class RandomSampler(TPESampler):
    """Pure random search (startup behavior forever)."""

    def __init__(self, seed: Optional[int] = None):
        super().__init__(seed=seed, n_startup_trials=10 ** 9)


class MedianPruner:
    """Prune when the latest report is worse than the median of other
    trials' reports at the same step (after startup)."""

    def __init__(self, n_startup_trials: int = 5, n_warmup_steps: int = 0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def should_prune(self, study: 'Study', record: FrozenTrial) -> bool:
        if not record.intermediate_values:
            return False
        step = max(record.intermediate_values)
        if step < self.n_warmup_steps:
            return False
        value = record.intermediate_values[step]
        if math.isnan(value):
            return True
        others = [t.intermediate_values[step] for t in study.trials
                  if t.number != record.number
                  and t.state in (TrialState.COMPLETE, TrialState.PRUNED)
                  and step in t.intermediate_values
                  and math.isfinite(t.intermediate_values[step])]
        if len(others) < self.n_startup_trials:
            return False
        median = float(np.median(others))
        return value > median if study.direction == 'minimize' \
            else value < median


class Study:
    """Optimization loop with JSON persistence and parallel trials.

    ``optimize(n_jobs=k)`` runs k trials concurrently in threads (Optuna's
    own n_jobs semantics — the objective's device work releases the GIL).
    Independent PROCESSES pointing at the same ``storage`` path cooperate
    the way Optuna workers share a SQLite DB (reference
    hyperparameter_search.py:455-479): every trial begin/finish takes an
    exclusive flock on a sidecar lock file, merges the on-disk trial list,
    and writes back — so trial numbers never collide and each worker's TPE
    sees everyone's completed trials.
    """

    def __init__(self, study_name: str, direction: str = 'minimize',
                 sampler: Optional[TPESampler] = None,
                 pruner: Optional[MedianPruner] = None,
                 storage: Optional[str] = None):
        self.study_name = study_name
        self.direction = direction
        self.sampler = sampler or TPESampler()
        self.pruner = pruner
        self.trials: List[FrozenTrial] = []
        self._storage_path = self._resolve_storage(storage)
        self._lock = threading.RLock()

    @staticmethod
    def _resolve_storage(storage: Optional[str]) -> Optional[Path]:
        if not storage:
            return None
        if storage.startswith('sqlite:///'):
            return Path(storage[len('sqlite:///'):] + '.json')
        return Path(storage)

    # ----------------------------------------------------------- persistence
    def _save(self):
        if self._storage_path is None:
            return
        self._storage_path.parent.mkdir(parents=True, exist_ok=True)
        with open(self._storage_path, 'w') as f:
            json.dump({'study_name': self.study_name,
                       'direction': self.direction,
                       'trials': [t.to_json() for t in self.trials]}, f,
                      indent=2)

    def _load(self) -> bool:
        if self._storage_path is None or not self._storage_path.exists():
            return False
        with open(self._storage_path) as f:
            data = json.load(f)
        if data.get('study_name') != self.study_name:
            return False
        self.direction = data.get('direction', self.direction)
        self.trials = [FrozenTrial.from_json(t) for t in data.get('trials', [])]
        return True

    # -------------------------------------------------- cross-process storage
    @contextmanager
    def _storage_lock(self):
        """Exclusive flock on a sidecar file while touching shared storage."""
        if self._storage_path is None or fcntl is None:
            yield
            return
        self._storage_path.parent.mkdir(parents=True, exist_ok=True)
        lock_path = Path(str(self._storage_path) + '.lock')
        with open(lock_path, 'w') as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _merge_from_disk(self):
        """Fold other workers' trials into memory (finished beats RUNNING)."""
        if self._storage_path is None or not self._storage_path.exists():
            return
        try:
            with open(self._storage_path) as f:
                data = json.load(f)
        except (json.JSONDecodeError, OSError):
            return
        if data.get('study_name') != self.study_name:
            return
        by_num = {t.number: t for t in self.trials}
        for d in data.get('trials', []):
            t = FrozenTrial.from_json(d)
            cur = by_num.get(t.number)
            if cur is None or (cur.state == TrialState.RUNNING
                               and t.state != TrialState.RUNNING):
                by_num[t.number] = t
        self.trials = [by_num[k] for k in sorted(by_num)]

    def _begin_trial(self) -> FrozenTrial:
        with self._lock, self._storage_lock():
            self._merge_from_disk()
            number = self.trials[-1].number + 1 if self.trials else 0
            record = FrozenTrial(number=number)
            self.trials.append(record)
            self._save()
        return record

    def _finish_trial(self, record: FrozenTrial):
        with self._lock, self._storage_lock():
            self._merge_from_disk()
            self._save()

    def _discard_trial(self, record: FrozenTrial):
        with self._lock, self._storage_lock():
            self.trials = [t for t in self.trials
                           if t.number != record.number]
            self._merge_from_disk()
            self._save()

    # -------------------------------------------------------------- optimize
    def _run_one(self, objective: Callable[[Trial], float]):
        record = self._begin_trial()
        trial = Trial(self, record)
        try:
            value = objective(trial)
            record.value = float(value)
            record.state = TrialState.COMPLETE
        except TrialPruned:
            record.state = TrialState.PRUNED
        except KeyboardInterrupt:
            self._discard_trial(record)
            raise
        except Exception as e:
            print(f"Trial {record.number} failed: {e}")
            record.state = TrialState.FAIL
        self._finish_trial(record)

    def optimize(self, objective: Callable[[Trial], float],
                 n_trials: int = 100, n_jobs: int = 1,
                 show_progress_bar: bool = False):
        del show_progress_bar  # arg kept for Optuna surface parity
        if not n_jobs:
            n_jobs = 1
        if n_jobs < 0:
            n_jobs = os.cpu_count() or 1
        n_jobs = min(n_jobs, n_trials)
        if n_jobs == 1:
            for _ in range(n_trials):
                self._run_one(objective)
            return
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=n_jobs) as pool:
            futures = [pool.submit(self._run_one, objective)
                       for _ in range(n_trials)]
            for f in futures:
                f.result()

    # --------------------------------------------------------------- results
    @property
    def best_trial(self) -> Optional[FrozenTrial]:
        done = [t for t in self.trials
                if t.state == TrialState.COMPLETE and t.value is not None
                and math.isfinite(t.value)]
        if not done:
            return None
        key = (min if self.direction == 'minimize' else max)
        return key(done, key=lambda t: t.value)

    @property
    def best_params(self) -> Dict[str, Any]:
        best = self.best_trial
        return dict(best.params) if best else {}

    @property
    def best_value(self) -> Optional[float]:
        best = self.best_trial
        return best.value if best else None

    def trials_dataframe(self):
        import pandas as pd
        rows = []
        for t in self.trials:
            row = {'number': t.number, 'state': t.state, 'value': t.value}
            row.update({f'params_{k}': v for k, v in t.params.items()})
            row.update({f'user_attrs_{k}': v for k, v in t.user_attrs.items()})
            rows.append(row)
        return pd.DataFrame(rows)


def create_study(study_name: str = 'study', storage: Optional[str] = None,
                 sampler: Optional[TPESampler] = None,
                 pruner: Optional[MedianPruner] = None,
                 direction: str = 'minimize',
                 load_if_exists: bool = False) -> Study:
    study = Study(study_name, direction=direction, sampler=sampler,
                  pruner=pruner, storage=storage)
    if load_if_exists:
        if study._load():
            print(f"Loaded existing study '{study_name}' with "
                  f"{len(study.trials)} trials.")
    return study
