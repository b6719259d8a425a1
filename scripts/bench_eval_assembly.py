#!/usr/bin/env python
"""Host-side eval candidate-assembly throughput: ours vs reference pattern.

The reference's retrieval evaluator rebuilds the full candidate list and a
per-candidate popularity-weight list for every user
(/root/reference/src/evaluation/tasks.py:181-308) — O(users x catalog)
host python, its own documented hot spot. Our evaluator caches catalog
arrays once and samples through a virtual index
(pixelrec_multimodal_tpu/evaluation/tasks.py:_sample_negatives) with
bit-identical RNG streams. This measures both on the same synthetic
workload (VERDICT round 1 item 6's acceptance bar: >=10x at
10k users x 50k items) and asserts the outputs match exactly.

Pure host benchmark — runs on CPU. Prints one JSON line per variant.
"""
from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_USERS = 10_000
N_ITEMS = 50_000
NUM_NEGATIVES = 100
POSITIVES_PER_USER = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_evaluator(sampling_strategy: str):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from pixelrec_multimodal_tpu.evaluation.tasks import TopKRetrievalEvaluator

    rng = np.random.default_rng(0)
    item_ids = np.array([f'i{j}' for j in range(N_ITEMS)])
    users = np.repeat([f'u{j}' for j in range(N_USERS)], POSITIVES_PER_USER)
    items = item_ids[rng.integers(0, N_ITEMS, len(users))]
    test_data = pd.DataFrame({'user_id': users, 'item_id': items})

    encoder = SimpleNamespace(classes_=item_ids)
    dataset = SimpleNamespace(item_encoder=encoder)
    recommender = SimpleNamespace(dataset=dataset)
    config = SimpleNamespace(recommendation=SimpleNamespace(top_k=10))
    ev = TopKRetrievalEvaluator(
        recommender, test_data, config, use_sampling=True,
        num_negatives=NUM_NEGATIVES, sampling_strategy=sampling_strategy)
    return ev, test_data


def reference_pattern_sample(user_id, positive_items, all_items, counts,
                             num_negatives, strategy, stable_user_seed):
    """The reference's per-user assembly: rebuild the candidate list and
    (for popularity strategies) the per-candidate weight list every call
    (reference tasks.py:181-308)."""
    pos = set(positive_items)
    candidates = [i for i in all_items if i not in pos]
    if len(candidates) < num_negatives:
        return candidates
    seed = stable_user_seed(user_id)
    if strategy == 'random':
        return random.Random(seed).sample(candidates, num_negatives)
    weights = np.array([float(counts.get(i, 1)) for i in candidates])
    if strategy == 'popularity_inverse':
        weights = 1.0 / weights
    p = weights / weights.sum()
    rs = np.random.RandomState(seed)
    picked = rs.choice(len(candidates), size=num_negatives,
                       replace=False, p=p)
    return [candidates[int(j)] for j in picked]


def main():
    strategy = sys.argv[1] if len(sys.argv) > 1 else 'random'
    limit_ref = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    ev, test_data = build_evaluator(strategy)
    from pixelrec_multimodal_tpu.evaluation.tasks import stable_user_seed

    groups = {u: list(g['item_id'])
              for u, g in test_data.groupby('user_id', sort=False)}
    user_list = list(groups)

    # ---- ours: full run over all users
    t0 = time.time()
    ours = {}
    for u in user_list:
        ours[u] = ev._sample_negatives(u, groups[u])
    dt_ours = time.time() - t0
    rate_ours = len(user_list) / dt_ours
    log(f"ours: {len(user_list)} users in {dt_ours:.2f}s "
        f"-> {rate_ours:,.0f} users/s")

    # ---- reference pattern: limited subset (it is too slow for 10k),
    # extrapolated per-user
    all_items = [str(i) for i in ev._get_all_item_ids()]
    counts = test_data['item_id'].value_counts()
    subset = user_list[:limit_ref]
    t0 = time.time()
    ref = {}
    for u in subset:
        ref[u] = reference_pattern_sample(
            u, groups[u], all_items, counts, NUM_NEGATIVES, strategy,
            stable_user_seed)
    dt_ref = time.time() - t0
    rate_ref = len(subset) / dt_ref
    log(f"reference pattern: {len(subset)} users in {dt_ref:.2f}s "
        f"-> {rate_ref:,.0f} users/s")

    # ---- bit-identical outputs on the measured subset
    mismatches = sum(1 for u in subset if ours[u] != ref[u])
    log(f"output mismatches vs reference pattern: {mismatches}/{len(subset)}")
    assert mismatches == 0, "assembly outputs diverged from reference"

    speedup = rate_ours / rate_ref
    print(json.dumps({
        'metric': f'eval_candidate_assembly_users_per_sec_{strategy}',
        'value': round(rate_ours, 1), 'unit': 'users/sec',
        'vs_reference_pattern': round(speedup, 1)}), flush=True)


if __name__ == '__main__':
    main()
