"""Driver-entry regression tests.

Round 1's MULTICHIP artifact went red because ``dryrun_multichip`` relied on
the caller's environment to select a CPU platform (VERDICT.md weak #1). The
entry must be self-hosting: these tests invoke it from a fresh subprocess
with the JAX env vars *stripped*, exactly like the driver does.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_dryrun_multichip_no_env_help():
    env = dict(os.environ)
    for k in ('JAX_PLATFORMS', 'XLA_FLAGS', 'PYTHONPATH'):
        env.pop(k, None)
    res = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__ as g; g.dryrun_multichip(8)'],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert 'dryrun_multichip ok: devices=8' in res.stdout
