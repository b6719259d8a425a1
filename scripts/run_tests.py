#!/usr/bin/env python
"""Test runner.

Parity target: /root/reference/scripts/run_tests.py:20-117 — run all tests,
only unit tests, or a single module. Uses pytest (the project's runner)
instead of unittest discovery.
"""
from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_pytest(targets, extra=()):
    cmd = [sys.executable, '-m', 'pytest', '-q', *extra, *map(str, targets)]
    print('Running:', ' '.join(cmd))
    return subprocess.call(cmd, cwd=ROOT)


def main(cli_args=None):
    parser = argparse.ArgumentParser(description='Run the test suite')
    parser.add_argument('--unit', action='store_true',
                        help='Run only unit tests')
    parser.add_argument('--integration', action='store_true',
                        help='Run only integration tests')
    parser.add_argument('--test', type=str, default=None,
                        help='Run a specific test module or node id')
    parser.add_argument('--fast', action='store_true',
                        help='Skip slow (full-size encoder) tests')
    args = parser.parse_args(cli_args)

    extra = ('-m', 'not slow') if args.fast else ()
    if args.test:
        rc = run_pytest([args.test], extra)
    elif args.unit:
        rc = run_pytest([ROOT / 'tests' / 'unit'], extra)
    elif args.integration:
        rc = run_pytest([ROOT / 'tests' / 'integration'], extra)
    else:
        rc = run_pytest([ROOT / 'tests'], extra)
    sys.exit(rc)


if __name__ == '__main__':
    main()
