#!/usr/bin/env python
"""Checkpoint weight sanity inspector.

Parity target: /root/reference/scripts/inspect_checkpoint.py:4-59 — checks
key layer weights for all-zeros corruption. Takes the checkpoint path as an
argument instead of the reference's hardcoded path.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from pixelrec_multimodal_tpu.utils.checkpointing import load_checkpoint


def inspect_checkpoint_weights(checkpoint_path: str):
    path = Path(checkpoint_path)
    restored = load_checkpoint(path.parent, path.name)
    if restored is None:
        print(f"Checkpoint not found at {path}")
        return False
    params = restored['state'].get('params', {})
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    print(f"Inspecting {len(flat)} parameter arrays in {path}:\n")
    ok = True
    for key_path, arr in flat:
        name = '/'.join(str(getattr(k, 'key', k)) for k in key_path)
        arr = np.asarray(arr)
        all_zero = not np.any(arr)
        nan = not np.isfinite(arr).all()
        status = 'ALL-ZERO!' if all_zero else ('NON-FINITE!' if nan else 'ok')
        if all_zero or nan:
            ok = False
        print(f"  {name:60s} shape={str(arr.shape):18s} "
              f"|mean|={np.abs(arr).mean():.3e}  {status}")
    print(f"\nResult: {'OK' if ok else 'CORRUPTION DETECTED'}")
    return ok


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description='Inspect checkpoint weights for corruption')
    parser.add_argument('checkpoint', type=str,
                        help='Path to a checkpoint directory '
                             '(e.g. models/checkpoints/None_None/best_model)')
    args = parser.parse_args()
    sys.exit(0 if inspect_checkpoint_weights(args.checkpoint) else 1)
