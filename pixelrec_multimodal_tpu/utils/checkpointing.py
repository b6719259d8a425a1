# pixelrec_multimodal_tpu/utils/checkpointing.py
"""Checkpoint save/restore: Orbax for array state, JSON for metadata.

TPU-native equivalent of the reference's torch.save checkpoints
(/root/reference/src/training/trainer.py:625-716). The directory contract is
preserved — ``<checkpoint_dir>/<vision>_<language>/{best_model,last_model}``
plus a shared ``encoders/`` dir of pickled LabelEncoders — but each checkpoint
is a directory:

    <name>/state/        Orbax pytree of {'params','batch_stats','opt_state'}
    <name>/meta.json     epoch, best score/metric/direction, history,
                         best_metrics, trial_info, model_config

The reference's ``.pth`` filenames map to ``best_model`` / ``last_model``
directories; discovery helpers accept both spellings.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"Not JSON serializable: {type(o)}")


_CHECKPOINTER: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def _restore_numpy(state_dir: Path) -> Dict[str, Any]:
    """Restore a pytree checkpoint as host numpy arrays, ignoring the
    shardings it was saved under (platform-portable open)."""
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(state_dir).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(state_dir, restore_args=restore_args)


def normalize_checkpoint_name(filename: str) -> str:
    """'best_model.pth' -> 'best_model' (keeps reference CLI args working)."""
    for ext in ('.pth', '.ckpt', '.pt'):
        if filename.endswith(ext):
            return filename[: -len(ext)]
    return filename


def save_checkpoint(directory: str | Path, name: str,
                    state: Dict[str, Any], meta: Dict[str, Any]) -> Path:
    """Write state arrays (Orbax) + metadata (JSON) under directory/name/."""
    root = Path(directory).absolute() / normalize_checkpoint_name(name)
    root.mkdir(parents=True, exist_ok=True)
    state_dir = root / 'state'
    if state_dir.exists():
        shutil.rmtree(state_dir)
    ckptr = _checkpointer()
    ckptr.save(state_dir, state)
    ckptr.wait_until_finished()
    with open(root / 'meta.json', 'w') as f:
        json.dump(meta, f, indent=2, default=_json_default)
    return root


def load_checkpoint(directory: str | Path, name: str,
                    target_state: Optional[Dict[str, Any]] = None
                    ) -> Optional[Dict[str, Any]]:
    """Restore {'state':..., 'meta':...}; None when absent.

    ``target_state`` (a matching pytree of arrays, e.g. a freshly initialized
    TrainState's pieces) drives structure/dtype restoration; without it the
    raw saved tree is returned.
    """
    root = Path(directory).absolute() / normalize_checkpoint_name(name)
    state_dir = root / 'state'
    if not state_dir.exists():
        return None
    ckptr = _checkpointer()
    if target_state is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target_state)
        state = ckptr.restore(state_dir, abstract)
    else:
        # Targetless restore must NOT replay the saved device shardings —
        # a checkpoint written on CPU would fail to open on TPU ("Device
        # TFRT_CPU_0 was not found") and vice versa. Restore to host numpy;
        # consumers move arrays on device as jit arguments.
        state = _restore_numpy(state_dir)
    meta = {}
    meta_path = root / 'meta.json'
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return {'state': state, 'meta': meta}


def checkpoint_exists(directory: str | Path, name: str) -> bool:
    return (Path(directory).absolute() / normalize_checkpoint_name(name)
            / 'state').exists()


def find_checkpoint(base_dir: str | Path,
                    preferred: tuple = ('best_model', 'last_model')
                    ) -> Optional[Path]:
    """Locate a checkpoint directory under base_dir with fallback names
    (mirrors the reference's discovery order, evaluate.py:54-110)."""
    base = Path(base_dir)
    if not base.exists():
        return None
    for name in preferred:
        cand = base / name
        if (cand / 'state').exists():
            return cand
    # Any checkpoint directory at all.
    for cand in sorted(base.iterdir()):
        if cand.is_dir() and (cand / 'state').exists():
            return cand
    return None
