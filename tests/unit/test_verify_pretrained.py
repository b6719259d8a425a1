"""End-to-end test of the pretrained-fidelity harness (VERDICT r3 item 8).

Fabricates a local `save_pretrained` checkpoint (random-init HF ResNet-50 —
the hub geometry, no network) and drives scripts/verify_pretrained.py
through its full path: local load -> state_dict conversion -> dual forward
-> comparison, plus the --record/--golden round-trip that lets a later
environment verify against stored torch activations. The skip path (no
checkpoints at all) is tested fast, unmarked.

Reference anchor for what the harness certifies:
/root/reference/src/models/multimodal.py:207-250 (pretrained loading) and
:388-470 (the pooled features the recommender consumes).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from scripts import verify_pretrained as vp  # noqa: E402


def test_skip_path_exit_code():
    """With an empty cache dir every tower SKIPs -> exit 2 (zero-egress)."""
    rc = vp.run(['--hf-cache', '/nonexistent-hf-cache',
                 '--models', 'vision/resnet', 'language/bert'])
    assert rc == 2


def test_unknown_tower_rejected():
    assert vp.run(['--models', 'vision/nope']) == 1


@pytest.mark.slow
def test_resnet_full_harness_and_golden_roundtrip(tmp_path, capsys):
    """Fabricated hub-geometry checkpoint -> verified; goldens round-trip."""
    from transformers import ResNetConfig, ResNetModel
    torch.manual_seed(0)
    model = ResNetModel(ResNetConfig()).eval()
    ckpt = tmp_path / 'microsoft' / 'resnet-50'
    model.save_pretrained(ckpt, safe_serialization=False)

    golden_file = str(tmp_path / 'golden.npz')
    rc = vp.run(['--hf-cache', str(tmp_path), '--models', 'vision/resnet',
                 '--record', golden_file])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert 'vision/resnet' in out and 'OK' in out

    # Golden verify path: same checkpoint, comparison vs the stored torch
    # activations instead of a live torch forward.
    rc = vp.run(['--hf-cache', str(tmp_path), '--models', 'vision/resnet',
                 '--golden', golden_file])
    assert rc == 0, capsys.readouterr().out

    # Digest guard: corrupt the stored digest -> FAIL, not silent pass.
    data = dict(np.load(golden_file, allow_pickle=False))
    data['vision/resnet/__digest__'] = np.asarray('deadbeefdeadbeef')
    np.savez_compressed(golden_file, **data)
    rc = vp.run(['--hf-cache', str(tmp_path), '--models', 'vision/resnet',
                 '--golden', golden_file])
    assert rc == 1
    assert 'digest mismatch' in capsys.readouterr().out
