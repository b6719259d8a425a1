"""Self-proof of the tokenizer-fidelity exit harness
(scripts/verify_tokenizers.py) with a fabricated local vocab — the same
pattern that closed encoder fidelity (tests/unit/test_verify_pretrained.py).

Fabricates a WordPiece vocab, saves a REAL transformers BertTokenizer to
a local directory (no network), and drives the harness end-to-end:
live verify (pipeline adapter vs the reference's exact tokenize call),
golden record, golden verify, and golden corruption -> failure.
"""
import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / 'scripts'))

verify_tokenizers = importlib.import_module('verify_tokenizers')


@pytest.fixture(scope='module')
def vocab_dir(tmp_path_factory):
    """A real BertTokenizer saved locally from a fabricated vocab."""
    from transformers import BertTokenizer
    d = tmp_path_factory.mktemp('fabricated_tok')
    words = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]',
             'a', 'simple', 'item', 'title', 'long', 'case', 'tokens',
             'and', 'numbers', '123', 'upper', 'lower', 'mixed',
             'punctuation', '!', '?', '.', ',', '(', ')', '[', ']',
             'html', 'remnants', 'entities', '&', ';', '<', '>', 'b', '/',
             'hyphen', '-', 'ated', 'under', '_', 'scored', 'dotted',
             'words', 'unicode', 'cafe', 'naive', '##s', '##ing', '##ed',
             '##k', '4', '60', '456', '78', 'units', 'fps', 'amp']
    (d / 'vocab.txt').write_text('\n'.join(words))
    tok = BertTokenizer(str(d / 'vocab.txt'), model_max_length=512)
    out = d / 'saved'
    tok.save_pretrained(str(out))
    return str(out)


def test_live_verify_and_golden_roundtrip(vocab_dir, tmp_path, capsys):
    golden = tmp_path / 'golden.npz'
    # live verify + record (bert key overridden to the fabricated dir)
    rc = verify_tokenizers.run(['--models', 'bert',
                                '--override', f'bert={vocab_dir}',
                                '--record', str(golden)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert 'bert: OK' in out and 'bit-identical' in out
    assert golden.exists()

    # golden verify (no live HF reference call)
    rc = verify_tokenizers.run(['--models', 'bert',
                                '--override', f'bert={vocab_dir}',
                                '--golden', str(golden)])
    assert rc == 0, capsys.readouterr().out

    # corrupted golden -> FAIL
    data = dict(np.load(golden, allow_pickle=False))
    data['bert/input_ids'] = data['bert/input_ids'].copy()
    data['bert/input_ids'][0, 0] += 1
    np.savez_compressed(golden, **data)
    rc = verify_tokenizers.run(['--models', 'bert',
                                '--override', f'bert={vocab_dir}',
                                '--golden', str(golden)])
    out = capsys.readouterr().out
    assert rc == 1 and 'FAIL' in out


def test_clip_stream_override(vocab_dir, tmp_path, capsys):
    """The CLIP 77-token stream path verifies through the same harness
    (a Bert vocab standing in structurally; the real check is the
    77-token max_length + reference kwargs plumbing)."""
    rc = verify_tokenizers.run(['--models', 'clip_text',
                                '--override', f'clip_text={vocab_dir}'])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert 'clip_text: OK' in out and 'x 77 tokens' in out


def test_truncation_probe_is_exercised(vocab_dir):
    """The over-length probe really truncates (mask fully saturated at
    model_max_length for that row) — guards the truncation kwargs."""
    from transformers import AutoTokenizer
    hf = AutoTokenizer.from_pretrained(vocab_dir, local_files_only=True)
    ids, mask = verify_tokenizers._reference_encode(
        hf, [verify_tokenizers.PROBES[-1]], 512)
    assert mask.sum() == 512


def test_skip_when_no_local_files(capsys, monkeypatch):
    """Without local tokenizer files the harness reports the hash-fallback
    skip (exit 2 = still zero-egress), never a false pass."""
    rc = verify_tokenizers.run(['--models', 'sentence-bert'])
    out = capsys.readouterr().out
    if 'SKIP' in out:
        assert rc == 2
    else:  # environment unexpectedly has the real files: must verify
        assert rc == 0 and 'OK' in out
