#!/usr/bin/env python
"""Tokenizer fidelity harness: pipeline token ids vs real HF tokenizers.

The reference tokenizes with downloaded HF AutoTokenizers
(/root/reference/src/data/processors/text_processor.py:57-82 with
``padding='max_length', truncation=True, max_length=tokenizer.
model_max_length``; the CLIP contrastive stream is fixed at 77 tokens,
/root/reference/src/data/dataset.py:296-299). In this zero-egress
environment data/tokenization.py falls back to the deterministic hash
tokenizer, so REAL-VOCAB runtime parity stays open — the sibling gap to
encoder weights (closed by scripts/verify_pretrained.py). This script
closes it the day tokenizer files are available locally:

    python scripts/verify_tokenizers.py --hf-cache /path/to/hf_cache

For every language key in MODEL_CONFIGS plus the CLIP text stream it

  1. builds the PIPELINE tokenizer (data/tokenization.get_tokenizer /
     get_clip_tokenizer — which must resolve to the HFTokenizerAdapter,
     not the hash fallback),
  2. loads the HF tokenizer directly and tokenizes a fixed probe corpus
     with the reference's exact kwargs,
  3. asserts input_ids and attention_mask are BIT-IDENTICAL, including
     truncation of over-length text, empty strings, unicode and HTML
     fragments, via both ``encode`` and ``batch_encode``.

``--record golden.npz`` stores the reference ids/masks with a corpus
digest; ``--golden golden.npz`` verifies the pipeline side against the
recording (e.g. goldens recorded next to the actual reference install).
``--override key=dir`` maps a model key to a local tokenizer directory
(used by the in-tree self-proof with a fabricated vocab —
tests/unit/test_verify_tokenizers.py). Exit codes: 0 = all verified,
1 = mismatch, 2 = no tokenizer files found (still zero-egress).
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
from typing import Dict, List, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fixed probe corpus: the text shapes the reference pipeline feeds its
# tokenizers (item titles/descriptions after offline cleaning), plus edge
# cases — empty, whitespace, unicode/emoji, HTML remnants, numerics, and
# an over-length text that must truncate at model_max_length.
PROBES: List[str] = [
    "",
    "   ",
    "A simple item title",
    "<b>HTML remnants</b> &amp; entities",
    "punctuation!!! and... ellipses?? (parentheses) [brackets]",
    "Numbers 123 456.78 and units 4k 60fps",
    "Unicode: café naïve 中文测试 \U0001f600",
    "UPPER lower MiXeD case tokens",
    "hyphen-ated under_scored dotted.words",
    ("long " * 700).strip(),   # > any model_max_length after tokenizing
]


def _digest(texts: List[str]) -> str:
    h = hashlib.blake2b(digest_size=12)
    for t in texts:
        h.update(t.encode('utf-8'))
        h.update(b'\x00')
    return h.hexdigest()


def _reference_encode(hf_tok, texts: List[str], max_length: int):
    """The reference's exact tokenization call (text_processor.py:72-78)."""
    ids = np.empty((len(texts), max_length), np.int32)
    mask = np.empty((len(texts), max_length), np.int32)
    for i, t in enumerate(texts):
        out = hf_tok(t, padding='max_length', truncation=True,
                     max_length=max_length)
        ids[i] = np.asarray(out['input_ids'], np.int32)
        mask[i] = np.asarray(out['attention_mask'], np.int32)
    return ids, mask


def _specs(overrides: Dict[str, str]):
    """(key, resolved_name_or_dir, max_length, is_clip) per tokenizer."""
    from pixelrec_multimodal_tpu.config import MODEL_CONFIGS
    from pixelrec_multimodal_tpu.data.tokenization import (
        CLIP_TEXT_MAX_LENGTH,
        MODEL_MAX_LENGTHS,
    )
    out = []
    for key in MODEL_CONFIGS['language']:
        name = overrides.get(key, MODEL_CONFIGS['language'][key]['name'])
        out.append((key, name, MODEL_MAX_LENGTHS.get(key, 512), False))
    clip_name = overrides.get('clip_text',
                              MODEL_CONFIGS['vision']['clip']['name'])
    out.append(('clip_text', clip_name, CLIP_TEXT_MAX_LENGTH, True))
    return out


def _pipeline_tokenizer(key: str, name: str, max_length: int, is_clip: bool,
                        overridden: bool):
    """The tokenizer the production pipeline would build for this key.

    Without an override this goes through get_tokenizer/get_clip_tokenizer
    verbatim. With an override (a local dir standing in for the hub name),
    language keys still go through get_tokenizer's raw-name branch; the
    CLIP stream builds the same HFTokenizerAdapter at 77 tokens.
    """
    from pixelrec_multimodal_tpu.data.tokenization import (
        HFTokenizerAdapter,
        _try_hf_tokenizer,
        get_clip_tokenizer,
        get_tokenizer,
    )
    if is_clip:
        if not overridden:
            tok = get_clip_tokenizer(allow_fallback=True)
        else:
            tok = _try_hf_tokenizer(name, max_length)
            if tok is not None:
                tok.model_max_length = max_length
        if not isinstance(tok, HFTokenizerAdapter):
            return None
        return tok
    tok = get_tokenizer(name if overridden else key, max_length=max_length)
    return tok if isinstance(tok, HFTokenizerAdapter) else None


def run(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--hf-cache', default=None,
                    help='HF cache directory with tokenizer files')
    ap.add_argument('--models', nargs='*', default=None,
                    help="subset of keys, e.g. 'sentence-bert clip_text'")
    ap.add_argument('--override', action='append', default=[],
                    metavar='KEY=DIR',
                    help='map a model key to a local tokenizer directory')
    ap.add_argument('--record', default=None,
                    help='write reference ids/masks to this .npz')
    ap.add_argument('--golden', default=None,
                    help='verify against a recorded .npz instead of the '
                         'live HF call')
    args = ap.parse_args(argv)

    os.environ['HF_HUB_OFFLINE'] = '1'
    os.environ['TRANSFORMERS_OFFLINE'] = '1'
    if args.hf_cache:
        os.environ.setdefault('HF_HOME', args.hf_cache)

    overrides = dict(kv.split('=', 1) for kv in args.override)
    specs = _specs(overrides)
    if args.models:
        wanted = set(args.models)
        specs = [s for s in specs if s[0] in wanted]
        missing = wanted - {s[0] for s in specs}
        if missing:
            print(f"unknown tokenizer keys: {sorted(missing)}",
                  file=sys.stderr)
            return 1

    digest = _digest(PROBES)
    goldens_in = dict(np.load(args.golden, allow_pickle=False)) \
        if args.golden else None
    goldens_out: Dict[str, np.ndarray] = {}
    n_fail = n_skip = n_ok = 0

    for key, name, max_length, is_clip in specs:
        ours = _pipeline_tokenizer(key, name, max_length, is_clip,
                                   overridden=key in overrides)
        if ours is None:
            print(f"{key}: SKIP (no local tokenizer files for '{name}' — "
                  f"pipeline would use the hash fallback)")
            n_skip += 1
            continue

        if goldens_in is not None:
            if f'{key}/input_ids' not in goldens_in:
                print(f"{key}: SKIP (not in golden file)")
                n_skip += 1
                continue
            stored = str(np.asarray(goldens_in[f'{key}/__digest__']))
            if stored != digest:
                print(f"{key}: FAIL (probe-corpus digest mismatch vs "
                      f"golden file)")
                n_fail += 1
                continue
            ref_ids = goldens_in[f'{key}/input_ids'].astype(np.int32)
            ref_mask = goldens_in[f'{key}/attention_mask'].astype(np.int32)
        else:
            from transformers import AutoTokenizer
            hf_tok = AutoTokenizer.from_pretrained(name,
                                                   local_files_only=True)
            ref_ids, ref_mask = _reference_encode(hf_tok, PROBES, max_length)

        # encode(): per-text path (dataset __getitem__ parity)
        ok = True
        for i, t in enumerate(PROBES):
            ids, mask = ours.encode(t, max_length)
            if not (np.array_equal(ids, ref_ids[i])
                    and np.array_equal(mask, ref_mask[i])):
                ok = False
                bad = int(np.argmax(ids != ref_ids[i])) \
                    if not np.array_equal(ids, ref_ids[i]) else -1
                print(f"{key}: FAIL probe {i} (first id mismatch at "
                      f"position {bad})")
                break
        # batch_encode(): table-packing path
        if ok:
            from pixelrec_multimodal_tpu.data.tokenization import (
                batch_encode,
            )
            batch = batch_encode(ours, PROBES, max_length)
            ok = (np.array_equal(batch['input_ids'], ref_ids)
                  and np.array_equal(batch['attention_mask'], ref_mask))
            if not ok:
                print(f"{key}: FAIL (batch_encode differs from per-text "
                      f"encode/reference)")
        if ok:
            n_used = int(ref_mask.sum())
            print(f"{key}: OK ({len(PROBES)} probes x {max_length} tokens, "
                  f"{n_used} live tokens, bit-identical)")
            n_ok += 1
            goldens_out[f'{key}/input_ids'] = ref_ids
            goldens_out[f'{key}/attention_mask'] = ref_mask
            goldens_out[f'{key}/__digest__'] = np.asarray(digest)
        else:
            n_fail += 1

    if args.record and goldens_out:
        np.savez_compressed(args.record, **goldens_out)
        print(f"recorded {len(goldens_out) // 3} tokenizer goldens -> "
              f"{args.record}")

    print(f"\nverify_tokenizers: {n_ok} ok, {n_fail} failed, "
          f"{n_skip} skipped")
    if n_fail:
        return 1
    if not n_ok:
        return 2
    return 0


if __name__ == '__main__':
    sys.exit(run())
