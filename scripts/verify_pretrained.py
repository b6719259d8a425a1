#!/usr/bin/env python
"""Pretrained-weight fidelity harness: HF checkpoints -> converted towers.

The zero-egress exit plan (BASELINE.md "Encoder-level numerical parity"):
this environment has no HF hub access, so converter + architecture parity
is proven at small random-weight geometry (tests/unit/test_encoders.py)
while FULL-SIZE pretrained fidelity stays open. The day real checkpoints
arrive (a populated HF cache directory), this script closes it in one run:

    python scripts/verify_pretrained.py --hf-cache /path/to/hf_cache

For every tower of the zoo (4 vision + 4 language + CLIP text — the
dispatch surface of /root/reference/src/models/multimodal.py:207-250) it

  1. loads the HF torch model from the local cache (no network),
  2. converts the state_dict with encoders/convert.py,
  3. runs both models on fixed seeded full-geometry inputs (224px images /
     production-length token ids — DINOv2's 37->16 pos-embed interpolation
     and MPNet's relative buckets are exercised at real size), and
  4. compares the pooled features the recommender consumes
     (reference multimodal.py:388-470) plus last-hidden states.

``--record golden.npz`` additionally stores the reference (torch)
activations with an input digest, so a later environment can verify the
Flax side against recorded goldens via ``--golden golden.npz`` without
rerunning torch (e.g. goldens recorded next to the actual reference
installation). Exit codes: 0 = all verified, 1 = numerical mismatch,
2 = no checkpoints found (still zero-egress).

Runs on CPU by design — fidelity, not perf (pass --device to override).
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tolerances for full-size float32 towers (12-layer accumulation; the tiny
#-geometry tests use 2e-4, full depth and width widen the float32 spread).
DEFAULT_ATOL = 2e-3
DEFAULT_COS = 0.9999
_BATCH = 2
_SEQ = 64
_CLIP_SEQ = 32


@dataclass
class TowerSpec:
    modality: str          # 'vision' | 'language' | 'clip_text'
    key: str               # MODEL_CONFIGS key
    hf_name: str
    make_inputs: Callable[[], Tuple[np.ndarray, ...]]
    load_hf: Callable[[str], "object"]          # cache_dir -> torch model
    golden: Callable[["object"], Dict[str, np.ndarray]]
    convert: Callable[[Dict], Dict]             # state_dict -> flax params
    build: Callable[[], "object"]               # -> flax module
    apply: Callable[["object", Dict, Tuple], Dict[str, np.ndarray]]


def _image_inputs(vision_key: str, seed: int) -> Tuple[np.ndarray, ...]:
    """Seeded uint8 frames through the production normalize math
    (data/processors/image_processor.py normalize_chw) -> [B,3,224,224]."""
    from pixelrec_multimodal_tpu.data.processors.image_processor import (
        PREPROCESS_SPECS, normalize_chw)
    spec = PREPROCESS_SPECS[vision_key]
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (_BATCH, spec.crop_size, spec.crop_size, 3),
                          dtype=np.uint8)
    return (np.stack([normalize_chw(f, spec) for f in frames]),)


def _text_inputs(vocab: int, pad_id: int, seed: int,
                 seq: int = _SEQ) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    lo = max(5, pad_id + 2)
    ids = rng.integers(lo, vocab, (_BATCH, seq)).astype(np.int32)
    mask = np.ones((_BATCH, seq), np.int32)
    cut = (seq * 5) // 8
    ids[1, cut:] = pad_id
    mask[1, cut:] = 0
    return ids, mask


def _clip_text_inputs(seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """CLIP-style bos ... eos(highest-id) then zero padding."""
    rng = np.random.default_rng(seed)
    ids = np.zeros((_BATCH, _CLIP_SEQ), np.int32)
    for b, length in enumerate((_CLIP_SEQ, (_CLIP_SEQ * 5) // 8)):
        ids[b, 0] = 49406
        ids[b, 1:length - 1] = rng.integers(5, 49000, length - 2)
        ids[b, length - 1] = 49407
    mask = (ids != 0).astype(np.int32)
    return ids, mask


def _torch_pooled(model, inputs, squeeze_spatial=False,
                  text=False) -> Dict[str, np.ndarray]:
    import torch
    with torch.no_grad():
        if text:
            ids, mask = inputs
            out = model(input_ids=torch.from_numpy(ids).long(),
                        attention_mask=torch.from_numpy(mask).long())
        else:
            out = model(pixel_values=torch.from_numpy(inputs[0]))
    pooled = out.pooler_output
    if squeeze_spatial:
        pooled = pooled.squeeze(-1).squeeze(-1)
    golden = {'pooled': pooled.numpy()}
    if hasattr(out, 'last_hidden_state') and out.last_hidden_state.ndim == 3:
        golden['last_hidden'] = out.last_hidden_state.numpy()
    return golden


def _flax_outputs(module, params, inputs, text=False) -> Dict[str, np.ndarray]:
    out = module.apply({'params': params}, *inputs)
    last, pooled = out
    res = {'pooled': np.asarray(pooled)}
    if np.asarray(last).ndim == 3:
        res['last_hidden'] = np.asarray(last)
    return res


def _hf_loader(class_name: str) -> Callable[[str, str], "object"]:
    def load(hf_name: str, cache_dir: Optional[str]):
        import transformers
        cls = getattr(transformers, class_name)
        # Accept both layouts: a real HF hub cache (models--org--name/...)
        # via cache_dir, and a plain directory of `save_pretrained` outputs
        # keyed by the hub name (what an air-gapped transfer usually looks
        # like; also what the harness's own test fabricates).
        if cache_dir:
            local = os.path.join(cache_dir, hf_name)
            if os.path.isdir(local):
                return cls.from_pretrained(local,
                                           local_files_only=True).eval()
        kwargs = dict(local_files_only=True)
        if cache_dir:
            kwargs['cache_dir'] = cache_dir
        return cls.from_pretrained(hf_name, **kwargs).eval()
    return load


def build_tower_specs() -> List[TowerSpec]:
    from pixelrec_multimodal_tpu.config import MODEL_CONFIGS
    from pixelrec_multimodal_tpu.encoders import convert as C
    from pixelrec_multimodal_tpu.encoders.registry import (
        build_clip_text_encoder, build_language_encoder, build_vision_encoder)
    from pixelrec_multimodal_tpu.encoders.text_models import TEXT_CONFIGS

    specs: List[TowerSpec] = []
    vision_classes = {'clip': 'CLIPVisionModel', 'dino': 'Dinov2Model',
                      'resnet': 'ResNetModel', 'convnext': 'ConvNextModel'}
    vision_convert = {'clip': C.convert_clip_vision, 'dino': C.convert_dinov2,
                      'resnet': C.convert_resnet,
                      'convnext': C.convert_convnext}
    for i, key in enumerate(('clip', 'dino', 'resnet', 'convnext')):
        loader = _hf_loader(vision_classes[key])
        specs.append(TowerSpec(
            modality='vision', key=key,
            hf_name=MODEL_CONFIGS['vision'][key]['name'],
            make_inputs=(lambda k=key, s=100 + i: _image_inputs(k, s)),
            load_hf=(lambda cache, name=MODEL_CONFIGS['vision'][key]['name'],
                     ld=loader: ld(name, cache)),
            golden=(lambda m, k=key: _torch_pooled(
                m, _CURRENT_INPUTS, squeeze_spatial=(k == 'resnet'))),
            convert=vision_convert[key],
            build=(lambda k=key: build_vision_encoder(k)),
            apply=_flax_outputs,
        ))
    for i, key in enumerate(('bert', 'sentence-bert', 'roberta', 'mpnet')):
        cfg = TEXT_CONFIGS[key]
        specs.append(TowerSpec(
            modality='language', key=key,
            hf_name=MODEL_CONFIGS['language'][key]['name'],
            make_inputs=(lambda c=cfg, s=200 + i: _text_inputs(
                c.vocab_size, c.pad_token_id, s)),
            load_hf=(lambda cache,
                     name=MODEL_CONFIGS['language'][key]['name'],
                     ld=_hf_loader('AutoModel'): ld(name, cache)),
            golden=(lambda m: _torch_pooled(m, _CURRENT_INPUTS, text=True)),
            convert=(lambda sd, c=cfg, k=key: C.convert_bert_family(
                sd, c.num_layers, has_relative_bias=(k == 'mpnet'))),
            build=(lambda k=key: build_language_encoder(k)),
            apply=(lambda mod, p, inp: _flax_outputs(mod, p, inp, text=True)),
        ))
    specs.append(TowerSpec(
        modality='clip_text', key='clip',
        hf_name=MODEL_CONFIGS['vision']['clip']['name'],
        make_inputs=(lambda: _clip_text_inputs(300)),
        load_hf=(lambda cache,
                 name=MODEL_CONFIGS['vision']['clip']['name'],
                 ld=_hf_loader('CLIPTextModel'): ld(name, cache)),
        golden=(lambda m: _torch_pooled(m, _CURRENT_INPUTS, text=True)),
        convert=C.convert_clip_text,
        build=build_clip_text_encoder,
        apply=(lambda mod, p, inp: _flax_outputs(mod, p, inp, text=True)),
    ))
    return specs


# The golden closures need the inputs generated for the current tower; kept
# module-level so record/verify share one generation point.
_CURRENT_INPUTS: Tuple[np.ndarray, ...] = ()


def _digest(inputs: Tuple[np.ndarray, ...]) -> str:
    h = hashlib.sha256()
    for a in inputs:
        h.update(np.ascontiguousarray(a).tobytes())
        h.update(str(a.shape).encode())
    return h.hexdigest()[:16]


def _compare(name: str, ours: Dict[str, np.ndarray],
             golden: Dict[str, np.ndarray], atol: float,
             min_cos: float) -> Tuple[bool, str]:
    lines = []
    ok = True
    for k in sorted(golden):
        if k not in ours:
            continue
        a, b = ours[k].astype(np.float64), golden[k].astype(np.float64)
        if a.shape != b.shape:
            return False, f"{k}: shape {a.shape} vs golden {b.shape}"
        max_abs = float(np.max(np.abs(a - b))) if a.size else 0.0
        flat_a = a.reshape(a.shape[0], -1)
        flat_b = b.reshape(b.shape[0], -1)
        denom = (np.linalg.norm(flat_a, axis=1)
                 * np.linalg.norm(flat_b, axis=1) + 1e-12)
        cos = float(np.min((flat_a * flat_b).sum(1) / denom))
        this_ok = max_abs <= atol and cos >= min_cos
        ok = ok and this_ok
        lines.append(f"{k}: max|Δ|={max_abs:.2e} min_cos={cos:.6f} "
                     f"{'OK' if this_ok else 'FAIL'}")
    return ok, '; '.join(lines)


def run(argv=None) -> int:
    global _CURRENT_INPUTS
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--hf-cache', default=None,
                    help='HF cache directory with the checkpoints')
    ap.add_argument('--models', nargs='*', default=None,
                    help="subset like 'vision/clip language/mpnet'")
    ap.add_argument('--record', default=None,
                    help='write reference (torch) activations to this .npz')
    ap.add_argument('--golden', default=None,
                    help='verify against a recorded .npz instead of torch')
    ap.add_argument('--atol', type=float, default=DEFAULT_ATOL)
    ap.add_argument('--min-cos', type=float, default=DEFAULT_COS)
    ap.add_argument('--device', default='cpu',
                    help="jax platform (default cpu; fidelity not perf)")
    args = ap.parse_args(argv)

    # Local verification by design: forbid hub traffic entirely (the PEFT
    # adapter probe ignores local_files_only and retries DNS for ~25s/model).
    os.environ['HF_HUB_OFFLINE'] = '1'
    os.environ['TRANSFORMERS_OFFLINE'] = '1'
    if args.hf_cache:
        os.environ.setdefault('HF_HOME', args.hf_cache)
    import jax
    jax.config.update('jax_platforms', args.device)

    specs = build_tower_specs()
    if args.models:
        wanted = set(args.models)
        specs = [s for s in specs if f'{s.modality}/{s.key}' in wanted]
        missing = wanted - {f'{s.modality}/{s.key}' for s in specs}
        if missing:
            print(f"unknown towers: {sorted(missing)}", file=sys.stderr)
            return 1

    goldens_in = dict(np.load(args.golden, allow_pickle=False)) \
        if args.golden else None
    goldens_out: Dict[str, np.ndarray] = {}
    results: List[Tuple[str, str, str]] = []  # (tower, status, detail)
    n_fail = n_skip = 0

    for spec in specs:
        tower = f'{spec.modality}/{spec.key}'
        _CURRENT_INPUTS = spec.make_inputs()
        digest = _digest(_CURRENT_INPUTS)

        golden: Optional[Dict[str, np.ndarray]] = None
        hf_model = None
        if goldens_in is not None and f'{tower}/pooled' in goldens_in:
            stored = goldens_in.get(f'{tower}/__digest__')
            if stored is not None and str(np.asarray(stored)) != digest:
                results.append((tower, 'FAIL',
                                'input digest mismatch vs golden file'))
                n_fail += 1
                continue
            golden = {k.rsplit('/', 1)[1]: v for k, v in goldens_in.items()
                      if k.startswith(tower + '/')
                      and not k.endswith('__digest__')}
        try:
            hf_model = spec.load_hf(args.hf_cache)
        except Exception as e:
            if golden is None:
                results.append((tower, 'SKIP',
                                f'no local checkpoint ({type(e).__name__})'))
                n_skip += 1
                continue
            results.append((tower, 'FAIL',
                            'golden present but checkpoint unavailable for '
                            'parameter conversion'))
            n_fail += 1
            continue

        if golden is None:
            golden = spec.golden(hf_model)
        params = spec.convert(hf_model.state_dict())
        module = spec.build()
        ours = spec.apply(module, params, _CURRENT_INPUTS)
        ok, detail = _compare(tower, ours, golden, args.atol, args.min_cos)
        results.append((tower, 'OK' if ok else 'FAIL', detail))
        if not ok:
            n_fail += 1
        if args.record:
            for k, v in golden.items():
                goldens_out[f'{tower}/{k}'] = v
            goldens_out[f'{tower}/__digest__'] = np.asarray(digest)

    width = max(len(t) for t, _, _ in results) if results else 10
    for tower, status, detail in results:
        print(f"{tower:<{width}}  {status:<5} {detail}")
    if args.record and goldens_out:
        np.savez_compressed(args.record, **goldens_out)
        print(f"recorded goldens -> {args.record}")

    if n_fail:
        print(f"\n{n_fail} tower(s) FAILED numerical verification.")
        return 1
    if n_skip == len(results):
        print("\nNo local checkpoints found — still zero-egress. Populate an "
              "HF cache and rerun (see BASELINE.md 'zero-egress exit plan').")
        return 2
    print(f"\nAll {len(results) - n_skip} available tower(s) verified"
          + (f" ({n_skip} skipped, no checkpoint)." if n_skip else "."))
    return 0


if __name__ == '__main__':
    sys.exit(run())
