# pixelrec_multimodal_tpu/ops/pairwise_mlp.py
"""Fused pairwise-MLP scoring: the full-catalog hot path as one Pallas kernel.

The headline op of BASELINE.json — score every (user, item) pair through the
prediction MLP — is HBM-bound when expressed naively: each MLP layer's
activations ([pairs, width]) round-trip through HBM between matmuls. This
module makes it compute-bound:

  1. **First-layer factorization** (concatenate fusion): the first Dense over
     ``concat(user_emb, item_block)`` splits into a per-user part
     ``user_emb @ W_u`` (computed once per user block) and a per-item part
     ``item_block @ W_i + b`` (computed ONCE per catalog). Per pair only a
     broadcast add remains — a ~2x FLOP cut on [512,256,128] heads.
  2. **BatchNorm folding**: eval-mode BN is affine, folded into the following
     Dense's kernel/bias, so the MLP collapses to pure Dense->act chains.
  3. **Pallas tiling**: a (user-tile x item-tile) grid; each kernel instance
     keeps the whole layer chain's activations in VMEM and runs the matmuls
     back-to-back on the MXU. HBM traffic per tile is O(tile edges), not
     O(pairs x width).

A pure-XLA fallback with identical math backs correctness tests and non-TPU
platforms. Replaces the reference's batch-256 python scoring loop
(/root/reference/src/inference/recommender.py:96-236).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.multimodal import activation_fn

LANE = 128
GATE_PAD = 8  # gated-fusion gate vectors pad the modality axis to this width


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fold_prediction_mlp(variables: dict, model
                        ) -> Optional[Tuple[List[np.ndarray],
                                            List[np.ndarray]]]:
    """Fold eval-mode BatchNorm into the prediction MLP's Dense kernels.

    PredictionMLP runs Dense->act->BN->Dropout per hidden layer (reference
    multimodal.py:366-386); BN after layer i is affine in eval mode,
    ``h' = a*h + c`` with a = scale/sqrt(var+eps), c = bias - mean*a, so it
    folds into layer i+1: W' = a[:,None]*W, b' = b + c @ W. Returns the
    folded (kernels, biases) lists, or None when BN has no running stats.
    """
    params = variables['params']
    stats = variables.get('batch_stats', {})
    pn = params['prediction_network']
    pn_stats = stats.get('prediction_network', {}) if stats else {}
    n_hidden = len(model.fusion_hidden_dims)

    kernels = [np.asarray(pn[f'Dense_{i}']['kernel'], np.float32)
               for i in range(n_hidden + 1)]
    biases = [np.asarray(pn[f'Dense_{i}']['bias'], np.float32)
              for i in range(n_hidden + 1)]
    for i in range(n_hidden):
        name = f'BatchNorm_{i}'
        if model.use_batch_norm and name in pn:
            if name not in pn_stats:
                # BN without running stats: cannot fold -> no fast path.
                return None
            scale = np.asarray(pn[name]['scale'], np.float32)
            bias = np.asarray(pn[name]['bias'], np.float32)
            mean = np.asarray(pn_stats[name]['mean'], np.float32)
            var = np.asarray(pn_stats[name]['var'], np.float32)
            a = scale / np.sqrt(var + 1e-5)
            c = bias - mean * a
            # (a*h + c) @ W + b  ==  h @ (a[:,None]*W) + (b + c @ W);
            # the bias correction uses the ORIGINAL kernel.
            biases[i + 1] = biases[i + 1] + c @ kernels[i + 1]
            kernels[i + 1] = a[:, None] * kernels[i + 1]
    return kernels, biases


def pad2(w: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Zero-pad a 2D matrix to [rows, cols] (lane-multiple MXU tiling)."""
    out = np.zeros((rows, cols), np.float32)
    out[:w.shape[0], :w.shape[1]] = w
    return out


def pack_mlp_chain(kernels: List[np.ndarray], biases: List[np.ndarray],
                   n_hidden: int
                   ) -> Tuple[int, jnp.ndarray,
                              List[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Lane-pad the folded MLP chain: returns (h1, padded first bias,
    [(W, b)] for layers 1..n_hidden+1 with the final layer padded to one
    lane group — only column 0 is live, see _mlp_chain)."""
    w1, b1 = kernels[0], biases[0]
    h1 = _round_up(w1.shape[1], LANE)
    padded_b1 = np.zeros(h1, np.float32)
    padded_b1[:b1.shape[0]] = b1

    layers: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    prev = h1
    for i in range(1, n_hidden + 1):
        w, b = kernels[i], biases[i]
        cols = _round_up(w.shape[1], LANE) if i < n_hidden else LANE
        wp = pad2(w, prev, cols)
        bp = np.zeros(cols, np.float32)
        bp[:b.shape[0]] = b
        layers.append((jnp.asarray(wp), jnp.asarray(bp)))
        prev = cols
    return h1, jnp.asarray(padded_b1), layers


def build_factorized_head(variables: dict, model) -> Optional[dict]:
    """Build the factorized, BN-folded head from a full variables dict
    ({'params': ..., 'batch_stats': ...}).

    Two fusion types factorize exactly:

      * ``concatenate`` — the first Dense over ``concat(user, item...)``
        splits by rows into a user part and an item part (module docstring).
      * ``gated`` — the gate logits ``concat @ W_g`` split the same way
        (user rows + item rows, pairwise ADD then softmax over the modality
        axis), and the first Dense distributes over the softmax-weighted sum:
        ``fused @ W1 = sum_m g_m * (feat_m @ W1)`` — every ``feat_m @ W1``
        is user- or item-side precomputable. Per pair only the M-way softmax
        and an (M+1)-term weighted h1-vector sum remain (VPU work).

    ``attention`` fusion does not factorize (LayerNorm over pair-dependent
    attention outputs sits before the first Dense) and returns None.
    """
    if model.fusion_type not in ('concatenate', 'gated'):
        return None
    folded = fold_prediction_mlp(variables, model)
    if folded is None:
        return None
    kernels, biases = folded
    params = variables['params']
    n_hidden = len(model.fusion_hidden_dims)
    d = model.embedding_dim

    w1, b1 = kernels[0], biases[0]
    h1, padded_b1, layers = pack_mlp_chain(kernels, biases, n_hidden)

    head = {
        'fusion': model.fusion_type,
        'b1': padded_b1,
        'layers': layers,
        'activation': model.fusion_activation,
        'final_activation': model.final_activation,
    }

    if model.fusion_type == 'concatenate':
        w_user, w_item = w1[:d], w1[d:]
        head['w_user'] = jnp.asarray(pad2(w_user, _round_up(d, LANE), h1)[:d])
        head['w_item'] = jnp.asarray(
            pad2(w_item, _round_up(w_item.shape[0], LANE),
                 h1)[:w_item.shape[0]])
        # b1 folds into the per-item first-layer table (compute_item_first),
        # saving one [TB, TC, h1] VPU add per pair in the kernel — the
        # assembly adds are the binding term at the flagship geometry
        # (~2.5K VPU element-ops/pair vs the 484M-pairs/s MXU bound).
        head['b1_folded'] = True
        return head

    # gated: W1 applies to the D-dim fused vector; the gating Dense splits
    # into user rows + per-item-modality rows (models/layers.py:86-96, fusion
    # order user first — multimodal.py:228-239). b1 folds into EVERY
    # precomputed first-layer part (softmax gates sum to 1, so
    # sum_m g_m*(part_m + b1) == fused@W1 + b1), dropping the per-pair
    # bias add from the kernel's VPU-bound assembly loop.
    head['b1_folded'] = True
    gating = params['fusion_layer']['gating']
    wg = np.asarray(gating['kernel'], np.float32)   # [M*d, M]
    bg = np.asarray(gating['bias'], np.float32)     # [M]
    n_mod = wg.shape[1]
    n_item_mods = n_mod - 1
    head['w_fused'] = jnp.asarray(pad2(w1, _round_up(d, LANE), h1)[:d])
    head['wg_user'] = jnp.asarray(wg[:d])                       # [d, M]
    head['wg_item'] = jnp.asarray(
        wg[d:].reshape(n_item_mods, d, n_mod))                  # [Mi, d, M]
    head['bg'] = jnp.asarray(bg)
    head['n_item_mods'] = n_item_mods
    head['h1'] = h1
    return head


def _apply_final(x, final_activation: str):
    if final_activation == 'sigmoid':
        return jax.nn.sigmoid(x)
    if final_activation == 'tanh':
        return jnp.tanh(x)
    return x


# --------------------------------------------------------------- int8 head
# The v5e MXU runs int8 x int8 -> int32 at ~2x its bf16 rate, and the fused
# concat scorer is MXU-bound (440.8M pairs/s = 144 TFLOPS bf16 ~ the
# measured peak). Quantizing the hidden Dense chain lifts that ceiling:
# activations get per-layer AFFINE int8 quantization (calibrated [mn, mx]
# range; the zero-point correction folds into the bias since
# x ~ (xq + 128)*a + mn  =>  x@W = a*(xq@Wq)*wscale + [128*a*wscale*colsum(Wq)
# + mn*colsum(W) + b], all per-column constants), weights get symmetric
# per-column scales. Opt-in via CatalogScorer(precision='int8'); scores are
# approximate (documented top-K agreement in BASELINE.md), never a default.

# Measured int8 flip point (BASELINE.md int8 section): the hidden chain
# in int8 is 1.20x bf16 on the MXU, but the per-pair [rows, h1] input
# quantize is pure VPU cost proportional to h1. Below this many hidden-
# chain MXU FLOPs per first-layer lane, the quantize costs more than the
# halved MXU time saves — the flagship [512,256,128] head sits at 640 and
# measured 0.89x e2e. Threshold from the round-5 wider-head sweep
# (scripts/bench_int8.py --hidden ...).
INT8_MIN_CHAIN_FLOPS_PER_LANE = 1000


def int8_chain_flops_per_lane(head: dict) -> float:
    """Hidden-chain MXU FLOPs per pair divided by the first-layer width —
    the decision metric of the auto-precision heuristic. (The concat head
    does not carry an explicit 'h1'; the padded first bias has it.)"""
    chain = sum(2 * w.shape[0] * w.shape[1] for w, _ in head['layers'][:-1])
    h1 = head.get('h1') or head['b1'].shape[0]
    return chain / max(h1, 1)


def quantize_mlp_chain(head: dict, ranges: Sequence[Tuple[float, float]]
                       ) -> List[dict]:
    """Quantize the hidden layers of a packed head to int8.

    ranges: calibrated (min, max) of each hidden layer's INPUT activations
    (from calibrate_head_ranges). Returns one dict per hidden matmul:
    wq int8 [in, out], and a packed f32 param block [3, out]:
      row 0 = out_scale (a * wscale, per column)
      row 1 = bias_eff  (bias + zero-point and offset corrections)
      row 2 = [inv_a, off, 0, ...] scalars for the in-kernel quantize
              (xq = floor(x*inv_a + off), off pre-folding the zero
              point and round-half-up: -mn/a + 0.5 - 128).
    """
    qlayers: List[dict] = []
    n_hidden = len(head['layers']) - 1
    for j in range(n_hidden):
        w, b = head['layers'][j]
        w = np.asarray(w, np.float32)
        b = np.asarray(b, np.float32)
        mn, mx = (float(ranges[j][0]), float(ranges[j][1]))
        a = max(mx - mn, 1e-12) / 255.0
        wscale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
        wq = np.clip(np.round(w / wscale[None, :]), -127, 127)
        out_scale = (a * wscale).astype(np.float32)
        bias_eff = (b + out_scale * 128.0 * wq.sum(axis=0)
                    + mn * w.sum(axis=0)).astype(np.float32)
        params = np.zeros((3, w.shape[1]), np.float32)
        params[0] = out_scale
        params[1] = bias_eff
        params[2, 0] = 1.0 / a
        params[2, 1] = -mn / a + 0.5 - 128.0  # zero-point + rounding folded
        qlayers.append({'wq': jnp.asarray(wq.astype(np.int8)),
                        'params': jnp.asarray(params)})
    return qlayers


def _chain_input_ranges(head: dict, x: jnp.ndarray):
    """Traced (min, max) of each hidden layer's input through the exact
    f32 chain the kernel runs; x = assembled first-layer activations."""
    act = activation_fn(head['activation'])
    out = []
    for j in range(len(head['layers']) - 1):
        out.append((jnp.min(x), jnp.max(x)))
        w, b = head['layers'][j]
        x = act(x @ w + b)
    return out


def calibrate_head_ranges(head: dict, user_first: jnp.ndarray,
                          item_first: jnp.ndarray
                          ) -> List[Tuple[float, float]]:
    """Per-hidden-layer input-activation (min, max) over a calibration
    sample of pairs, through the exact f32 chain the kernel runs."""
    act = activation_fn(head['activation'])
    B, C = user_first.shape[0], item_first.shape[0]

    @jax.jit
    def ranges(uf, itf):
        x = uf[:, None, :] + itf[None, :, :]
        if not head.get('b1_folded'):
            x = x + head['b1']
        return _chain_input_ranges(head, act(x).reshape(B * C, -1))

    return [(float(mn), float(mx))
            for mn, mx in ranges(user_first, item_first)]


def calibrate_head_ranges_gated(head: dict, user_side, item_side
                                ) -> List[Tuple[float, float]]:
    """Gated-fusion calibration: ranges through the gated assembly
    (softmax-weighted first-layer parts) + the chain."""
    act = activation_fn(head['activation'])
    uf, ug = user_side
    itf, ig = item_side
    B, C = uf.shape[0], itf.shape[0]
    n_mod = head['n_item_mods'] + 1
    h1 = head['h1']

    @jax.jit
    def ranges(uf, ug, itf, ig):
        logits = ug[:, None, :n_mod] + ig[None, :, :n_mod]
        g = jax.nn.softmax(logits, axis=-1)
        x = g[:, :, 0, None] * uf[:, None, :]
        for m in range(head['n_item_mods']):
            x = x + g[:, :, m + 1, None] * itf[None, :,
                                               m * h1:(m + 1) * h1]
        if not head.get('b1_folded'):
            x = x + head['b1']
        return _chain_input_ranges(head, act(x).reshape(B * C, h1))

    return [(float(mn), float(mx)) for mn, mx in ranges(uf, ug, itf, ig)]


def _quantize_rows(x, inv_a, off):
    """f32 [rows, w] -> affine int8 (zero point -128).

    The -128 shift and the round-half-up 0.5 are pre-folded into ``off``
    (quantize_mlp_chain), so the per-element cost is mul + add + floor +
    clip + cast — this runs per pair per activation element, the int8
    path's entire VPU overhead."""
    q = jnp.floor(x * inv_a + off)
    return jnp.clip(q, -128, 127).astype(jnp.int8)


def _mlp_chain_int8(x, q_refs, w_last_col, b_last0, n_hidden, act,
                    final_activation):
    """int8 hidden Dense chain + f32 final VPU reduce on a [rows, h1]
    block. q_refs alternates (wq_ref, params_ref) per hidden layer."""
    for j in range(n_hidden):
        wq = q_refs[2 * j][:]
        params = q_refs[2 * j + 1][:]
        inv_a = params[2, 0]
        off = params[2, 1]
        xq = _quantize_rows(x.astype(jnp.float32), inv_a, off)
        acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
        x = act(acc.astype(jnp.float32) * params[0][None, :]
                + params[1][None, :])
    s = jnp.sum(x * w_last_col, axis=1) + b_last0
    return _apply_final(s, final_activation)


def _xla_chain_scores(head: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Dense chain on assembled first-layer activations [rows, h1] ->
    [rows] scores, honoring head['qlayers'] (int8 mode) with math
    identical to the Pallas kernel's."""
    act = activation_fn(head['activation'])
    qlayers = head.get('qlayers')
    if qlayers is not None:
        q_refs = []
        for q in qlayers:
            q_refs.extend([q['wq'], q['params']])
        w_last, b_last = head['layers'][-1]
        return _mlp_chain_int8(
            x, q_refs, w_last[:, 0].astype(jnp.float32),
            b_last[0].astype(jnp.float32), len(qlayers), act,
            head['final_activation'])
    for i, (w, b) in enumerate(head['layers']):
        x = x @ w + b
        if i < len(head['layers']) - 1:
            x = act(x)
    return _apply_final(x[:, 0], head['final_activation'])


def xla_pairwise_scores(head: dict, user_first: jnp.ndarray,
                        item_first: jnp.ndarray) -> jnp.ndarray:
    """Reference implementation: [B,h1] x [C,h1] -> [B,C] scores.

    Honors head['qlayers'] (int8 mode) with math identical to the Pallas
    kernel's, so kernel-vs-fallback tests cover the quantized path too.
    """
    act = activation_fn(head['activation'])
    B, C = user_first.shape[0], item_first.shape[0]
    h = user_first[:, None, :] + item_first[None, :, :]
    if not head.get('b1_folded'):
        h = h + head['b1']
    x = act(h).reshape(B * C, -1)
    return _xla_chain_scores(head, x).reshape(B, C)


def xla_candidate_scores(head: dict, user_first: jnp.ndarray,
                         item_first_rows: jnp.ndarray) -> jnp.ndarray:
    """Per-user candidate scoring: [B,h1] x [B,C,h1] -> [B,C].

    Same math as xla_pairwise_scores but each user pairs only with its
    own gathered candidate rows (the evaluator's sampled-negative path,
    reference evaluate.py candidate lists)."""
    act = activation_fn(head['activation'])
    B, C = item_first_rows.shape[:2]
    h = user_first[:, None, :] + item_first_rows
    if not head.get('b1_folded'):
        h = h + head['b1']
    x = act(h).reshape(B * C, -1)
    return _xla_chain_scores(head, x).reshape(B, C)


def _mlp_chain(x, layer_refs, n_layers, act, final_activation, compute_dtype):
    """Hidden Dense chain + final-layer VPU reduce on a [rows, h1] block."""
    for i in range(n_layers - 1):
        w = layer_refs[2 * i][:].astype(compute_dtype)
        b = layer_refs[2 * i + 1][:].astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32)
        x = act((x + b).astype(compute_dtype))
    # Final layer has ONE live output column (padded to a full lane for
    # storage): a VPU multiply-reduce against that column costs 2*width
    # FLOPs/pair instead of a 2*width*LANE MXU matmul that discards 127
    # of 128 columns.
    w_last = layer_refs[2 * (n_layers - 1)][:].astype(compute_dtype)
    b_last = layer_refs[2 * (n_layers - 1) + 1][:]
    s = jnp.sum(x.astype(jnp.float32) * w_last[:, 0].astype(jnp.float32),
                axis=1) + b_last[0].astype(jnp.float32)
    return _apply_final(s, final_activation)


def _pairwise_kernel(user_ref, item_ref, b1_ref, *layer_refs,
                     out_ref, n_layers, activation, final_activation,
                     compute_dtype, n_quant=0, b1_folded=False):
    """Pallas kernel: one (user-tile, item-tile) block of the score matrix.

    All intermediates live in VMEM; matmuls hit the MXU back-to-back.
    n_quant > 0 routes the hidden chain through int8 MXU dots
    (layer_refs = n_quant x (wq, params) then the f32 final layer).
    b1_folded: the first-layer bias lives in the item table — the
    assembly is one broadcast add + act (the kernel's VPU-binding term).
    """
    act = activation_fn(activation)
    u = user_ref[:].astype(compute_dtype)      # [TB, h1]
    it = item_ref[:].astype(compute_dtype)     # [TC, h1]
    TB, TC = u.shape[0], it.shape[0]

    x = u[:, None, :] + it[None, :, :]
    if not b1_folded:
        x = x + b1_ref[:].astype(compute_dtype)[None, None, :]
    x = act(x).reshape(TB * TC, -1)
    if n_quant:
        w_last = layer_refs[2 * n_quant][:]
        b_last = layer_refs[2 * n_quant + 1][:]
        scores = _mlp_chain_int8(
            x, layer_refs, w_last[:, 0].astype(jnp.float32),
            b_last[0].astype(jnp.float32), n_quant, act, final_activation)
    else:
        scores = _mlp_chain(x, layer_refs, n_layers, act, final_activation,
                            compute_dtype)
    out_ref[:] = scores.reshape(TB, TC)


def _gated_pairwise_kernel(user_first_ref, user_gates_ref, item_first_ref,
                           item_gatesT_ref, b1_ref, *layer_refs,
                           out_ref, x_scr, n_layers, n_item_mods, h1,
                           activation, final_activation, compute_dtype,
                           b1_folded=False, n_quant=0):
    """Gated-fusion pair scoring: softmax gates from pairwise-added logit
    planes, weighted sum of precomputed first-layer parts, then the Dense
    chain.

    Gate math stays on fully-packed 2D [TB, TC] f32 planes, one per
    modality (M <= 6, a static python loop) — NEVER on a [TB, TC, M]
    stack: Mosaic pads the minor (lane) dim to 128, so the stacked form
    costs 16x its logical VMEM on every softmax temporary (the first
    version of this kernel did that and was VMEM-capped at 16-user
    tiles). Item gate logits arrive pre-transposed ([GATE_PAD, TC]) so
    each modality row is a ready [1, TC] lane vector.
    """
    act = activation_fn(activation)
    # Gate math stays f32 (Mosaic lane-broadcasts from width 1 are 32-bit
    # only, and the VPU computes elementwise math at f32 rate regardless).
    # Everything below uses static lax.slice + broadcasts — integer fancy
    # indexing (``ug[:, m]``) lowers to ``gather``, which Mosaic rejects.
    uf = user_first_ref[:].astype(jnp.float32)     # [TB, h1]
    ug = user_gates_ref[:]                         # [TB, GATE_PAD] f32
    itf = item_first_ref[:].astype(jnp.float32)    # [TC, Mi*h1]
    igT = item_gatesT_ref[:]                       # [GATE_PAD, TC] f32
    b1 = b1_ref[:].astype(jnp.float32)
    TB, TC = uf.shape[0], itf.shape[0]
    n_mod = n_item_mods + 1

    # Softmax over the modality axis as elementwise plane math (padding
    # columns of GATE_PAD never become planes, so no masking needed).
    planes = [
        jnp.broadcast_to(jax.lax.slice(ug, (0, m), (TB, m + 1)), (TB, TC))
        + jnp.broadcast_to(jax.lax.slice(igT, (m, 0), (m + 1, TC)), (TB, TC))
        for m in range(n_mod)]
    mx = planes[0]
    for p in planes[1:]:
        mx = jnp.maximum(mx, p)
    es = [jnp.exp(p - mx) for p in planes]
    tot = es[0]
    for e in es[1:]:
        tot = tot + e
    inv = 1.0 / tot
    gates = [e * inv for e in es]                  # n_mod [TB, TC] planes

    def gate(m):  # [TB, TC, 1] for lane-broadcast multiplies
        return gates[m][:, :, None]

    # Build the first-layer activation one 128-lane h1-slice at a time,
    # written straight into the bf16 ``x_scr`` VMEM scratch: only one f32
    # [TB, TC, LANE] accumulator is live per step (a full f32 [TB, TC, h1]
    # block — or h1/LANE of them held live by a concatenate — blows the
    # 16MB scoped-VMEM limit at useful tiles).
    for blk in range(h1 // LANE):
        lo = blk * LANE
        acc = gate(0) * uf[:, lo:lo + LANE][:, None, :]
        for m in range(n_item_mods):
            off = m * h1 + lo
            acc = acc + gate(m + 1) * itf[:, off:off + LANE][None, :, :]
        if not b1_folded:
            acc = acc + b1[lo:lo + LANE][None, None, :]
        x_scr[:, lo:lo + LANE] = act(
            acc).astype(compute_dtype).reshape(TB * TC, LANE)
    if n_quant:
        w_last = layer_refs[2 * n_quant][:]
        b_last = layer_refs[2 * n_quant + 1][:]
        scores = _mlp_chain_int8(
            x_scr[:], layer_refs, w_last[:, 0].astype(jnp.float32),
            b_last[0].astype(jnp.float32), n_quant, act, final_activation)
    else:
        scores = _mlp_chain(x_scr[:], layer_refs, n_layers, act,
                            final_activation, compute_dtype)
    out_ref[:] = scores.reshape(TB, TC)


def pallas_pairwise_scores(head: dict, user_first: jnp.ndarray,
                           item_first: jnp.ndarray,
                           tile_users: int = 16, tile_items: int = 128,
                           compute_dtype=jnp.bfloat16,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused [B,h1] x [C,h1] -> [B,C] pair scoring on TPU.

    B must be a multiple of tile_users and C of tile_items (callers pad).
    """
    from jax.experimental import pallas as pl

    B, h1 = user_first.shape
    C = item_first.shape[0]
    n_layers = len(head['layers'])
    grid = (B // tile_users, C // tile_items)

    layer_specs = []
    layer_args = []
    qlayers = head.get('qlayers')
    if qlayers is not None:
        # int8 chain: (wq, params) per hidden layer, then the f32 final.
        for q in qlayers:
            layer_specs.append(
                pl.BlockSpec(q['wq'].shape, lambda i, j: (0, 0)))
            layer_specs.append(
                pl.BlockSpec(q['params'].shape, lambda i, j: (0, 0)))
            layer_args.extend([q['wq'], q['params']])
        w, b = head['layers'][-1]
        layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
        layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
        layer_args.extend([w, b])
    else:
        for w, b in head['layers']:
            layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
            layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
            layer_args.extend([w, b])

    kernel = functools.partial(
        _pairwise_kernel, n_layers=n_layers,
        activation=head['activation'],
        final_activation=head['final_activation'],
        compute_dtype=compute_dtype,
        n_quant=len(qlayers) if qlayers is not None else 0,
        b1_folded=bool(head.get('b1_folded')))

    def wrapped(user_ref, item_ref, b1_ref, *rest):
        *layer_refs, out_ref = rest
        kernel(user_ref, item_ref, b1_ref, *layer_refs, out_ref=out_ref)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_users, h1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_items, h1), lambda i, j: (j, 0)),
            pl.BlockSpec((h1,), lambda i, j: (0,)),
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((tile_users, tile_items),
                               lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        interpret=interpret,
    )(user_first, item_first, head['b1'], *layer_args)


def xla_pairwise_scores_gated(head: dict, user_first: jnp.ndarray,
                              user_gates: jnp.ndarray,
                              item_first: jnp.ndarray,
                              item_gates: jnp.ndarray) -> jnp.ndarray:
    """Reference math for the gated fast path: [B,...] x [C,...] -> [B,C]."""
    act = activation_fn(head['activation'])
    n_mod = head['n_item_mods'] + 1
    h1 = head['h1']
    B, C = user_first.shape[0], item_first.shape[0]
    logits = user_gates[:, None, :n_mod] + item_gates[None, :, :n_mod]
    g = jax.nn.softmax(logits, axis=-1)                     # [B, C, M]
    x = g[:, :, 0, None] * user_first[:, None, :]
    for m in range(head['n_item_mods']):
        x = x + g[:, :, m + 1, None] * item_first[None, :, m * h1:(m + 1) * h1]
    if not head.get('b1_folded'):
        x = x + head['b1']
    x = act(x).reshape(B * C, h1)
    return _xla_chain_scores(head, x).reshape(B, C)


def xla_candidate_scores_gated(head: dict, user_side,
                               item_first_rows: jnp.ndarray,
                               item_gates_rows: jnp.ndarray) -> jnp.ndarray:
    """Gated per-user candidate scoring: each user pairs with its own
    gathered candidate rows ([B, C, Mi*h1] / [B, C, GATE_PAD])."""
    act = activation_fn(head['activation'])
    user_first, user_gates = user_side
    n_mod = head['n_item_mods'] + 1
    h1 = head['h1']
    B, C = item_first_rows.shape[:2]
    logits = user_gates[:, None, :n_mod] + item_gates_rows[:, :, :n_mod]
    g = jax.nn.softmax(logits, axis=-1)                     # [B, C, M]
    x = g[:, :, 0, None] * user_first[:, None, :]
    for m in range(head['n_item_mods']):
        x = x + g[:, :, m + 1, None] * item_first_rows[:, :,
                                                       m * h1:(m + 1) * h1]
    if not head.get('b1_folded'):
        x = x + head['b1']
    x = act(x).reshape(B * C, h1)
    return _xla_chain_scores(head, x).reshape(B, C)


def pallas_pairwise_scores_gated(head: dict, user_first: jnp.ndarray,
                                 user_gates: jnp.ndarray,
                                 item_first: jnp.ndarray,
                                 item_gates: jnp.ndarray,
                                 tile_users: int = 16, tile_items: int = 128,
                                 compute_dtype=jnp.bfloat16,
                                 interpret: bool = False) -> jnp.ndarray:
    """Fused gated-fusion pair scoring on TPU.

    user_first [B, h1], user_gates [B, GW], item_first [C, Mi*h1],
    item_gates [C, GW]; B % tile_users == 0 and C % tile_items == 0.
    """
    from jax.experimental import pallas as pl

    B, h1 = user_first.shape
    C = item_first.shape[0]
    gw = user_gates.shape[1]
    n_layers = len(head['layers'])
    grid = (B // tile_users, C // tile_items)
    # Item gate logits as lane vectors ([GATE_PAD, C]): one XLA transpose
    # per chunk, so each kernel row broadcasts over users transpose-free.
    item_gatesT = item_gates.T

    layer_specs = []
    layer_args = []
    qlayers = head.get('qlayers')
    if qlayers is not None:
        for q in qlayers:
            layer_specs.append(
                pl.BlockSpec(q['wq'].shape, lambda i, j: (0, 0)))
            layer_specs.append(
                pl.BlockSpec(q['params'].shape, lambda i, j: (0, 0)))
            layer_args.extend([q['wq'], q['params']])
        w, b = head['layers'][-1]
        layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
        layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
        layer_args.extend([w, b])
    else:
        for w, b in head['layers']:
            layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
            layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
            layer_args.extend([w, b])

    kernel = functools.partial(
        _gated_pairwise_kernel, n_layers=n_layers,
        n_item_mods=head['n_item_mods'], h1=head['h1'],
        activation=head['activation'],
        final_activation=head['final_activation'],
        compute_dtype=compute_dtype,
        b1_folded=bool(head.get('b1_folded')),
        n_quant=len(qlayers) if qlayers is not None else 0)

    def wrapped(uf_ref, ug_ref, if_ref, ig_ref, b1_ref, *rest):
        *layer_refs, out_ref, x_scr = rest
        kernel(uf_ref, ug_ref, if_ref, ig_ref, b1_ref, *layer_refs,
               out_ref=out_ref, x_scr=x_scr)

    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_users, h1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_users, gw), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_items, item_first.shape[1]),
                         lambda i, j: (j, 0)),
            pl.BlockSpec((gw, tile_items), lambda i, j: (0, j)),
            pl.BlockSpec((h1,), lambda i, j: (0,)),
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((tile_users, tile_items),
                               lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_users * tile_items, h1), compute_dtype),
        ],
        interpret=interpret,
    )(user_first, user_gates, item_first, item_gatesT, head['b1'],
      *layer_args)


# ------------------------------------------------- factored gated kernel
# Experiment (VERDICT r4 #5): the gated kernel's binding term is the
# first-layer ASSEMBLY — per pair, Mi+1 gate-weighted h1-wide multiply-adds
# on the VPU (~4.1k element-ops/pair; BASELINE.md gated roofline). The
# softmax gate factorizes per side:
#     g_m = exp(ug_m + ig_m) / Z = a_m[user] * b_m[item] / Z,
#     a = exp(ug - max(ug)),  b = exp(ig - max(ig)),  Z = sum_m a_m b_m
# (the per-side max subtractions cancel in the ratio), so the item part of
# the assembly becomes a CONTRACTION of a per-user coefficient row against
# catalog-precomputed b_m-scaled first-layer tables:
#     x1 = ( a_0 b_0 * uf  +  a[1:] @ T[item] ) / Z,   T[m] = b_m * if_m
# — one [TB, GATE_PAD] x [GATE_PAD, TC*LANE] MXU matmul per lane block
# instead of Mi VPU multiply-adds, cutting the per-pair VPU work to
# ~2 h1-wide ops (p0*uf add + /Z scale) + ~10 [TB,TC] plane ops (vs the
# exact kernel's ~29 softmax plane ops). Numerics: products of per-side
# exps differ from the pairwise exp by f32 ulps; Z >= exp(-per-side logit
# range) so the 1e-30 floor never binds for trained gate Denses. The
# coefficient/table matmul runs in T's dtype (bf16 default — the MLP chain
# is bf16 anyway; pass f32 tables to isolate quantization).


def factor_gated_user(head: dict, user_first: jnp.ndarray,
                      user_gates: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
    """(user_first, a [B, GATE_PAD]) — exp'd max-subtracted user gate
    coefficients; padding slots are ZERO so they drop out of Z and the
    table contraction."""
    n_mod = head['n_item_mods'] + 1
    ug = user_gates[:, :n_mod].astype(jnp.float32)
    a = jnp.exp(ug - jnp.max(ug, axis=1, keepdims=True))
    return user_first, _pad_gates(a)


def factor_gated_tables(head: dict, item_first: jnp.ndarray,
                        item_gates: jnp.ndarray,
                        table_dtype=jnp.bfloat16
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-catalog factored tables from the standard gated tables.

    Returns (T4 [h1/LANE, GATE_PAD, N*LANE], igb [GATE_PAD, N]).
    T4[blk, m] holds modality (m-1)'s b_m-scaled first-layer lane block
    laid item-major (row 0 = user slot = zeros, so the kernel contracts
    the FULL coefficient row with no slicing); igb holds the exp'd
    item-side gate rows (f32 — Z wants full precision), zero on padding
    slots.
    """
    Mi = head['n_item_mods']
    n_mod = Mi + 1
    h1 = head['h1']
    N = item_first.shape[0]
    nblk = h1 // LANE
    ig = item_gates[:, :n_mod].astype(jnp.float32)
    b = jnp.exp(ig - jnp.max(ig, axis=1, keepdims=True))      # [N, n_mod]
    igb = jnp.zeros((GATE_PAD, N), jnp.float32).at[:n_mod].set(b.T)
    ifb = (item_first.reshape(N, Mi, nblk, LANE)
           * b[:, 1:, None, None]).astype(table_dtype)        # [N,Mi,blk,L]
    T4 = jnp.zeros((nblk, GATE_PAD, N * LANE), table_dtype)
    T4 = T4.at[:, 1:n_mod].set(
        ifb.transpose(2, 1, 0, 3).reshape(nblk, Mi, N * LANE))
    return T4, igb


def _gated_factored_kernel(uf_ref, a_ref, igb_ref, t4_ref, *layer_refs,
                           out_ref, x_scr, n_layers, n_item_mods, h1,
                           activation, final_activation, compute_dtype,
                           n_quant=0):
    """Factored gated pair scoring: plane math for Z + one small-K MXU
    matmul per lane block for the item assembly."""
    act = activation_fn(activation)
    f32 = jnp.float32
    uf = uf_ref[:].astype(f32)       # [TB, h1]
    a = a_ref[:]                     # [TB, GATE_PAD] f32
    igb = igb_ref[:]                 # [GATE_PAD, TC] f32
    TB = uf.shape[0]
    TC = igb.shape[1]
    n_mod = n_item_mods + 1

    def arow(m):
        return jnp.broadcast_to(
            jax.lax.slice(a, (0, m), (TB, m + 1)), (TB, TC))

    def brow(m):
        return jnp.broadcast_to(
            jax.lax.slice(igb, (m, 0), (m + 1, TC)), (TB, TC))

    p0 = arow(0) * brow(0)
    z = p0
    for m in range(1, n_mod):
        z = z + arow(m) * brow(m)
    inv = 1.0 / jnp.maximum(z, 1e-30)

    a_mm = a.astype(t4_ref.dtype)
    # Whole-block load is small (nblk * GATE_PAD * TC * LANE: ~1MB bf16 at
    # 128-item tiles); integer ref indexing (t4_ref[blk]) lowers through
    # jnp's gather path, which Mosaic rejects — slice the VALUE instead.
    t4 = t4_ref[:]
    nlane = t4.shape[-1]
    for blk in range(h1 // LANE):
        lo = blk * LANE
        rhs = jax.lax.slice(t4, (blk, 0, 0),
                            (blk + 1, GATE_PAD, nlane)).reshape(
            GATE_PAD, nlane)         # [GATE_PAD, TC*LANE]
        r = jax.lax.dot_general(a_mm, rhs, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        r = r.reshape(TB, TC, LANE)  # minor split, lane width preserved
        # two-step slice-then-newaxis (the [:, None, lo:lo+LANE] combined
        # form lowers through jnp's gather path — Mosaic rejects it)
        uf_blk = uf[:, lo:lo + LANE][:, None, :]
        x = (p0[:, :, None] * uf_blk + r) * inv[:, :, None]
        x_scr[:, lo:lo + LANE] = act(
            x).astype(compute_dtype).reshape(TB * TC, LANE)
    if n_quant:
        w_last = layer_refs[2 * n_quant][:]
        b_last = layer_refs[2 * n_quant + 1][:]
        scores = _mlp_chain_int8(
            x_scr[:], layer_refs, w_last[:, 0].astype(f32),
            b_last[0].astype(f32), n_quant, act, final_activation)
    else:
        scores = _mlp_chain(x_scr[:], layer_refs, n_layers, act,
                            final_activation, compute_dtype)
    out_ref[:] = scores.reshape(TB, TC)


def pallas_pairwise_scores_gated_factored(
        head: dict, user_first: jnp.ndarray, user_coefs: jnp.ndarray,
        t4: jnp.ndarray, igb: jnp.ndarray,
        tile_users: int = 32, tile_items: int = 128,
        compute_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """Fused FACTORED gated pair scoring on TPU.

    user_first [B, h1] (b1 folded), user_coefs [B, GATE_PAD]
    (factor_gated_user), t4/igb from factor_gated_tables;
    B % tile_users == 0 and N % tile_items == 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, h1 = user_first.shape
    N = igb.shape[1]
    nblk = h1 // LANE
    n_layers = len(head['layers'])
    grid = (B // tile_users, N // tile_items)

    layer_specs, layer_args = [], []
    qlayers = head.get('qlayers')
    if qlayers is not None:
        for q in qlayers:
            layer_specs.append(pl.BlockSpec(q['wq'].shape,
                                            lambda i, j: (0, 0)))
            layer_specs.append(pl.BlockSpec(q['params'].shape,
                                            lambda i, j: (0, 0)))
            layer_args.extend([q['wq'], q['params']])
        w, b = head['layers'][-1]
        layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
        layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
        layer_args.extend([w, b])
    else:
        for w, b in head['layers']:
            layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
            layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
            layer_args.extend([w, b])

    kernel = functools.partial(
        _gated_factored_kernel, n_layers=n_layers,
        n_item_mods=head['n_item_mods'], h1=h1,
        activation=head['activation'],
        final_activation=head['final_activation'],
        compute_dtype=compute_dtype,
        n_quant=len(qlayers) if qlayers is not None else 0)

    def wrapped(uf_ref, a_ref, igb_ref, t4_ref, *rest):
        *layer_refs, out_ref, x_scr = rest
        kernel(uf_ref, a_ref, igb_ref, t4_ref, *layer_refs,
               out_ref=out_ref, x_scr=x_scr)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_users, h1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_users, GATE_PAD), lambda i, j: (i, 0)),
            pl.BlockSpec((GATE_PAD, tile_items), lambda i, j: (0, j)),
            pl.BlockSpec((nblk, GATE_PAD, tile_items * LANE),
                         lambda i, j: (0, 0, j)),
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((tile_users, tile_items),
                               lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_users * tile_items, h1), compute_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(user_first, user_coefs, igb, t4, *layer_args)


def compute_item_first(head: dict, item_flat: jnp.ndarray) -> jnp.ndarray:
    """Per-item first-layer part, computed once per catalog:
    item_flat [N, D_item] @ W_item + b1 (the bias folds in here so the
    pair kernel's assembly is one add + act instead of two adds + act)."""
    return item_flat.astype(jnp.float32) @ head['w_item'] + head['b1']


def compute_user_first(head: dict, user_emb: jnp.ndarray) -> jnp.ndarray:
    """Per-user first-layer part: user_emb [B, d] @ W_user -> [B, h1]."""
    return user_emb.astype(jnp.float32) @ head['w_user']


def _pad_gates(g: jnp.ndarray) -> jnp.ndarray:
    """Pad the modality axis to GATE_PAD sublane width. The kernel block
    covers the full minor dim (block dim == array dim, so no 128-lane
    constraint) and masks the padding lanes out of the softmax."""
    return jnp.zeros((g.shape[0], GATE_PAD),
                     jnp.float32).at[:, :g.shape[1]].set(
        g.astype(jnp.float32))


def compute_item_side_gated(head: dict, item_feats: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-item precompute for gated fusion, once per catalog.

    item_feats [N, Mi, D] ->
      item_first [N, Mi*h1]: each modality's ``feat @ W1`` laid side by side;
      item_gates [N, GATE_PAD]: item-side gate-logit rows (+ gate bias).
    """
    f32 = item_feats.astype(jnp.float32)
    first = jnp.einsum('nmd,dh->nmh', f32, head['w_fused'])
    first = first + head['b1'][None, None, :]  # b1_folded (softmax sums to 1)
    n = first.shape[0]
    gates = jnp.einsum('nmd,mdg->ng', f32, head['wg_item']) + head['bg']
    return first.reshape(n, -1), _pad_gates(gates)


def compute_user_side_gated(head: dict, user_emb: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-user precompute for gated fusion: (user_first [B, h1],
    user_gates [B, GATE_PAD]). b1 folds in (b1_folded)."""
    f32 = user_emb.astype(jnp.float32)
    return (f32 @ head['w_fused'] + head['b1'],
            _pad_gates(f32 @ head['wg_user']))
