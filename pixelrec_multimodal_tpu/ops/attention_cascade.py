# pixelrec_multimodal_tpu/ops/attention_cascade.py
"""Two-stage cascaded full-catalog scoring for ATTENTION fusion.

The exact gram kernel (ops/attention_scorer.py) is structurally VPU-bound
at ~48M pairs/s — its falsification campaign (BASELINE.md) showed the
softmax-coefficient scalar machinery cannot be scheduled faster, only
algebraically reduced. This module takes the production-retrieval answer
instead: a CANDIDATE-GENERATION / RERANKING cascade.

  * **Screen** the full catalog with a cheap, mostly-factorized
    approximation: the user token's attention row (token 0 — the carrier
    of user->item personalization) is computed EXACTLY, while the item
    tokens' attention outputs are frozen to their pure item-side
    self-attention values (the ``e_u -> 0`` limit of the stream kernel's
    ``attn = (e_u*u_vo + sexp)/(e_u + dsum)`` identity), which makes
    their LayerNormed sum a per-item table (``compute_screen_tail``).
    Per-pair work drops from ~26 dp-wide combines + ~1.5k scalar planes
    (gram) to one 5-way softmax + (1 + H + Mi*H) dp-wide combines —
    the same op class as the gated kernel (~200M pairs/s).
  * **Rescore** the top-C screened candidates per user with the exact
    attention math from the precomputed tables
    (``xla_attention_candidate_scores``) and return the exact top-k of
    the rescored set.

Final scores are EXACT; the returned top-k equals the exact full-scan
top-k whenever the screen's recall@C covers it. Recall is measured, not
assumed: ``CatalogScorer.calibrate_cascade`` compares cascade output
against the exact scan on a user sample so C is chosen with a margin.
The cascade is opt-in (``top_k_cascade`` / ``--cascade``); the default
path stays the exact full scan.

Replaces the reference's batch-256 host scoring loop
(/root/reference/src/inference/recommender.py:96-106) for attention-fusion
models at catalog scale; the screen/rescore split mirrors the standard
two-tower retrieval + ranking architecture the reference's README
describes as future work.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.multimodal import activation_fn
from .attention_scorer import LN_EPS, _pad_lanes
from .pairwise_mlp import _apply_final, _mlp_chain


def compute_screen_tail(head: dict, item_side: Tuple[jnp.ndarray, ...]
                        ) -> jnp.ndarray:
    """[N, dp] per-item tail: sum_{t>0} LN(y~_t) * gamma/T with the user's
    key/value influence dropped (e_u -> 0), computed from the UNPACKED
    attention tables (it_raw, it_sexp, it_dm).

    In that limit token t's attention output is its pure item-side
    softmax mass sexp/dsum (the per-pair max subtraction cancels), so the
    whole token is per-item precomputable. The LN affine's gamma/T folds
    in here; ln_bias is applied once in the kernel.
    """
    it_raw, it_sexp, it_dm = item_side[0], item_side[5], item_side[6]
    d, dp, H, Mi = head['d'], head['dp'], head['H'], head['n_item_mods']
    T = Mi + 1
    N = it_raw.shape[0]
    raw = it_raw.reshape(N, Mi, dp)[..., :d]
    sexp = it_sexp.reshape(N, Mi, H, dp)[..., :d]
    dsum = it_dm.reshape(N, H, Mi, 2)[..., 0].transpose(0, 2, 1)  # [N,Mi,H]
    y = raw + jnp.sum(sexp / dsum[..., None], axis=2)             # [N,Mi,d]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + LN_EPS)
    tail = jnp.sum(yn, axis=1) * (head['ln_scale'] / T)           # [N, d]
    return _pad_lanes(tail, dp)


def unpack_candidate_rows(head: dict, rows: Tuple[jnp.ndarray, ...]
                          ) -> Tuple[jnp.ndarray, ...]:
    """Re-pad lane-PACKED gathered candidate rows (it_raw/it_q/it_k/it_vo;
    it_sii has no lane axis) to the kernels' dp layout. Leading dims are
    arbitrary ([B, C] gathers)."""
    d, dp = head['d'], head['dp']
    if d == dp:
        return rows
    Mi, H = head['n_item_mods'], head['H']

    def pad(a, n):
        lead = a.shape[:-1]
        x = a.reshape(lead + (n, d))
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, dp - d)])
        return x.reshape(lead + (n * dp,))

    return (pad(rows[0], Mi), pad(rows[1], Mi), pad(rows[2], Mi),
            pad(rows[3], Mi * H)) + tuple(rows[4:])


def unpack_candidate_screen_rows(head: dict, it_k: jnp.ndarray,
                                 it_vo: jnp.ndarray
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-pad lane-PACKED gathered (it_k, it_vo) candidate rows to dp —
    the token0-screen subset of ``unpack_candidate_rows`` (the funnel's
    middle stage gathers only the two tables the screen math reads)."""
    d, dp = head['d'], head['dp']
    if d == dp:
        return it_k, it_vo
    Mi, H = head['n_item_mods'], head['H']

    def pad(a, n):
        lead = a.shape[:-1]
        x = a.reshape(lead + (n, d))
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, dp - d)])
        return x.reshape(lead + (n * dp,))

    return pad(it_k, Mi), pad(it_vo, Mi * H)


# ----------------------------------------------------- additive screen tier
def compute_screen_additive_user(head: dict,
                                 user_side: Tuple[jnp.ndarray, ...]
                                 ) -> jnp.ndarray:
    """[B, h1] user-side first-layer rows for the ADDITIVE screen tier.

    The cheapest cascade screen: freeze token 0's attention output to its
    USER-only limit as well (``e_items -> 0``: the softmax mass collapses
    onto the user key, so ``attn_0h -> u_vo_h``). The whole fused vector
    then splits additively into a per-user part and the per-item screen
    tail, and because the first Dense distributes over the sum the screen
    score is exactly the CONCAT pairwise kernel's form —
    ``MLP(uf + itf)`` — which runs at the concat kernel's ~427M pairs/s
    instead of the token-0 kernel's ~69M. All user-item coupling beyond
    the MLP nonlinearity is dropped, so its recall@C is strictly weaker
    than the token-0 screen's: ``calibrate_cascade(screen='additive')``
    measures it and picks C (the exact rescore stage keeps final scores
    exact regardless). b1 folds into the user rows (b1_folded contract of
    ops/pairwise_mlp).
    """
    d, dp, H = head['d'], head['dp'], head['H']
    T = head['n_item_mods'] + 1
    u_raw, u_vo = user_side[0], user_side[3]
    B = u_raw.shape[0]
    y0 = u_raw[:, :d] + jnp.sum(u_vo.reshape(B, H, dp)[..., :d], axis=1)
    mu = jnp.mean(y0, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y0 - mu), axis=-1, keepdims=True)
    yn = (y0 - mu) * jax.lax.rsqrt(var + LN_EPS)
    u_fused = yn * (head['ln_scale'] / T) + head['ln_bias']
    return u_fused @ head['w1'][:d] + head['b1']


def compute_screen_additive_items(head: dict, it_tail: jnp.ndarray
                                  ) -> jnp.ndarray:
    """[N, h1] item-side first-layer rows: the screen tail through W1.

    ``it_tail`` is ``compute_screen_tail``'s output (gamma/T already
    folded; any lane padding beyond d is zero and W1's padded rows are
    sliced away).
    """
    d = head['d']
    return it_tail[:, :d] @ head['w1'][:d]


# ------------------------------------------------------------ XLA reference
def xla_attention_screen_scores(head: dict,
                                user_side: Tuple[jnp.ndarray, ...],
                                item_side: Tuple[jnp.ndarray, ...],
                                it_tail: jnp.ndarray) -> jnp.ndarray:
    """Screen scores [B, C]: exact token-0 attention + precomputed tail.

    Identical math to the Pallas screen kernel; used on non-TPU platforms
    and by correctness tests.
    """
    act = activation_fn(head['activation'])
    d, dp, H, dh = head['d'], head['dp'], head['H'], head['dh']
    Mi = head['n_item_mods']
    T = Mi + 1
    u_raw, u_q, _u_k, u_vo, u_suu = user_side[:5]
    it_k, it_vo = item_side[2], item_side[3]
    B, C = u_raw.shape[0], it_k.shape[0]

    uq = u_q[:, :d].reshape(B, H, dh)
    ik = it_k.reshape(C, Mi, dp)[..., :d].reshape(C, Mi, H, dh)
    s_items = jnp.einsum('bhd,cmhd->bchm', uq, ik)       # [B, C, H, Mi]
    s = jnp.concatenate(
        [jnp.broadcast_to(u_suu[:, None, :H, None], (B, C, H, 1)), s_items],
        axis=-1)                                         # keys: [user, items]
    w = jax.nn.softmax(s, axis=-1)

    vo_u = u_vo.reshape(B, H, dp)[..., :d]
    vo_i = it_vo.reshape(C, Mi, H, dp)[..., :d]
    attn = (jnp.einsum('bch,bhd->bcd', w[..., 0], vo_u)
            + jnp.einsum('bchm,cmhd->bcd', w[..., 1:], vo_i))

    y0 = u_raw[:, None, :d] + attn
    mu = jnp.mean(y0, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y0 - mu), axis=-1, keepdims=True)
    yn = (y0 - mu) * jax.lax.rsqrt(var + LN_EPS)
    fused = (yn * (head['ln_scale'] / T) + head['ln_bias']
             + it_tail[None, :, :d])

    x = act(fused.reshape(B * C, d) @ head['w1'][:d] + head['b1'])
    for i, (wl, bl) in enumerate(head['layers']):
        x = x @ wl + bl
        if i < len(head['layers']) - 1:
            x = act(x)
    return _apply_final(x[:, 0], head['final_activation']).reshape(B, C)


def xla_attention_screen_candidate_scores(
        head: dict, user_side: Tuple[jnp.ndarray, ...],
        cand_side: Tuple[jnp.ndarray, ...],
        cand_tail: jnp.ndarray) -> jnp.ndarray:
    """Token0-screen scores for per-user CANDIDATE lists: -> [B, C].

    The gathered counterpart of xla_attention_screen_scores — the middle
    stage of the 3-stage hybrid cascade (additive screen over the catalog
    -> token0 screen over its survivors -> exact rescore). cand_side
    carries gathered (it_k [B, C, Mi*dp], it_vo [B, C, Mi*H*dp]) rows;
    cand_tail the gathered screen tail [B, C, dp]. Identical math to the
    all-pairs screen at the gathered columns (unit-tested).
    """
    act = activation_fn(head['activation'])
    d, dp, H, dh = head['d'], head['dp'], head['H'], head['dh']
    Mi = head['n_item_mods']
    T = Mi + 1
    u_raw, u_q, _u_k, u_vo, u_suu = user_side[:5]
    it_k, it_vo = cand_side
    B, C = it_k.shape[:2]

    uq = u_q[:, :d].reshape(B, H, dh)
    ik = it_k.reshape(B, C, Mi, dp)[..., :d].reshape(B, C, Mi, H, dh)
    s_items = jnp.einsum('bhd,bcmhd->bchm', uq, ik)      # [B, C, H, Mi]
    s = jnp.concatenate(
        [jnp.broadcast_to(u_suu[:, None, :H, None], (B, C, H, 1)), s_items],
        axis=-1)
    w = jax.nn.softmax(s, axis=-1)

    vo_u = u_vo.reshape(B, H, dp)[..., :d]
    vo_i = it_vo.reshape(B, C, Mi, H, dp)[..., :d]
    attn = (jnp.einsum('bch,bhd->bcd', w[..., 0], vo_u)
            + jnp.einsum('bchm,bcmhd->bcd', w[..., 1:], vo_i))

    y0 = u_raw[:, None, :d] + attn
    mu = jnp.mean(y0, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y0 - mu), axis=-1, keepdims=True)
    yn = (y0 - mu) * jax.lax.rsqrt(var + LN_EPS)
    fused = (yn * (head['ln_scale'] / T) + head['ln_bias']
             + cand_tail[..., :d])

    x = act(fused.reshape(B * C, d) @ head['w1'][:d] + head['b1'])
    for i, (wl, bl) in enumerate(head['layers']):
        x = x @ wl + bl
        if i < len(head['layers']) - 1:
            x = act(x)
    return _apply_final(x[:, 0], head['final_activation']).reshape(B, C)


# ------------------------------------------------------- exact rescoring
def xla_attention_candidate_scores(head: dict,
                                   user_side: Tuple[jnp.ndarray, ...],
                                   cand_side: Tuple[jnp.ndarray, ...]
                                   ) -> jnp.ndarray:
    """EXACT attention scores for per-user candidate lists: -> [B, C].

    cand_side carries the per-item tables GATHERED per user
    ([B, C, ...] rows of it_raw/it_q/it_k/it_vo/it_sii) — the batched
    counterpart of xla_attention_scores, and the attention analogue of
    pairwise_mlp.xla_candidate_scores (reference hot path it replaces:
    /root/reference/src/evaluation/tasks.py:529-561). Identical results
    to score_from_towers in eval mode.

    PLANE-FORM implementation (round-5 rework): the original dense form
    materialized [B, C, H, T, T] logit/softmax tensors whose minor T=5
    pads to 128 TPU lanes — a 25x lane waste that measured ~0.5M pairs/s
    and made the whole cascade a net loss. Here every intermediate is a
    [B, C] plane or a [B, C, dp] lane block (the stream kernel's
    structure, ops/attention_scorer.py), so the rescore runs at the
    stream formulation's VPU rate. ``_xla_attention_candidate_scores_
    dense`` keeps the literal textbook form for cross-validation.
    """
    d, dp, H = head['d'], head['dp'], head['H']
    dh = head['dh']
    Mi = head['n_item_mods']
    T = Mi + 1
    u_raw, u_q, u_k, u_vo, u_suu = user_side[:5]
    it_raw, it_q, it_k, it_vo, it_sii = cand_side[:5]
    B, C = it_raw.shape[0], it_raw.shape[1]
    f32 = jnp.float32

    uq = u_q[:, :d].reshape(B, H, dh).astype(f32)
    uk = u_k[:, :d].reshape(B, H, dh).astype(f32)
    iq = it_q.reshape(B, C, Mi, dp)[..., :d].reshape(B, C, Mi, H, dh)
    ik = it_k.reshape(B, C, Mi, dp)[..., :d].reshape(B, C, Mi, H, dh)
    sii = it_sii.reshape(B, C, H, Mi, Mi)
    vo_u = u_vo.reshape(B, H, dp)[..., :d].astype(f32)      # [B, H, d]
    vo_i = it_vo.reshape(B, C, Mi, H, dp)[..., :d]          # [B, C, Mi, H, d]
    raw_u = u_raw[:, :d].astype(f32)
    raw_i = it_raw.reshape(B, C, Mi, dp)[..., :d]

    # attention outputs per query token, accumulated over heads as
    # [B, C, d] lane blocks; logits/softmax stay [B, C] planes.
    attn = [jnp.zeros((B, C, d), f32) for _ in range(T)]
    for h in range(H):
        # logit planes l[q][k]
        l_0 = [jnp.broadcast_to(u_suu[:, None, h], (B, C)).astype(f32)]
        l_0 += [jnp.einsum('bd,bcd->bc', uq[:, h],
                           ik[:, :, m, h]).astype(f32)
                for m in range(Mi)]
        rows = [l_0]
        for m in range(Mi):
            l_m = [jnp.einsum('bcd,bd->bc', iq[:, :, m, h],
                              uk[:, h]).astype(f32)]
            l_m += [sii[:, :, h, m, mm].astype(f32) for mm in range(Mi)]
            rows.append(l_m)
        for q in range(T):
            planes = rows[q]
            mx = planes[0]
            for p in planes[1:]:
                mx = jnp.maximum(mx, p)
            es = [jnp.exp(p - mx) for p in planes]
            tot = es[0]
            for e in es[1:]:
                tot = tot + e
            inv = 1.0 / tot
            acc = ((es[0] * inv)[:, :, None]
                   * jnp.broadcast_to(vo_u[:, None, h], (B, C, d)))
            for m in range(Mi):
                acc = acc + ((es[m + 1] * inv)[:, :, None]
                             * vo_i[:, :, m, h].astype(f32))
            attn[q] = attn[q] + acc

    fused = jnp.zeros((B, C, d), f32)
    ln_scale = head['ln_scale'].astype(f32)
    ln_bias = head['ln_bias'].astype(f32)
    for q in range(T):
        raw_q = (jnp.broadcast_to(raw_u[:, None, :], (B, C, d)) if q == 0
                 else raw_i[:, :, q - 1].astype(f32))
        y = raw_q + attn[q]
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + LN_EPS)
        fused = fused + (yn * ln_scale + ln_bias)
    fused = fused * (1.0 / T)

    act = activation_fn(head['activation'])
    x = act(fused.reshape(B * C, d) @ head['w1'][:d] + head['b1'])
    for i, (wl, bl) in enumerate(head['layers']):
        x = x @ wl + bl
        if i < len(head['layers']) - 1:
            x = act(x)
    return _apply_final(x[:, 0], head['final_activation']).reshape(B, C)


def _xla_attention_candidate_scores_dense(
        head: dict, user_side: Tuple[jnp.ndarray, ...],
        cand_side: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """The literal dense-tensor form of the candidate rescore (original
    implementation; [B, C, H, T, T] logits). Kept as the cross-check
    reference for the plane-form production path above.
    """
    act = activation_fn(head['activation'])
    d, dp, H, dh = head['d'], head['dp'], head['H'], head['dh']
    Mi = head['n_item_mods']
    T = Mi + 1
    u_raw, u_q, u_k, u_vo, u_suu = user_side[:5]
    it_raw, it_q, it_k, it_vo, it_sii = cand_side[:5]
    B, C = it_raw.shape[0], it_raw.shape[1]

    uq = u_q[:, :d].reshape(B, H, dh)
    uk = u_k[:, :d].reshape(B, H, dh)
    iq = it_q.reshape(B, C, Mi, dp)[..., :d].reshape(B, C, Mi, H, dh)
    ik = it_k.reshape(B, C, Mi, dp)[..., :d].reshape(B, C, Mi, H, dh)

    s = jnp.zeros((B, C, H, T, T), jnp.float32)
    s = s.at[:, :, :, 0, 0].set(u_suu[:, None, :H])
    s = s.at[:, :, :, 0, 1:].set(jnp.einsum('bhd,bcmhd->bchm', uq, ik))
    s = s.at[:, :, :, 1:, 0].set(jnp.einsum('bcmhd,bhd->bchm', iq, uk))
    s = s.at[:, :, :, 1:, 1:].set(
        it_sii.reshape(B, C, H, Mi, Mi))
    w = jax.nn.softmax(s, axis=-1)

    vo = jnp.concatenate([
        jnp.broadcast_to(u_vo.reshape(B, 1, 1, H, dp), (B, C, 1, H, dp)),
        it_vo.reshape(B, C, Mi, H, dp),
    ], axis=2)                                       # [B, C, T(key), H, dp]
    attn = jnp.einsum('bchqk,bckhd->bcqd', w, vo)

    raw = jnp.concatenate([
        jnp.broadcast_to(u_raw.reshape(B, 1, 1, dp), (B, C, 1, dp)),
        it_raw.reshape(B, C, Mi, dp),
    ], axis=2)                                       # [B, C, T, dp]
    y = raw[..., :d] + attn[..., :d]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + LN_EPS)
    yn = yn * head['ln_scale'] + head['ln_bias']
    fused = jnp.mean(yn, axis=2)                     # [B, C, d]

    x = act(fused.reshape(B * C, d) @ head['w1'][:d] + head['b1'])
    for i, (wl, bl) in enumerate(head['layers']):
        x = x @ wl + bl
        if i < len(head['layers']) - 1:
            x = act(x)
    return _apply_final(x[:, 0], head['final_activation']).reshape(B, C)


# --------------------------------------------------------- Pallas screen
def _attention_screen_kernel(u_raw_ref, u_q_ref, u_vo_ref, u_suu_ref,
                             it_k_ref, it_vo_ref, it_tail_ref,
                             b1_ref, w1_ref, *rest_refs,
                             out_ref,
                             n_layers, n_item_mods, H, dh, d, dp, h1,
                             ln_scale_ref, ln_bias_ref,
                             activation, final_activation, compute_dtype):
    """One (user-tile x item-tile) block of screen scores.

    The stream kernel's t=0 block (full 5-plane softmax, exact) + the
    precomputed item tail — no t>0 machinery, no gram tables. Follows
    the round-4 kernel idioms: value accumulator for the vo combination
    (legal under the raised scoped-VMEM limit) and implicit [TB, 1, dp]
    broadcasts in the multiplies.
    """
    act = activation_fn(activation)
    f32 = jnp.float32
    Mi = n_item_mods
    u_raw = u_raw_ref[:].astype(f32)        # [TB, dp]
    u_q = u_q_ref[:].astype(f32)
    u_suu = u_suu_ref[:]                    # [TB, 8] f32
    it_k = it_k_ref[:].astype(f32)          # [TC, Mi*dp]
    it_tail = it_tail_ref[:].astype(f32)    # [TC, dp]
    ln_scale = ln_scale_ref[:]              # [dp] f32: gamma/T, padded 0
    ln_bias = ln_bias_ref[:]
    TB, TC = u_raw.shape[0], it_k.shape[0]

    def nt_matmul(a, b):  # [TB, dp] x [TC, dp] -> [TB, TC]
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def head_mask(h):  # [1, dp] f32: 1.0 on head h's dh lanes
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, dp), 1)
        return jnp.where((lane >= h * dh) & (lane < (h + 1) * dh), 1.0, 0.0)

    def it_tok(arr, m):  # [TC, dp] token slice of a loaded value
        return jax.lax.slice(arr, (0, m * dp), (TC, (m + 1) * dp))

    acc = None
    for h in range(H):
        l_user = jnp.broadcast_to(
            jax.lax.slice(u_suu, (0, h), (TB, h + 1)), (TB, TC))
        planes = [l_user] + [
            nt_matmul(u_q * head_mask(h), it_tok(it_k, m))
            for m in range(Mi)]
        mx = planes[0]
        for p in planes[1:]:
            mx = jnp.maximum(mx, p)
        es = [jnp.exp(p - mx) for p in planes]
        tot = es[0]
        for e in es[1:]:
            tot = tot + e
        inv = 1.0 / tot
        u_vo_h = u_vo_ref[:, h * dp:(h + 1) * dp].astype(f32)
        contrib = (es[0] * inv)[:, :, None] * u_vo_h[:, None, :]
        for m in range(Mi):
            off = (m * H + h) * dp
            contrib = contrib + ((es[m + 1] * inv)[:, :, None]
                                 * it_vo_ref[:, off:off + dp]
                                 .astype(f32)[None, :, :])
        acc = contrib if h == 0 else acc + contrib

    # Residual + LayerNorm over the d live lanes (token 0 only).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, dp), 2)
    live = lane < d
    y = u_raw[:, None, :] + acc
    mu = jnp.sum(y, axis=-1, keepdims=True) * (1.0 / d)
    yc = jnp.where(live, y - mu, 0.0)
    var = jnp.sum(yc * yc, axis=-1, keepdims=True) * (1.0 / d)
    yn = yc * jax.lax.rsqrt(var + LN_EPS)

    # ln_scale carries gamma/T; it_tail carries its own gamma/T fold.
    # Dead lanes: yn and it_tail are zero there, ln_bias is zero-padded.
    fused = (yn * ln_scale[None, None, :] + ln_bias[None, None, :]
             + it_tail[None, :, :])
    x = fused.astype(compute_dtype).reshape(TB * TC, dp)
    w1 = w1_ref[:].astype(compute_dtype)
    b1 = b1_ref[:].astype(compute_dtype)
    x = jnp.dot(x, w1, preferred_element_type=f32)
    x = act((x + b1).astype(compute_dtype))
    scores = _mlp_chain(x, rest_refs, n_layers, act, final_activation,
                        compute_dtype)
    out_ref[:] = scores.reshape(TB, TC)


def pallas_attention_screen_scores(
        head: dict, user_side: Tuple[jnp.ndarray, ...],
        item_side: Tuple[jnp.ndarray, ...], it_tail: jnp.ndarray,
        tile_users: int = 32, tile_items: int = 128,
        compute_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """Screen-stage pair scoring on TPU: -> [B, C] f32 scores."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u_raw, u_q, _u_k, u_vo, u_suu = user_side[:5]
    it_k, it_vo = item_side[2], item_side[3]
    B, dp = u_raw.shape
    C = it_k.shape[0]
    n_layers = len(head['layers'])
    grid = (B // tile_users, C // tile_items)
    Mi = head['n_item_mods']
    T = Mi + 1

    def u_spec(a):
        return pl.BlockSpec((tile_users, a.shape[1]), lambda i, j: (i, 0))

    def it_spec(a):
        return pl.BlockSpec((tile_items, a.shape[1]), lambda i, j: (j, 0))

    layer_specs, layer_args = [], []
    for w, b in head['layers']:
        layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
        layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
        layer_args.extend([w, b])

    ln_scale = _pad_lanes(head['ln_scale'] / T, dp)  # gamma/T folded
    ln_bias = _pad_lanes(head['ln_bias'], dp)

    kernel = functools.partial(
        _attention_screen_kernel, n_layers=n_layers,
        n_item_mods=Mi, H=head['H'], dh=head['dh'],
        d=head['d'], dp=dp, h1=head['h1'],
        activation=head['activation'],
        final_activation=head['final_activation'],
        compute_dtype=compute_dtype)

    def wrapped(u_raw_ref, u_q_ref, u_vo_ref, u_suu_ref,
                it_k_ref, it_vo_ref, it_tail_ref,
                b1_ref, w1_ref, ln_scale_ref, ln_bias_ref, *rest):
        *layer_refs, out_ref = rest
        kernel(u_raw_ref, u_q_ref, u_vo_ref, u_suu_ref,
               it_k_ref, it_vo_ref, it_tail_ref,
               b1_ref, w1_ref, *layer_refs, out_ref=out_ref,
               ln_scale_ref=ln_scale_ref, ln_bias_ref=ln_bias_ref)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[
            u_spec(u_raw), u_spec(u_q), u_spec(u_vo), u_spec(u_suu),
            it_spec(it_k), it_spec(it_vo), it_spec(it_tail),
            pl.BlockSpec(head['b1'].shape, lambda i, j: (0,)),
            pl.BlockSpec(head['w1'].shape, lambda i, j: (0, 0)),
            pl.BlockSpec(ln_scale.shape, lambda i, j: (0,)),
            pl.BlockSpec(ln_bias.shape, lambda i, j: (0,)),
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((tile_users, tile_items),
                               lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        # Same raised scoped-VMEM limit as the gram kernel: the H value-
        # accumulator chains + the [TB*TC, h1] MLP activations exceed the
        # 16MB compiler default at 32-user tiles but sit far under the
        # 128MB physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(u_raw, u_q, u_vo, u_suu, it_k, it_vo, it_tail,
      head['b1'], head['w1'], ln_scale, ln_bias, *layer_args)
