# pixelrec_multimodal_tpu/ops/attention_scorer.py
"""Fused full-catalog scoring for ATTENTION fusion.

Attention fusion (models/layers.py AttentionFusionLayer, parity target
/root/reference/src/models/layers.py:104-164) runs multi-head self-attention
over the (user, item-modality) token stack, residual + LayerNorm, mean-pool,
then the prediction MLP. The first Dense does not factorize (LayerNorm sits
on pair-dependent attention outputs), but almost everything FEEDING the
attention is user- or item-side separable:

  * Q/K/V projections of item tokens depend only on the item -> precomputed
    per catalog, like the factorized heads in ops/pairwise_mlp.py.
  * The out-projection is linear per head, so it folds into the item/user V
    tables: ``vo_k^h = V_k^h @ W_o^h`` — the per-pair attention output is
    then a softmax-weighted sum of precomputed D-vectors.
  * Item-item attention logits depend only on the item -> a per-item
    [H, T_i, T_i] table. Only the user<->item logits are per-pair, and they
    are tiny K=D matmuls on the MXU.

The Pallas kernel therefore does, per (user-tile x item-tile): pairwise
logits, a lane-stacked masked softmax per (query token, head), the weighted
vo sum, residual + LayerNorm + token mean, and the same lane-padded MLP
chain as the concat/gated kernels. Replaces the reference's batch-256 host
scoring loop (/root/reference/src/inference/recommender.py:96-236) for
attention-fusion models.
"""
from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.multimodal import activation_fn
from .pairwise_mlp import (
    LANE,
    _apply_final,
    _mlp_chain,
    _round_up,
    fold_prediction_mlp,
    pack_mlp_chain,
    pad2,
)

LN_EPS = 1e-6  # flax nn.LayerNorm default (models/layers.py:75)


# ------------------------------------------------------- gram-table layouts
def _gram_layout(H: int, Mi: int):
    """Row offsets of the per-item scalar table used by the gram kernel.

    All quantities are per item: means are (1/d)*sum over the d live
    lanes; Grams are full inner products over the d live lanes.
    """
    n_vo = Mi * H
    rows = {}
    off = 0
    rows['m_vo'] = off; off += n_vo            # mean(vo[m,h]), idx m*H+h
    rows['m_sexp'] = off; off += n_vo          # mean(sexp[t,h]), idx t*H+h
    rows['m_raw'] = off; off += Mi             # mean(raw_t)
    rows['g_vovo'] = off; off += n_vo * n_vo   # <vo_a, vo_b>, idx a*n_vo+b
    rows['g_rr'] = off; off += Mi              # <raw_t, raw_t>
    rows['g_rsexp'] = off; off += n_vo         # <raw_t, sexp[t,h]>, t*H+h
    rows['g_ss'] = off; off += Mi * H * H      # <sexp[t,h], sexp[t,h']>
    rows['e_ii'] = off; off += Mi * Mi * H     # e[tq,mk,h] softmax exps,
    return rows, off                           #   idx (tq*Mi+mk)*H+h


def _user_sc_layout(H: int):
    """Column offsets of the per-user scalar table (gram kernel)."""
    cols = {}
    off = 0
    cols['m_uraw'] = off; off += 1
    cols['m_uvo'] = off; off += H
    cols['g_rr'] = off; off += 1
    cols['g_rvo'] = off; off += H
    cols['g_vv'] = off; off += H * H           # <u_vo_h, u_vo_h'>, h*H+h'
    return cols, off


def build_attention_head(variables: dict, model) -> Optional[dict]:
    """Pack attention + LayerNorm + BN-folded MLP params for the fused
    scorer. Returns None for non-attention fusion or unfoldable BN."""
    if model.fusion_type != 'attention':
        return None
    folded = fold_prediction_mlp(variables, model)
    if folded is None:
        return None
    kernels, biases = folded
    n_hidden = len(model.fusion_hidden_dims)
    h1, padded_b1, layers = pack_mlp_chain(kernels, biases, n_hidden)

    params = variables['params']
    fl = params['fusion_layer']
    attn = fl['attention']
    ln = fl['norm']
    d = model.embedding_dim
    dp = _round_up(d, LANE)

    wq = np.asarray(attn['query']['kernel'], np.float32)   # [D, H, dh]
    _, H, dh = wq.shape

    head = {
        'fusion': 'attention',
        'd': d, 'dp': dp, 'H': H, 'dh': dh,
        'n_item_mods': model.num_modalities - 1,
        'h1': h1,
        'b1': padded_b1,
        'layers': layers,
        'activation': model.fusion_activation,
        'final_activation': model.final_activation,
        'w1': jnp.asarray(pad2(kernels[0], dp, h1)),        # [dp, h1]
        'ln_scale': jnp.asarray(np.asarray(ln['scale'], np.float32)),
        'ln_bias': jnp.asarray(np.asarray(ln['bias'], np.float32)),
    }
    for name in ('query', 'key', 'value'):
        w = np.asarray(attn[name]['kernel'], np.float32).reshape(d, H * dh)
        b = np.asarray(attn[name]['bias'], np.float32).reshape(H * dh)
        head[f'w_{name}'] = jnp.asarray(w)
        head[f'b_{name}'] = jnp.asarray(b)
    head['w_out'] = jnp.asarray(
        np.asarray(attn['out']['kernel'], np.float32).reshape(H * dh, d))
    head['b_out'] = jnp.asarray(np.asarray(attn['out']['bias'], np.float32))
    return head


def _pad_lanes(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Zero-pad the minor dim of [..., d] to ``width``."""
    pad = [(0, 0)] * (x.ndim - 1) + [(0, width - x.shape[-1])]
    return jnp.pad(x, pad)


def _qkvo(head: dict, tokens: jnp.ndarray
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """tokens [..., D] -> (q_scaled, k, vo) with q pre-scaled by 1/sqrt(dh)
    and the out-projection folded per head into vo [..., H, D]."""
    H, dh, d = head['H'], head['dh'], head['d']
    f = tokens.astype(jnp.float32)
    q = (f @ head['w_query'] + head['b_query']) / math.sqrt(dh)
    k = f @ head['w_key'] + head['b_key']
    v = f @ head['w_value'] + head['b_value']
    vh = v.reshape(v.shape[:-1] + (H, dh))
    wo = head['w_out'].reshape(H, dh, d)
    vo = jnp.einsum('...hd,hde->...he', vh, wo)            # [..., H, D]
    return q, k, vo


def compute_item_side_attention(head: dict, item_feats: jnp.ndarray,
                                with_gram: bool = True
                                ) -> Tuple[jnp.ndarray, ...]:
    """Per-item precompute, once per catalog.

    item_feats [N, Mi, D] (raw item-token stack from the item tower) ->
      it_raw  [N, Mi*dp]    residual/LN inputs, token-lane-padded
      it_q    [N, Mi*dp]    scaled queries
      it_k    [N, Mi*dp]    keys
      it_vo   [N, Mi*H*dp]  per-(token, head) out-projected values
      it_sii  [N, H*Mi*Mi]  item-item attention logits (XLA fallback only)
      it_sexp [N, Mi*H*dp]  per-(query token, head) exp-weighted vo sums
                            over the item KEYS: sum_m e_m * vo_m with
                            e_m = exp(sii - mx_items)
      it_dm   [N, H*Mi*2]   per-(head, query token) [sum_m e_m, mx_items]

    For item-query tokens (t > 0) only the USER key's logit is
    pair-dependent, so the kernel collapses the item-key softmax mass to
    the precomputed (it_sexp, it_dm) pair and runs ONE exp per
    (pair, token, head):  attn = (e_u*u_vo + sexp) / (e_u + dsum) with
    e_u = exp(s_iu - mx_items). This drops the per-pair max over keys —
    exact softmax up to fp rounding while logits stay within f32 exp
    range of the item-key max (the kernel clamps the exponent at +80,
    which degrades gracefully to the user-key-dominates limit).
    """
    N, Mi, d = item_feats.shape
    dp, H, dh = head['dp'], head['H'], head['dh']
    q, k, vo = _qkvo(head, item_feats)               # q,k [N,Mi,H*dh]; vo [N,Mi,H,D]
    qh = q.reshape(N, Mi, H, dh)
    kh = k.reshape(N, Mi, H, dh)
    sii = jnp.einsum('nthd,nkhd->nhtk', qh, kh)      # [N, H, Mi(q), Mi(k)]
    mx = jnp.max(sii, axis=-1)                       # [N, H, Mi(q)]
    e = jnp.exp(sii - mx[..., None])                 # [N, H, Mi(q), Mi(k)]
    dsum = jnp.sum(e, axis=-1)                       # [N, H, Mi(q)]
    # vo [N, Mi(k), H, D] -> exp-weighted sum over key tokens, per (q, h).
    sexp = jnp.einsum('nhqk,nkhd->nqhd', e, vo)      # [N, Mi(q), H, D]
    it_dm = jnp.stack([dsum, mx], axis=-1).reshape(N, H * Mi * 2)
    # The out-projection bias is constant per token and lands before the
    # residual LayerNorm — fold it into the raw (residual) tables.
    it_raw = _pad_lanes(item_feats.astype(jnp.float32) + head['b_out'],
                        dp).reshape(N, Mi * dp)
    it_q = _pad_lanes(q, dp).reshape(N, Mi * dp)
    it_k = _pad_lanes(k, dp).reshape(N, Mi * dp)
    it_vo = _pad_lanes(vo, dp).reshape(N, Mi * H * dp)
    it_sii = sii.reshape(N, H * Mi * Mi)
    it_sexp = _pad_lanes(sexp, dp).reshape(N, Mi * H * dp)

    if not with_gram:
        return it_raw, it_q, it_k, it_vo, it_sii, it_sexp, it_dm

    # Per-item scalar table for the gram kernel: means + item-item Grams
    # of the component vectors + the item-item softmax exps (layout:
    # _gram_layout). These let the kernel compute every token's LayerNorm
    # mean/variance from [TB, TC] scalar planes instead of materializing
    # the [TB, TC, dp] pre-LN vectors. Costs n_sc floats/item of HBM
    # (_gram_layout; 440 at the H=4, Mi=4 bench geometry) — skipped when
    # the scorer runs the stream variant.
    raw_f = item_feats.astype(jnp.float32) + head['b_out']   # [N, Mi, d]
    vo_f = vo.reshape(N, Mi * H, d)                          # idx m*H+h
    sexp_f = sexp.reshape(N, Mi * H, d)                      # idx t*H+h
    inv_d = 1.0 / d
    # Full-f32 einsums: the Grams feed LayerNorm statistics, where the
    # MXU's default bf16-multiply precision costs ~1e-3 of score
    # accuracy (measured; see gram_matmul in the kernel).
    hi = jax.lax.Precision.HIGHEST
    it_sc = jnp.concatenate([
        jnp.sum(vo_f, -1) * inv_d,                           # m_vo
        jnp.sum(sexp_f, -1) * inv_d,                         # m_sexp
        jnp.sum(raw_f, -1) * inv_d,                          # m_raw
        jnp.einsum('nad,nbd->nab', vo_f, vo_f,
                   precision=hi).reshape(N, Mi * H * Mi * H),  # g_vovo
        jnp.sum(raw_f * raw_f, -1),                          # g_rr
        jnp.einsum('ntd,nthd->nth', raw_f, sexp,
                   precision=hi).reshape(N, Mi * H),         # g_rsexp
        jnp.einsum('nthd,ntgd->nthg', sexp, sexp,
                   precision=hi).reshape(N, Mi * H * H),     # g_ss
        e.transpose(0, 2, 3, 1).reshape(N, Mi * Mi * H),     # e_ii
    ], axis=-1)
    return it_raw, it_q, it_k, it_vo, it_sii, it_sexp, it_dm, it_sc


def compute_user_side_attention(head: dict, user_emb: jnp.ndarray
                                ) -> Tuple[jnp.ndarray, ...]:
    """Per-user-block precompute.

    user_emb [B, D] ->
      u_raw [B, dp], u_q [B, dp], u_k [B, dp], u_vo [B, H*dp],
      u_suu [B, 8]  (user-token self-attention logit per head, padded)
    """
    dp, H, dh, d = head['dp'], head['H'], head['dh'], head['d']
    B = user_emb.shape[0]
    q, k, vo = _qkvo(head, user_emb)                 # [B, H*dh], vo [B, H, D]
    suu = jnp.sum(q.reshape(B, H, dh) * k.reshape(B, H, dh), axis=-1)
    suu8 = jnp.zeros((B, 8), jnp.float32).at[:, :H].set(suu)
    # Per-user scalar table for the gram kernel (layout: _user_sc_layout).
    raw_f = user_emb.astype(jnp.float32) + head['b_out']     # [B, d]
    inv_d = 1.0 / d
    hi = jax.lax.Precision.HIGHEST  # LN-stat Grams need full f32
    u_sc = jnp.concatenate([
        jnp.sum(raw_f, -1, keepdims=True) * inv_d,           # m_uraw
        jnp.sum(vo, -1) * inv_d,                             # m_uvo
        jnp.sum(raw_f * raw_f, -1, keepdims=True),           # g_rr
        jnp.einsum('bd,bhd->bh', raw_f, vo, precision=hi),   # g_rvo
        jnp.einsum('bhd,bgd->bhg', vo, vo,
                   precision=hi).reshape(B, H * H),
    ], axis=-1)
    return (_pad_lanes(user_emb.astype(jnp.float32) + head['b_out'], dp),
            _pad_lanes(q, dp), _pad_lanes(k, dp),
            _pad_lanes(vo, dp).reshape(B, H * dp), suu8, u_sc)


def pack_attention_tables(head: dict, item_side: Tuple[jnp.ndarray, ...]
                          ) -> Tuple[jnp.ndarray, ...]:
    """Strip dead lane padding from the HBM-resident item tables.

    The kernels consume dp-lane-padded vectors, but at d=64 (the flagship
    embedding dim) half of every padded table is zeros — ~14KB/item of
    wasted HBM residency and scan bandwidth at the H=4, Mi=5 geometry.
    The scorer stores tables PACKED (d lanes) and re-pads one chunk at a
    time inside the compiled scan (unpack_attention_chunk): the padded
    form is then a per-chunk transient, not a catalog-sized resident.
    No-op when d is already lane-aligned.
    """
    d, dp = head['d'], head['dp']
    if d == dp:
        return item_side
    Mi, H = head['n_item_mods'], head['H']

    def strip(a, n):
        C = a.shape[0]
        return a.reshape(C, n, dp)[..., :d].reshape(C, n * d)

    return (strip(item_side[0], Mi), strip(item_side[1], Mi),
            strip(item_side[2], Mi), strip(item_side[3], Mi * H),
            item_side[4], strip(item_side[5], Mi * H),
            item_side[6]) + tuple(item_side[7:])


def unpack_attention_chunk(head: dict, chunk: Tuple[jnp.ndarray, ...]
                           ) -> Tuple[jnp.ndarray, ...]:
    """Re-pad one packed chunk to the kernels' dp-lane layout (inverse of
    pack_attention_tables; runs inside the jitted scan body)."""
    d, dp = head['d'], head['dp']
    if d == dp:
        return chunk
    Mi, H = head['n_item_mods'], head['H']

    def pad(a, n):
        C = a.shape[0]
        return _pad_lanes(a.reshape(C, n, d), dp).reshape(C, n * dp)

    return (pad(chunk[0], Mi), pad(chunk[1], Mi), pad(chunk[2], Mi),
            pad(chunk[3], Mi * H), chunk[4], pad(chunk[5], Mi * H),
            chunk[6]) + tuple(chunk[7:])


# --------------------------------------------------------------- XLA fallback
def xla_attention_scores(head: dict, user_side: Tuple[jnp.ndarray, ...],
                         item_side: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Reference math for the fused attention path: -> [B, C] scores.

    Identical results to score_from_towers in eval mode; used on non-TPU
    platforms and by correctness tests.
    """
    act = activation_fn(head['activation'])
    d, dp, H, dh = head['d'], head['dp'], head['H'], head['dh']
    Mi = head['n_item_mods']
    T = Mi + 1
    u_raw, u_q, u_k, u_vo, u_suu = user_side[:5]
    it_raw, it_q, it_k, it_vo, it_sii = item_side[:5]
    B, C = u_raw.shape[0], it_raw.shape[0]

    uq = u_q[:, :d].reshape(B, H, dh)
    uk = u_k[:, :d].reshape(B, H, dh)
    iq = it_q.reshape(C, Mi, dp)[..., :d].reshape(C, Mi, H, dh)
    ik = it_k.reshape(C, Mi, dp)[..., :d].reshape(C, Mi, H, dh)

    # Logits [B, C, H, T(query), T(key)].
    s = jnp.zeros((B, C, H, T, T), jnp.float32)
    s = s.at[:, :, :, 0, 0].set(u_suu[:, None, :H])
    s = s.at[:, :, :, 0, 1:].set(
        jnp.einsum('bhd,cmhd->bchm', uq, ik))        # user queries items
    s = s.at[:, :, :, 1:, 0].set(
        jnp.einsum('cmhd,bhd->bchm', iq, uk))        # items query user
    sii = it_sii.reshape(C, H, Mi, Mi)
    s = s.at[:, :, :, 1:, 1:].set(
        jnp.broadcast_to(sii[None], (B, C, H, Mi, Mi)))
    w = jax.nn.softmax(s, axis=-1)                   # over keys

    vo = jnp.concatenate([
        jnp.broadcast_to(u_vo.reshape(B, 1, 1, H, dp),
                         (B, C, 1, H, dp)),
        jnp.broadcast_to(it_vo.reshape(1, C, Mi, H, dp),
                         (B, C, Mi, H, dp)),
    ], axis=2)                                       # [B, C, T(key), H, dp]
    attn = jnp.einsum('bchqk,bckhd->bcqd', w, vo)    # b_out folded into raw

    raw = jnp.concatenate([
        jnp.broadcast_to(u_raw.reshape(B, 1, 1, dp), (B, C, 1, dp)),
        jnp.broadcast_to(it_raw.reshape(1, C, Mi, dp), (B, C, Mi, dp)),
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


# --------------------------------------------------------------- Pallas kernel
def _attention_kernel(u_raw_ref, u_q_ref, u_k_ref, u_vo_ref, u_suu_ref,
                      it_raw_ref, it_q_ref, it_k_ref, it_vo_ref,
                      it_sexp_ref, it_dmT_ref,
                      b1_ref, w1_ref, *rest_refs,
                      out_ref, attn_scr, fused_scr,
                      n_layers, n_item_mods, H, dh, d, dp, h1,
                      ln_scale_ref, ln_bias_ref,
                      activation, final_activation, compute_dtype):
    """One (user-tile x item-tile) block of attention-fusion pair scores.

    Three Mosaic-shaped design rules, all measured the hard way:

    * The softmax over keys runs on fully-packed 2D [TB, TC] PLANES — one
      plane per key — never on arrays with a tiny minor dim: Mosaic pads
      the minor (lane) dim to 128, so a [TB, TC, 8] logit stack occupies
      16x its logical VMEM along with every softmax temporary (the first
      version did that: 8.6M pairs/s at 8-user tiles).
    * Loops are python-UNROLLED, not ``fori_loop``: a fori body bounds
      VMEM (traced once) but serializes — the all-fori variant measured
      15.2M pairs/s vs ~10x that unrolled. VMEM is bounded instead by
      (a) hoisting the H materialized [TB, TC, dp] user-vo broadcasts
      out of the token loop (the sublane broadcast [TB,1,dp]->[TB,TC,dp]
      is what occupied ~20 scoped-VMEM slots at one per (t, h): measured
      29.0M at 16x128) and (b) the factorization below.
    * For item-query tokens (t > 0) the item-key softmax mass is
      precomputed per item (``it_sexp``/``it_dm``, see
      compute_item_side_attention): per (pair, token, head) the kernel
      runs one MXU logit matmul, one exp, and TWO broadcast-mult-accs —
      instead of a 5-plane softmax and five bmacs.
    """
    act = activation_fn(activation)
    f32 = jnp.float32
    Mi, T = n_item_mods, n_item_mods + 1
    u_raw = u_raw_ref[:].astype(f32)        # [TB, dp]
    u_q = u_q_ref[:].astype(f32)
    u_k = u_k_ref[:].astype(f32)
    u_suu = u_suu_ref[:]                    # [TB, 8] f32
    it_raw = it_raw_ref[:].astype(f32)      # [TC, Mi*dp]
    it_q = it_q_ref[:].astype(f32)
    it_k = it_k_ref[:].astype(f32)
    it_dmT = it_dmT_ref[:]                  # [H*Mi*2, TC] f32
    ln_scale = ln_scale_ref[:]              # [dp] f32 (padded zeros)
    ln_bias = ln_bias_ref[:]
    TB, TC = u_raw.shape[0], it_raw.shape[0]

    def nt_matmul(a, b):  # [TB, dp] x [TC, dp] -> [TB, TC]
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def head_mask(h):  # [1, dp] f32: 1.0 on head h's dh lanes
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, dp), 1)
        return jnp.where((lane >= h * dh) & (lane < (h + 1) * dh), 1.0, 0.0)

    def it_tok(arr, m):  # [TC, dp] token slice of a loaded value
        return jax.lax.slice(arr, (0, m * dp), (TC, (m + 1) * dp))

    def it_vo_slice(m, h):  # [TC, dp] ref slice (full reads would
        off = (m * H + h) * dp              # materialize 1MB per call site)
        return it_vo_ref[:, off:off + dp].astype(f32)

    def it_sexp_slice(tq, h):  # [TC, dp]
        off = (tq * H + h) * dp
        return it_sexp_ref[:, off:off + dp].astype(f32)

    # Hoisted user-side vo broadcasts: ONE materialized [TB, TC, dp] per
    # head, reused by every query token.
    u_vo_b = [jnp.broadcast_to(
        u_vo_ref[:, h * dp:(h + 1) * dp].astype(f32)[:, None, :],
        (TB, TC, dp)) for h in range(H)]

    # Lane-index live mask ([1, 1, dp] broadcasts for free).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, dp), 2)
    live = lane < d
    inv_T = 1.0 / T

    def layernorm_token(raw_t, attn):
        """Residual + LayerNorm over the d live lanes, scaled by 1/T
        (b_out is folded into the raw tables at precompute). The LN affine
        (gamma, beta) commutes with the token mean — mean_t(yn_t*g + b) =
        g * mean_t(yn_t) + b — so it is applied ONCE after the token loop
        instead of per token (saves ~2 array-wide ops x T). Dead lanes of
        raw (zero-padded tables) and attn (zero-padded vo) are already 0,
        so y needs no live-mask; only the mean-centering reintroduces
        nonzeros there."""
        y = raw_t + attn
        mu = jnp.sum(y, axis=-1, keepdims=True) * (1.0 / d)
        yc = jnp.where(live, y - mu, 0.0)
        var = jnp.sum(yc * yc, axis=-1, keepdims=True) * (1.0 / d)
        return yc * jax.lax.rsqrt(var + LN_EPS) * inv_T

    # ---- t = 0: the user token queries all keys — full 5-plane softmax
    # (every key logit is pair-dependent here). Each unrolled iteration
    # closes with a scratch-ref store: Mosaic only reuses an unrolled
    # iteration's scoped-VMEM slots when its value chain is consumed by
    # a ref write (value-accumulator chains keep every iteration live —
    # measured 24.9M scoped at 16x128 without the scratch stores).
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
        contrib = (es[0] * inv)[:, :, None] * u_vo_b[h]
        for m in range(Mi):
            contrib = contrib + ((es[m + 1] * inv)[:, :, None]
                                 * it_vo_slice(m, h)[None, :, :])
        # h == 0 stores directly: saves the zero-init write plus one
        # load+add round-trip per tile (heavy-op accounting in
        # scripts/profile_vpu_roofline.py).
        attn_scr[:] = contrib if h == 0 else attn_scr[:] + contrib
    fused_scr[:] = layernorm_token(u_raw[:, None, :], attn_scr[:])

    # ---- t = 1..T-1: only the user key's logit is pair-dependent.
    # attn = (e_u * u_vo + sexp) / (e_u + dsum), e_u = exp(s_iu - mx).
    for tq in range(Mi):
        for h in range(H):
            s_iu = nt_matmul(u_k * head_mask(h), it_tok(it_q, tq))
            dsum = jnp.broadcast_to(
                jax.lax.slice(it_dmT, ((h * Mi + tq) * 2, 0),
                              ((h * Mi + tq) * 2 + 1, TC)), (TB, TC))
            mx = jnp.broadcast_to(
                jax.lax.slice(it_dmT, ((h * Mi + tq) * 2 + 1, 0),
                              ((h * Mi + tq) * 2 + 2, TC)), (TB, TC))
            # Exponent clamp: degrades gracefully to the user-key-
            # dominates limit instead of overflowing f32.
            e_u = jnp.exp(jnp.minimum(s_iu - mx, 80.0))
            r = 1.0 / (e_u + dsum)
            contrib = ((e_u * r)[:, :, None] * u_vo_b[h]
                       + r[:, :, None] * it_sexp_slice(tq, h)[None, :, :])
            attn_scr[:] = contrib if h == 0 else attn_scr[:] + contrib
        raw_t = it_tok(it_raw, tq)[None, :, :]
        fused_scr[:] = fused_scr[:] + layernorm_token(raw_t, attn_scr[:])

    # Deferred LN affine (see layernorm_token): one scale+bias for all T
    # tokens. Dead lanes may carry bias garbage — w1's pad rows are zero,
    # so they never reach the MLP.
    fused = (fused_scr[:] * ln_scale[None, None, :]
             + ln_bias[None, None, :])
    x = fused.astype(compute_dtype).reshape(TB * TC, dp)
    w1 = w1_ref[:].astype(compute_dtype)
    b1 = b1_ref[:].astype(compute_dtype)
    x = jnp.dot(x, w1, preferred_element_type=f32)
    x = act((x + b1).astype(compute_dtype))
    scores = _mlp_chain(x, rest_refs, n_layers, act, final_activation,
                        compute_dtype)
    out_ref[:] = scores.reshape(TB, TC)


# ------------------------------------------------------- gram-LN kernel
def _attention_gram_kernel(u_raw_ref, u_q_ref, u_k_ref, u_vo_ref, u_suu_ref,
                           u_sc_ref, it_gs_ref, it_kq_ref,
                           it_dmT_ref, it_scT_ref,
                           b1_ref, w1_ref, *rest_refs,
                           out_ref,
                           n_layers, n_item_mods, H, dh, d, dp, h1,
                           ln_scale_ref, ln_bias_ref,
                           activation, final_activation, compute_dtype):
    """Gram-factorized attention-fusion scoring (LayerNorm folded into
    precomputed tables).

    The stream kernel (_attention_kernel) materializes every token's
    pre-LN vector on [TB, TC, dp] planes (~185 dp-wide VPU ops/pair) and
    is dependency-bound at 58% of the measured VPU ceiling. This variant
    exploits that each token's pre-LN vector is a LINEAR combination of
    per-side component vectors with pair-dependent scalar coefficients:

        y_0 = u_raw + sum_h a_h u_vo_h + sum_mh b_mh it_vo_mh
        y_t = it_raw_t + sum_h [a_th u_vo_h + b_th it_sexp_th]   (t > 0)

    so LayerNorm's mean is linear in the precomputed component means and
    its variance is a quadratic form over the component Gram matrix:
    item-item and user-user Grams are precomputed tables
    (compute_item_side_attention / compute_user_side_attention, layouts
    in _gram_layout/_user_sc_layout); user-item cross Grams are ONE
    batched MXU matmul [U*TB, dp] x [I*TC, dp]^T per tile. The final
    fused vector is then a single combination pass over the component
    vectors with per-token 1/sigma-folded coefficients — the it_sexp
    components are further expanded over the it_vo basis via the
    precomputed item-item softmax exps (e_ii), cutting dp-wide work to
    ~26 broadcast-mult-accumulates/pair (vs 185).

    Exactness: identical math to the stream kernel except variance is
    computed as E[y^2] - mu^2 (catastrophic-cancellation-prone only when
    |mu| >> sigma, which LayerNormed embedding mixtures don't approach);
    validated against xla_attention_scores at 1e-4 relative.
    """
    act = activation_fn(activation)
    f32 = jnp.float32
    Mi, T = n_item_mods, n_item_mods + 1
    n_vo = Mi * H
    n_i = 2 * n_vo + Mi                     # gram-stack vectors per item
    GR, _ = _gram_layout(H, Mi)
    UC, _ = _user_sc_layout(H)

    u_raw = u_raw_ref[:].astype(f32)        # [TB, dp]
    u_q = u_q_ref[:].astype(f32)
    u_k = u_k_ref[:].astype(f32)
    u_suu = u_suu_ref[:]                    # [TB, 8] f32
    u_sc = u_sc_ref[:]                      # [TB, n_usc] f32
    it_dmT = it_dmT_ref[:]                  # [H*Mi*2, TC] f32
    it_scT = it_scT_ref[:]                  # [n_sc, TC] f32
    ln_scale = ln_scale_ref[:]              # [dp] f32 (gamma/T, padded 0)
    ln_bias = ln_bias_ref[:]
    TB, TC = u_raw.shape[0], it_scT.shape[1]

    def nt_matmul(a, b):  # [R, dp] x [S, dp] -> [R, S]
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def head_mask(h):  # [1, dp] f32: 1.0 on head h's dh lanes
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, dp), 1)
        return jnp.where((lane >= h * dh) & (lane < (h + 1) * dh), 1.0, 0.0)

    def us(c):  # user scalar column -> [TB, 1]
        return jax.lax.slice(u_sc, (0, c), (TB, c + 1))

    def isc(r):  # item scalar row -> [1, TC]
        return jax.lax.slice(it_scT, (r, 0), (r + 1, TC))

    def gs_vec(i):  # component vector i -> [TC, dp] ref slice
        return it_gs_ref[i].astype(f32)

    # ---- user-item cross Grams + attention logits as TWO batched MXU
    # matmuls (round 4). Ug rows: 0 = u_raw, 1+h = u_vo_h; gram-stack
    # vectors: vo (m*H+h), sexp (n_vo + t*H+h), raw (2*n_vo + t). The
    # round-3 kernel issued n_i + 2*Mi = 29 small [<=40, dp] x [TC, dp]^T
    # matmuls per tile, each paying MXU pipeline fill; with the scalar-
    # plane restructure measured perf-neutral, that fixed cost is the
    # next candidate binding term. One [(1+H)*TB, dp] x [n_i*TC, dp]^T
    # matmul (+ one [2*H*TB, dp] x [2*Mi*TC, dp]^T for the logits) pays
    # it once; planes come out as row/lane slices at vreg-aligned
    # offsets. The whole-stack reshape copies (~2.7MB at the bench
    # geometry) sit under the raised 64MB scoped-VMEM limit — the
    # round-3 single-matmul attempt predated that raise and blew the
    # 16MB default.
    Ug = jnp.concatenate(
        [u_raw] + [u_vo_ref[:, h * dp:(h + 1) * dp].astype(f32)
                   for h in range(H)], axis=0)          # [(1+H)*TB, dp]

    # Cross-gram precision: the MXU's default single-pass bf16 multiply
    # puts ~1e-3 relative error on these Grams -> ~5e-4 on the fused
    # vector, BELOW the bf16 MLP's own quantization floor (~4e-3), so
    # default precision is accuracy-neutral end-to-end (hardware
    # three-way check: gram matches the generic scorer as closely as
    # the stream kernel). HIGHEST measured 10% slower (51.0M vs 56.6M
    # kernel-only); Mosaic rejects HIGH (bf16x3) in-kernel. The
    # once-per-catalog table Grams DO run at HIGHEST (free there).
    gs2d = it_gs_ref[:].astype(f32).reshape(n_i * TC, dp)
    GP_all = nt_matmul(Ug, gs2d)          # [(1+H)*TB, n_i*TC]

    def gp(uvec, ivec):  # [TB, TC] cross-Gram plane
        return jax.lax.slice(GP_all, (uvec * TB, ivec * TC),
                             ((uvec + 1) * TB, (ivec + 1) * TC))

    # ---- pairwise attention logits: one matmul for all (head, token)
    # planes. it_kq stacks the Mi key tokens then the Mi query tokens
    # token-major ([2*Mi, TC, dp], built once per catalog chunk by the
    # dispatch); Aq rows hit the key half, Ak rows the query half.
    Aq = jnp.concatenate([u_q * head_mask(h) for h in range(H)], axis=0)
    Ak = jnp.concatenate([u_k * head_mask(h) for h in range(H)], axis=0)
    kq2d = it_kq_ref[:].astype(f32).reshape(2 * Mi * TC, dp)
    S_all = nt_matmul(jnp.concatenate([Aq, Ak], axis=0), kq2d)

    def s0_plane(m, h):   # user-query logits vs item key token m
        return jax.lax.slice(S_all, (h * TB, m * TC),
                             ((h + 1) * TB, (m + 1) * TC))

    def siu_plane(t, h):  # item-token-t query vs user-key logits
        return jax.lax.slice(S_all, ((H + h) * TB, (Mi + t) * TC),
                             ((H + h + 1) * TB, (Mi + t + 1) * TC))

    # ---- t=0 softmax coefficients (full 5-plane softmax per head).
    alpha = []                               # [h] -> [TB, TC]
    beta = [[None] * H for _ in range(Mi)]   # [m][h]
    for h in range(H):
        l_user = jnp.broadcast_to(
            jax.lax.slice(u_suu, (0, h), (TB, h + 1)), (TB, TC))
        planes = [l_user] + [s0_plane(m, h) for m in range(Mi)]
        mx = planes[0]
        for p in planes[1:]:
            mx = jnp.maximum(mx, p)
        es = [jnp.exp(p - mx) for p in planes]
        tot = es[0]
        for e in es[1:]:
            tot = tot + e
        inv = 1.0 / tot
        alpha.append(es[0] * inv)
        for m in range(Mi):
            beta[m][h] = es[m + 1] * inv

    # ---- t>0 coefficients: a = e_u/(e_u+dsum) on u_vo, b = 1/(e_u+dsum)
    # on the precomputed item-key softmax mass (sexp).
    a_c = [[None] * H for _ in range(Mi)]
    b_c = [[None] * H for _ in range(Mi)]
    for t in range(Mi):
        for h in range(H):
            dsum = jnp.broadcast_to(
                jax.lax.slice(it_dmT, ((h * Mi + t) * 2, 0),
                              ((h * Mi + t) * 2 + 1, TC)), (TB, TC))
            mx = jnp.broadcast_to(
                jax.lax.slice(it_dmT, ((h * Mi + t) * 2 + 1, 0),
                              ((h * Mi + t) * 2 + 2, TC)), (TB, TC))
            e_u = jnp.exp(jnp.minimum(siu_plane(t, h) - mx, 80.0))
            r = 1.0 / (e_u + dsum)
            a_c[t][h] = e_u * r
            b_c[t][h] = r

    inv_d = 1.0 / d

    def ivo(m, h):
        return m * H + h

    def isx(t, h):
        return n_vo + t * H + h

    def irw(t):
        return 2 * n_vo + t

    # ---- sublane-stacked coefficient planes (round 4). The round-3
    # kernel issued ~1.5k single-vreg [TB, TC] plane ops here — the
    # measured binding term was per-instruction issue overhead, not
    # element throughput (BASELINE.md gram section). Stacking the
    # coefficient planes along the SUBLANE axis ([K, TB, TC]: K*TB
    # sublanes x TC lanes) turns each K-term accumulation into a couple
    # of multi-vreg ops, and the Gram quadratics become one broadcasted
    # outer product + reduction (the g_vovo table stores the FULL
    # symmetric matrix, so the unsymmetrized double sum doubles
    # off-diagonals implicitly). Pure f32 reassociation of the same
    # sums — validated against xla_attention_scores at the original
    # tolerance.
    def isc_rows(r0, n):  # [n, TC] item-scalar row block
        return jax.lax.slice(it_scT, (r0, 0), (r0 + n, TC))

    Bs3 = jnp.stack([beta[m][h] for m in range(Mi) for h in range(H)])

    # ---- token 0 LayerNorm stats from Grams.
    mu0 = jnp.broadcast_to(us(UC['m_uraw']), (TB, TC))
    S0 = jnp.broadcast_to(us(UC['g_rr']), (TB, TC))
    for h in range(H):
        mu0 = mu0 + alpha[h] * us(UC['m_uvo'] + h)
        S0 = S0 + (2.0 * alpha[h]) * us(UC['g_rvo'] + h)
        for h2 in range(H):
            S0 = S0 + (alpha[h] * alpha[h2]) * us(UC['g_vv'] + h * H + h2)
    mu0 = mu0 + jnp.sum(Bs3 * isc_rows(GR['m_vo'], n_vo)[:, None, :], axis=0)
    gp0 = jnp.stack([gp(0, i) for i in range(n_vo)])    # [n_vo, TB, TC]
    S0 = S0 + 2.0 * jnp.sum(Bs3 * gp0, axis=0)
    for h2 in range(H):
        gph = jnp.stack([gp(1 + h2, i) for i in range(n_vo)])
        S0 = S0 + (2.0 * alpha[h2]) * jnp.sum(Bs3 * gph, axis=0)
    # item-item vo Gram quadratic: inner_a = sum_b beta_b G_ab, then
    # S0 += sum_a beta_a inner_a.
    Gv = isc_rows(GR['g_vovo'], n_vo * n_vo).reshape(n_vo, n_vo, TC)
    inner = jnp.sum(Gv[:, :, None, :] * Bs3[None], axis=1)
    S0 = S0 + jnp.sum(Bs3 * inner, axis=0)
    # E[y^2] - mu^2 can cancel slightly negative in f32; clamp at 0 so
    # rsqrt(var + eps) never sees var < -LN_EPS (NaN).
    var0 = jnp.maximum(S0 * inv_d - mu0 * mu0, 0.0)
    isig0 = jax.lax.rsqrt(var0 + LN_EPS)

    # ---- tokens t>0 LayerNorm stats ([H, TB, TC] stacks per token).
    A4 = [jnp.stack(a_c[t]) for t in range(Mi)]
    B4 = [jnp.stack(b_c[t]) for t in range(Mi)]
    m_sx = isc_rows(GR['m_sexp'], n_vo).reshape(Mi, H, TC)
    g_rsx = isc_rows(GR['g_rsexp'], n_vo).reshape(Mi, H, TC)
    g_ss4 = isc_rows(GR['g_ss'], Mi * H * H).reshape(Mi, H, H, TC)
    isig = []
    mus = []
    for t in range(Mi):
        At, Bt = A4[t], B4[t]
        mu = jnp.broadcast_to(isc(GR['m_raw'] + t), (TB, TC))
        S = jnp.broadcast_to(isc(GR['g_rr'] + t), (TB, TC))
        for h in range(H):
            mu = mu + a_c[t][h] * us(UC['m_uvo'] + h)
            for h2 in range(H):
                S = S + (a_c[t][h] * a_c[t][h2]) * us(UC['g_vv'] + h * H + h2)
        mu = mu + jnp.sum(Bt * m_sx[t][:, None, :], axis=0)
        gpr = jnp.stack([gp(1 + h, irw(t)) for h in range(H)])
        S = S + 2.0 * jnp.sum(At * gpr, axis=0)
        S = S + 2.0 * jnp.sum(Bt * g_rsx[t][:, None, :], axis=0)
        gpx = jnp.stack(
            [jnp.stack([gp(1 + h, isx(t, h2)) for h2 in range(H)])
             for h in range(H)])                        # [H, H, TB, TC]
        S = S + 2.0 * jnp.sum((At[:, None] * Bt[None]) * gpx, axis=(0, 1))
        S = S + jnp.sum((Bt[:, None] * Bt[None]) * g_ss4[t][:, :, None, :],
                        axis=(0, 1))
        var = jnp.maximum(S * inv_d - mu * mu, 0.0)
        isig.append(jax.lax.rsqrt(var + LN_EPS))
        mus.append(mu)

    # ---- combination coefficients (1/sigma folded; sexp expanded over
    # the vo basis via e_ii so only 1 + H + Mi*H + Mi + 1 dp-wide
    # accumulates remain).
    w_uvo = []
    for h in range(H):
        w = alpha[h] * isig0
        for t in range(Mi):
            w = w + a_c[t][h] * isig[t]
        w_uvo.append(w)
    # w_vo[m][h] = beta_mh/sig0 + sum_t (b_th/sig_t) e_ii[t,m,h], with the
    # t-sum batched over [Mi_t, H, TB, TC].
    Q4 = jnp.stack([B4[t] * isig[t][None] for t in range(Mi)])
    E4 = isc_rows(GR['e_ii'], Mi * Mi * H).reshape(Mi, Mi, H, TC)
    w_vo = [[None] * H for _ in range(Mi)]
    for m in range(Mi):
        wm = (Bs3[m * H:(m + 1) * H] * isig0[None]
              + jnp.sum(Q4 * E4[:, m][:, :, None, :], axis=0))
        for h in range(H):
            w_vo[m][h] = wm[h]
    ones_c = mu0 * isig0
    for t in range(Mi):
        ones_c = ones_c + mus[t] * isig[t]

    # ---- the single dp-wide combination pass, on a VALUE accumulator
    # (round 4). The round-3 scratch-ref formulation closed every step
    # with a store so Mosaic could reuse the [TB, TC, dp] slot under the
    # 16MB scoped-VMEM limit — 26 store+load roundtrips = ~26MB of VMEM
    # traffic per tile. Under the raised 64MB limit the value chain's
    # liveness fits, and the stores vanish.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, dp), 2)
    live_f = jnp.where(lane < d, 1.0, 0.0)
    acc = isig0[:, :, None] * u_raw[:, None, :]
    for h in range(H):
        acc = acc + w_uvo[h][:, :, None] * jax.lax.slice(
            Ug, ((1 + h) * TB, 0), ((2 + h) * TB, dp))[:, None, :]
    for m in range(Mi):
        for h in range(H):
            acc = acc + w_vo[m][h][:, :, None] * gs_vec(ivo(m, h))[None]
    for t in range(Mi):
        acc = acc + isig[t][:, :, None] * gs_vec(irw(t))[None]
    acc = acc - ones_c[:, :, None] * live_f

    # ln_scale already carries gamma * (1/T); dead lanes are zero on both
    # affine vectors so they stay zero into the (zero-pad-row) MLP.
    fused = acc * ln_scale[None, None, :] + ln_bias[None, None, :]
    x = fused.astype(compute_dtype).reshape(TB * TC, dp)
    w1 = w1_ref[:].astype(compute_dtype)
    b1 = b1_ref[:].astype(compute_dtype)
    x = jnp.dot(x, w1, preferred_element_type=f32)
    x = act((x + b1).astype(compute_dtype))
    scores = _mlp_chain(x, rest_refs, n_layers, act, final_activation,
                        compute_dtype)
    out_ref[:] = scores.reshape(TB, TC)


def _pallas_attention_scores_gram(
        head: dict, user_side: Tuple[jnp.ndarray, ...],
        item_side: Tuple[jnp.ndarray, ...],
        tile_users: int, tile_items: int,
        compute_dtype, interpret: bool) -> jnp.ndarray:
    """Gram-variant dispatch: builds the per-chunk [I, C, dp] component
    stack (one XLA transpose of existing tables — no extra HBM-resident
    tables) and calls _attention_gram_kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u_raw, u_q, u_k, u_vo, u_suu, u_sc = user_side[:6]
    it_raw, it_q, it_k, it_vo, _it_sii, it_sexp, it_dm, it_sc = item_side[:8]
    B, dp = u_raw.shape
    C = it_raw.shape[0]
    n_layers = len(head['layers'])
    grid = (B // tile_users, C // tile_items)
    H, Mi = head['H'], head['n_item_mods']
    n_vo = Mi * H
    n_i = 2 * n_vo + Mi

    it_gs = jnp.concatenate([
        it_vo.reshape(C, n_vo, dp).transpose(1, 0, 2),
        it_sexp.reshape(C, n_vo, dp).transpose(1, 0, 2),
        it_raw.reshape(C, Mi, dp).transpose(1, 0, 2),
    ], axis=0)                                       # [n_i, C, dp]
    it_dmT = it_dm.reshape(C, H * Mi * 2).T
    it_scT = it_sc.T                                 # [n_sc, C]

    def u_spec(a):
        return pl.BlockSpec((tile_users, a.shape[1]), lambda i, j: (i, 0))

    def it_spec(a):
        return pl.BlockSpec((tile_items, a.shape[1]), lambda i, j: (j, 0))

    layer_specs, layer_args = [], []
    for w, b in head['layers']:
        layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
        layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
        layer_args.extend([w, b])

    T = Mi + 1
    ln_scale = _pad_lanes(head['ln_scale'] / T, dp)  # gamma/T folded
    ln_bias = _pad_lanes(head['ln_bias'], dp)

    kernel = functools.partial(
        _attention_gram_kernel, n_layers=n_layers,
        n_item_mods=Mi, H=H, dh=head['dh'],
        d=head['d'], dp=dp, h1=head['h1'],
        activation=head['activation'],
        final_activation=head['final_activation'],
        compute_dtype=compute_dtype)

    # Key/query tokens stacked token-major ([2*Mi, C, dp]) so the kernel
    # computes every (head, token) logit plane with ONE MXU matmul over
    # the sublane-flattened [2*Mi*TC, dp] stack (key tokens first).
    it_kq = jnp.concatenate([
        it_k.reshape(C, Mi, dp).transpose(1, 0, 2),
        it_q.reshape(C, Mi, dp).transpose(1, 0, 2)], axis=0)

    def wrapped(u_raw_ref, u_q_ref, u_k_ref, u_vo_ref, u_suu_ref, u_sc_ref,
                it_gs_ref, it_kq_ref, it_dmT_ref, it_scT_ref,
                b1_ref, w1_ref, ln_scale_ref, ln_bias_ref, *rest):
        *layer_refs, out_ref = rest
        kernel(u_raw_ref, u_q_ref, u_k_ref, u_vo_ref, u_suu_ref, u_sc_ref,
               it_gs_ref, it_kq_ref, it_dmT_ref, it_scT_ref,
               b1_ref, w1_ref, *layer_refs, out_ref=out_ref,
               ln_scale_ref=ln_scale_ref, ln_bias_ref=ln_bias_ref)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[
            u_spec(u_raw), u_spec(u_q), u_spec(u_k), u_spec(u_vo),
            u_spec(u_suu), u_spec(u_sc),
            pl.BlockSpec((n_i, tile_items, dp), lambda i, j: (0, j, 0)),
            pl.BlockSpec((2 * Mi, tile_items, dp), lambda i, j: (0, j, 0)),
            pl.BlockSpec((it_dmT.shape[0], tile_items),
                         lambda i, j: (0, j)),
            pl.BlockSpec((it_scT.shape[0], tile_items),
                         lambda i, j: (0, j)),
            pl.BlockSpec(head['b1'].shape, lambda i, j: (0,)),
            pl.BlockSpec(head['w1'].shape, lambda i, j: (0, 0)),
            pl.BlockSpec(ln_scale.shape, lambda i, j: (0,)),
            pl.BlockSpec(ln_bias.shape, lambda i, j: (0,)),
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((tile_users, tile_items),
                               lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        # The gram stack block + its CSE'd loads put the 8x128 tile at
        # ~18MB scoped VMEM — above the 16MB compiler default but well
        # under the 128MB physical VMEM. Raise the scoped limit rather
        # than shrinking tiles below the lane width.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(u_raw, u_q, u_k, u_vo, u_suu, u_sc,
      it_gs, it_kq, it_dmT, it_scT,
      head['b1'], head['w1'], ln_scale, ln_bias, *layer_args)


def pallas_attention_scores(head: dict, user_side: Tuple[jnp.ndarray, ...],
                            item_side: Tuple[jnp.ndarray, ...],
                            tile_users: int = 8, tile_items: int = 128,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False,
                            variant: str = 'stream') -> jnp.ndarray:
    """Fused attention-fusion pair scoring on TPU: -> [B, C] f32 scores."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variant == 'gram':
        return _pallas_attention_scores_gram(
            head, user_side, item_side, tile_users, tile_items,
            compute_dtype, interpret)

    u_raw, u_q, u_k, u_vo, u_suu = user_side[:5]
    it_raw, it_q, it_k, it_vo, _it_sii, it_sexp, it_dm = item_side[:7]
    B, dp = u_raw.shape
    C = it_raw.shape[0]
    n_layers = len(head['layers'])
    grid = (B // tile_users, C // tile_items)
    H, Mi = head['H'], head['n_item_mods']
    # Per-(head, query token) [dsum, mx] rows as lane vectors
    # ([H*Mi*2, C]): one XLA transpose per chunk, so each row broadcasts
    # over users transpose-free inside the kernel.
    it_dmT = it_dm.reshape(C, H * Mi * 2).T

    def u_spec(a):
        return pl.BlockSpec((tile_users, a.shape[1]), lambda i, j: (i, 0))

    def it_spec(a):
        return pl.BlockSpec((tile_items, a.shape[1]), lambda i, j: (j, 0))

    layer_specs, layer_args = [], []
    for w, b in head['layers']:
        layer_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0)))
        layer_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,)))
        layer_args.extend([w, b])

    ln_scale = _pad_lanes(head['ln_scale'], dp)
    ln_bias = _pad_lanes(head['ln_bias'], dp)

    kernel = functools.partial(
        _attention_kernel, n_layers=n_layers,
        n_item_mods=head['n_item_mods'], H=head['H'], dh=head['dh'],
        d=head['d'], dp=dp, h1=head['h1'],
        activation=head['activation'],
        final_activation=head['final_activation'],
        compute_dtype=compute_dtype)

    def wrapped(u_raw_ref, u_q_ref, u_k_ref, u_vo_ref, u_suu_ref,
                it_raw_ref, it_q_ref, it_k_ref, it_vo_ref,
                it_sexp_ref, it_dmT_ref,
                b1_ref, w1_ref, ln_scale_ref, ln_bias_ref, *rest):
        *layer_refs, out_ref, attn_scr, fused_scr = rest
        kernel(u_raw_ref, u_q_ref, u_k_ref, u_vo_ref, u_suu_ref,
               it_raw_ref, it_q_ref, it_k_ref, it_vo_ref,
               it_sexp_ref, it_dmT_ref,
               b1_ref, w1_ref, *layer_refs, out_ref=out_ref,
               attn_scr=attn_scr, fused_scr=fused_scr,
               ln_scale_ref=ln_scale_ref, ln_bias_ref=ln_bias_ref)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=[
            u_spec(u_raw), u_spec(u_q), u_spec(u_k), u_spec(u_vo),
            u_spec(u_suu),
            it_spec(it_raw), it_spec(it_q), it_spec(it_k), it_spec(it_vo),
            it_spec(it_sexp),
            pl.BlockSpec((it_dmT.shape[0], tile_items),
                         lambda i, j: (0, j)),
            pl.BlockSpec(head['b1'].shape, lambda i, j: (0,)),
            pl.BlockSpec(head['w1'].shape, lambda i, j: (0, 0)),
            pl.BlockSpec(ln_scale.shape, lambda i, j: (0,)),
            pl.BlockSpec(ln_bias.shape, lambda i, j: (0,)),
            *layer_specs,
        ],
        out_specs=pl.BlockSpec((tile_users, tile_items),
                               lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_users, tile_items, dp), jnp.float32),
            pltpu.VMEM((tile_users, tile_items, dp), jnp.float32),
        ],
        interpret=interpret,
    )(u_raw, u_q, u_k, u_vo, u_suu,
      it_raw, it_q, it_k, it_vo, it_sexp, it_dmT,
      head['b1'], head['w1'], ln_scale, ln_bias, *layer_args)
