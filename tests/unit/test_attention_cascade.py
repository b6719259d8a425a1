"""Tests for the two-stage cascaded attention scoring
(ops/attention_cascade + CatalogScorer.top_k_cascade).

The screen stage is an approximation (exact token-0 attention +
per-item frozen tails), so its contract is measured recall, not
equality; the rescore stage and the end-to-end cascade at full candidate
coverage must match the exact path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelrec_multimodal_tpu.data.feature_store import ItemFeatureStore
from pixelrec_multimodal_tpu.inference.scorer import CatalogScorer
from pixelrec_multimodal_tpu.ops.attention_cascade import (
    compute_screen_additive_items,
    compute_screen_additive_user,
    compute_screen_tail,
    pallas_attention_screen_scores,
    unpack_candidate_rows,
    xla_attention_candidate_scores,
    xla_attention_screen_scores,
)
from pixelrec_multimodal_tpu.ops.attention_scorer import (
    LN_EPS,
    _qkvo,
    build_attention_head,
    compute_item_side_attention,
    compute_user_side_attention,
    pack_attention_tables,
    xla_attention_scores,
)

from .test_attention_scorer import (
    N_ITEMS,
    N_TAGS,
    init_variables,
    make_model,
    sides,
)


def make_store(seed=4):
    rng = np.random.default_rng(seed)
    store = ItemFeatureStore(N_ITEMS, np.arange(N_ITEMS).astype(str))
    store.tables['tag_idx'] = (np.arange(N_ITEMS) % N_TAGS).astype(np.int32)
    store.tables['numerical'] = rng.standard_normal(
        (N_ITEMS, 2)).astype(np.float32)
    store.tables['vision_emb'] = rng.standard_normal(
        (N_ITEMS, 6)).astype(np.float32)
    store.tables['language_emb'] = rng.standard_normal(
        (N_ITEMS, 5)).astype(np.float32)
    return store


class TestScreenMath:
    def test_tail_matches_token_level_recompute(self):
        """The tail table equals an independent token-level computation of
        the item-only self-attention outputs (e_u -> 0 limit)."""
        model = make_model(heads=2)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, _, _ = sides(model, variables, B=4, C=12)
        item_side = compute_item_side_attention(head, item_feats)
        tail = compute_screen_tail(head, item_side)

        N, Mi, d = item_feats.shape
        H, dh = head['H'], head['dh']
        q, k, vo = _qkvo(head, item_feats)
        qh = q.reshape(N, Mi, H, dh)
        kh = k.reshape(N, Mi, H, dh)
        sii = jnp.einsum('nthd,nkhd->nhtk', qh, kh)
        w = jax.nn.softmax(sii, axis=-1)
        attn = jnp.einsum('nhtk,nkhd->ntd', w, vo)
        y = item_feats.astype(jnp.float32) + head['b_out'] + attn
        mu = jnp.mean(y, -1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), -1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + LN_EPS)
        ref = jnp.sum(yn, axis=1) * (head['ln_scale'] / (Mi + 1))
        np.testing.assert_allclose(np.asarray(tail[:, :d]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize('heads', [1, 2])
    def test_pallas_screen_matches_xla(self, heads):
        model = make_model(heads=heads)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=16, C=128)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        tail = compute_screen_tail(head, item_side)
        ref = xla_attention_screen_scores(head, user_side, item_side, tail)
        out = pallas_attention_screen_scores(
            head, user_side, item_side, tail, tile_users=16, tile_items=128,
            compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_screen_correlates_with_exact(self):
        """The screen drops only the user's influence on item tokens —
        on a trained-from-init model it must still rank like the exact
        scores (this is the property the cascade's recall rests on)."""
        model = make_model(heads=2)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=16, C=128)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        tail = compute_screen_tail(head, item_side)
        scr = np.asarray(
            xla_attention_screen_scores(head, user_side, item_side, tail))
        ex = np.asarray(xla_attention_scores(head, user_side, item_side))
        c = np.corrcoef(scr.ravel(), ex.ravel())[0, 1]
        assert c > 0.9, c

    def test_additive_screen_matches_direct_formula(self):
        """The additive tier's factorized rows reproduce
        MLP(LN(user-only token 0) + item tail) computed directly."""
        from pixelrec_multimodal_tpu.models.multimodal import activation_fn
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import (
            xla_pairwise_scores,
        )
        model = make_model(heads=2)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=8, C=24)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        tail = compute_screen_tail(head, item_side)
        uf = compute_screen_additive_user(head, user_side)
        itf = compute_screen_additive_items(head, tail)
        shead = {'layers': head['layers'], 'activation': head['activation'],
                 'final_activation': head['final_activation'],
                 'h1': head['h1'], 'b1': head['b1'], 'b1_folded': True}
        got = np.asarray(xla_pairwise_scores(shead, uf, itf))

        # direct: user token y0 in the e_items->0 limit + tail, then MLP
        d, dp, H = head['d'], head['dp'], head['H']
        T = head['n_item_mods'] + 1
        u_raw, u_vo = user_side[0], user_side[3]
        B = u_raw.shape[0]
        y0 = u_raw[:, :d] + jnp.sum(
            u_vo.reshape(B, H, dp)[..., :d], axis=1)
        mu = jnp.mean(y0, -1, keepdims=True)
        var = jnp.mean(jnp.square(y0 - mu), -1, keepdims=True)
        yn = (y0 - mu) * jax.lax.rsqrt(var + LN_EPS)
        u_fused = yn * (head['ln_scale'] / T) + head['ln_bias']
        fused = u_fused[:, None, :] + tail[None, :, :d]
        act = activation_fn(head['activation'])
        x = act(fused.reshape(-1, d) @ head['w1'][:d] + head['b1'])
        for i, (wl, bl) in enumerate(head['layers']):
            x = x @ wl + bl
            if i < len(head['layers']) - 1:
                x = act(x)
        from pixelrec_multimodal_tpu.ops.pairwise_mlp import _apply_final
        want = np.asarray(_apply_final(
            x[:, 0], head['final_activation']).reshape(B, -1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_candidate_scores_match_exact_columns(self):
        model = make_model(heads=2)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=16, C=128)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        ex = np.asarray(xla_attention_scores(head, user_side, item_side))
        rng = np.random.default_rng(0)
        cand = jnp.asarray(rng.integers(0, 128, (16, 9)).astype(np.int32))
        cand_side = tuple(jnp.take(a, cand, axis=0) for a in item_side[:5])
        got = xla_attention_candidate_scores(head, user_side, cand_side)
        want = np.take_along_axis(ex, np.asarray(cand), axis=1)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-6)

    def test_candidate_scores_plane_form_matches_dense(self):
        """The plane-form rescore (production; no minor-5 tensors) equals
        the literal dense-tensor form it replaced."""
        from pixelrec_multimodal_tpu.ops.attention_cascade import (
            _xla_attention_candidate_scores_dense,
        )
        model = make_model(heads=2)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=16, C=128)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        rng = np.random.default_rng(5)
        cand = jnp.asarray(rng.integers(0, 128, (16, 11)).astype(np.int32))
        cand_side = tuple(jnp.take(a, cand, axis=0) for a in item_side[:5])
        plane = xla_attention_candidate_scores(head, user_side, cand_side)
        dense = _xla_attention_candidate_scores_dense(head, user_side,
                                                      cand_side)
        np.testing.assert_allclose(np.asarray(plane), np.asarray(dense),
                                   rtol=1e-5, atol=1e-6)

    def test_unpack_candidate_rows_roundtrip(self):
        """Packed gather -> unpack equals gathering the padded tables."""
        model = make_model(heads=2, emb=8)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        # Force a pack by pretending d < dp (emb 8 pads to 128 lanes).
        assert head['d'] < head['dp']
        item_feats, _, _ = sides(model, variables, B=4, C=12)
        item_side = compute_item_side_attention(head, item_feats)
        packed = pack_attention_tables(head, item_side)
        rng = np.random.default_rng(1)
        cand = jnp.asarray(rng.integers(0, 12, (3, 5)).astype(np.int32))
        rows_packed = tuple(jnp.take(a, cand, axis=0) for a in packed[:5])
        rows = unpack_candidate_rows(head, rows_packed)
        want = tuple(jnp.take(a, cand, axis=0) for a in item_side[:5])
        for a, b in zip(rows, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_candidate_screen_matches_screen_columns(self):
        """The gathered token0 candidate screen (the funnel cascade's
        middle stage) equals the all-pairs token0 screen at the gathered
        columns."""
        from pixelrec_multimodal_tpu.ops.attention_cascade import (
            xla_attention_screen_candidate_scores,
        )
        model = make_model(heads=2)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        item_feats, user_emb, _ = sides(model, variables, B=16, C=128)
        item_side = compute_item_side_attention(head, item_feats)
        user_side = compute_user_side_attention(head, user_emb)
        tail = compute_screen_tail(head, item_side)
        full = np.asarray(
            xla_attention_screen_scores(head, user_side, item_side, tail))
        rng = np.random.default_rng(2)
        cand = jnp.asarray(rng.integers(0, 128, (16, 9)).astype(np.int32))
        got = np.asarray(xla_attention_screen_candidate_scores(
            head, user_side,
            (jnp.take(item_side[2], cand, axis=0),
             jnp.take(item_side[3], cand, axis=0)),
            jnp.take(tail, cand, axis=0)))
        want = np.take_along_axis(full, np.asarray(cand), axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_unpack_candidate_screen_rows_matches_padded(self):
        """The funnel's two-table unpack equals the full-row unpack on
        the (it_k, it_vo) pair."""
        from pixelrec_multimodal_tpu.ops.attention_cascade import (
            unpack_candidate_screen_rows,
        )
        model = make_model(heads=2, emb=8)
        variables = init_variables(model)
        head = build_attention_head(variables, model)
        assert head['d'] < head['dp']
        item_feats, _, _ = sides(model, variables, B=4, C=12)
        item_side = compute_item_side_attention(head, item_feats)
        packed = pack_attention_tables(head, item_side)
        rng = np.random.default_rng(3)
        cand = jnp.asarray(rng.integers(0, 12, (3, 5)).astype(np.int32))
        k_rows, vo_rows = unpack_candidate_screen_rows(
            head, jnp.take(packed[2], cand, axis=0),
            jnp.take(packed[3], cand, axis=0))
        np.testing.assert_array_equal(
            np.asarray(k_rows),
            np.asarray(jnp.take(item_side[2], cand, axis=0)))
        np.testing.assert_array_equal(
            np.asarray(vo_rows),
            np.asarray(jnp.take(item_side[3], cand, axis=0)))


class TestCascadeScorer:
    def setup_method(self, _):
        self.model = make_model()
        self.variables = init_variables(self.model)
        self.store = make_store()

    def make_scorer(self, **kw):
        return CatalogScorer(self.model, self.variables, self.store,
                             item_chunk=128, user_chunk=8, **kw)

    @pytest.mark.parametrize('screen', ['additive', 'token0', 'funnel'])
    def test_full_coverage_cascade_equals_exact(self, screen):
        sc = self.make_scorer()
        users = np.arange(6, dtype=np.int32)
        seen = np.zeros((6, N_ITEMS), bool)
        seen[0, :3] = True
        seen[2, 5:9] = True
        ve, ie = sc.top_k(users, 5, seen_mask=seen)
        vc, ic = sc.top_k_cascade(users, 5, n_candidates=N_ITEMS,
                                  seen_mask=seen, screen=screen,
                                  funnel_c1=N_ITEMS)
        np.testing.assert_array_equal(ic, ie)
        np.testing.assert_allclose(vc, ve, rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize('screen', ['additive', 'token0'])
    def test_calibration_monotone_and_complete(self, screen):
        sc = self.make_scorer()
        users = np.arange(6, dtype=np.int32)
        rec = sc.calibrate_cascade(users, 5, candidate_grid=(8, 16, N_ITEMS),
                                   screen=screen)
        vals = [rec[c] for c in sorted(rec)]
        assert vals == sorted(vals)
        assert rec[min(N_ITEMS, sc.n_items)] == 1.0

    def test_calibrate_funnel_bounds_and_monotone(self):
        """Funnel recall: 1.0 at full coverage, bounded above by the
        additive tier's recall@C1, monotone in both C1 and C2."""
        sc = self.make_scorer()
        users = np.arange(6, dtype=np.int32)
        rec_f = sc.calibrate_funnel(users, 5, c1_grid=(8, 16, N_ITEMS),
                                    c2_grid=(4, 8, N_ITEMS))
        rec_a = sc.calibrate_cascade(users, 5,
                                     candidate_grid=(8, 16, N_ITEMS),
                                     screen='additive')
        assert rec_f[(N_ITEMS, N_ITEMS)] == 1.0
        for (c1, c2), r in rec_f.items():
            assert r <= rec_a[c1] + 1e-9, (c1, c2)
        for c2 in (4, 8):
            vals = [rec_f[(c1, c2)] for c1 in (8, 16, N_ITEMS)]
            assert vals == sorted(vals)
        for c1 in (16, N_ITEMS):
            vals = [rec_f[(c1, c2)] for c2 in (4, 8) if c2 <= c1]
            assert vals == sorted(vals)

    def test_funnel_respects_seen_mask(self):
        """Seen items never surface through the funnel's stage-2
        rescore, even when C1 covers the whole catalog (the sv1-mask
        hardening)."""
        sc = self.make_scorer()
        users = np.arange(4, dtype=np.int32)
        seen = np.zeros((4, N_ITEMS), bool)
        seen[:, ::2] = True
        _, ic = sc.top_k_cascade(users, 5, n_candidates=N_ITEMS,
                                 seen_mask=seen, screen='funnel',
                                 funnel_c1=N_ITEMS)
        assert not np.any((ic >= 0) & (ic % 2 == 0))

    def test_cascade_rejects_unknown_screen(self):
        sc = self.make_scorer()
        with pytest.raises(ValueError, match='screen'):
            sc.top_k_cascade(np.arange(2, dtype=np.int32), 3,
                             screen='nope')

    def test_cascade_requires_attention_head(self):
        from pixelrec_multimodal_tpu.models.multimodal import (
            MultimodalRecommender,
        )
        model = MultimodalRecommender(
            n_users=8, n_items=N_ITEMS, n_tags=N_TAGS,
            num_numerical_features=2, embedding_dim=8,
            vision_feature_dim=6, language_feature_dim=5,
            use_contrastive=False, fusion_hidden_dims=(32, 16),
            fusion_type='concatenate')
        variables = init_variables(model)
        sc = CatalogScorer(model, variables, self.store, item_chunk=128,
                           user_chunk=8)
        with pytest.raises(ValueError, match='attention'):
            sc.top_k_cascade(np.arange(2, dtype=np.int32), 3)

    def test_cascade_packed_tables(self, monkeypatch):
        """The lane-packed big-table branch: tail stored packed, screen
        re-pads per chunk, rescore unpacks gathered rows."""
        monkeypatch.setattr(CatalogScorer, '_PACK_BYTES', 1)
        packed = self.make_scorer(attention_variant='gram')
        assert packed._attn_packed
        plain = self.make_scorer(attention_variant='gram')
        # monkeypatch still active; build a non-packed control explicitly
        monkeypatch.setattr(CatalogScorer, '_PACK_BYTES', 4 << 30)
        plain = self.make_scorer(attention_variant='gram')
        assert not plain._attn_packed
        users = np.arange(5, dtype=np.int32)
        for screen in ('additive', 'token0', 'funnel'):
            vp, ip = packed.top_k_cascade(users, 4, n_candidates=16,
                                          screen=screen, funnel_c1=18)
            vn, iq = plain.top_k_cascade(users, 4, n_candidates=16,
                                         screen=screen, funnel_c1=18)
            np.testing.assert_array_equal(ip, iq)
            np.testing.assert_allclose(vp, vn, rtol=1e-4, atol=1e-5)

    def test_additive_floor_warning(self, capsys):
        """An explicit n_candidates below the additive tier's operating
        floor warns about re-calibration (ADVICE r4: a C calibrated for
        token0 silently under-recalls on additive)."""
        sc = self.make_scorer()
        users = np.arange(4, dtype=np.int32)
        sc.top_k_cascade(users, 3, n_candidates=8, screen='additive')
        assert 'operating floor' in capsys.readouterr().err
        sc.top_k_cascade(users, 3, n_candidates=8, screen='token0')
        assert 'operating floor' not in capsys.readouterr().err

    def test_rescore_candidate_axis_chunking(self):
        """_rescore_attention's candidate-axis sub-blocks (C > 256,
        C % 256 == 0) produce the same scores as the un-chunked math."""
        sc = self.make_scorer()
        rng = np.random.default_rng(7)
        users = np.arange(4, dtype=np.int32)
        cand = rng.integers(0, N_ITEMS, (4, 512)).astype(np.int32)
        got = sc._rescore_blocks(users, cand)
        want = sc._rescore_blocks(users, cand[:, :256])
        np.testing.assert_allclose(got[:, :256], want, rtol=1e-5, atol=1e-6)
        # exact columns: compare a few against score_candidates
        direct = sc.score_candidates(users, cand[:, :16])
        np.testing.assert_allclose(got[:, :16], direct, rtol=1e-5, atol=1e-6)

    def test_auto_cascade_installs_plan_and_routes(self, capsys):
        """auto_cascade on a grid that reaches full coverage installs a
        plan; top_k then routes through the cascade and (at full
        coverage) still equals the exact scan; _exact bypasses."""
        sc = self.make_scorer()
        users = np.arange(6, dtype=np.int32)
        ve, ie = sc.top_k(users, 5)
        plan = sc.auto_cascade(users, 5, max_candidate_frac=1.0,
                               min_speedup=0.0)
        assert plan is not None
        assert plan['recall'] == 1.0
        assert sc._cascade_plan is not None
        va, ia = sc.top_k(users, 5)          # routed through the cascade
        np.testing.assert_array_equal(ia, ie)
        np.testing.assert_allclose(va, ve, rtol=2e-4, atol=2e-5)
        vx, ix = sc.top_k(users, 5, _exact=True)
        np.testing.assert_array_equal(ix, ie)
        # k above the calibrated plan k does NOT route
        v8, i8 = sc.top_k(users, 8)
        vx8, ix8 = sc.top_k(users, 8, _exact=True)
        np.testing.assert_array_equal(i8, ix8)
        sc.disable_cascade()
        assert sc._cascade_plan is None

    def test_auto_cascade_falls_back_when_recall_short(self):
        """With the default max_candidate_frac the 20-item catalog caps
        the grid at C=2 — recall@2 of a random-init screen cannot cover
        k=5, so no plan installs and top_k stays the exact scan."""
        sc = self.make_scorer()
        users = np.arange(6, dtype=np.int32)
        plan = sc.auto_cascade(users, 5)
        assert plan is None
        assert sc._cascade_plan is None

    def test_auto_cascade_relaxed_recall_target(self):
        """recall_target < 1.0 admits approximate tiers: with a near-zero
        target even the tiny capped grid calibrates, and the installed
        plan records the measured (sub-1.0) recall."""
        sc = self.make_scorer()
        users = np.arange(6, dtype=np.int32)
        plan = sc.auto_cascade(users, 5, recall_target=0.05,
                               min_speedup=0.0)
        assert plan is not None
        assert plan['recall'] >= 0.05
        sc.disable_cascade()

    def test_auto_cascade_requires_attention(self):
        from pixelrec_multimodal_tpu.models.multimodal import (
            MultimodalRecommender,
        )
        model = MultimodalRecommender(
            n_users=8, n_items=N_ITEMS, n_tags=N_TAGS,
            num_numerical_features=2, embedding_dim=8,
            vision_feature_dim=6, language_feature_dim=5,
            use_contrastive=False, fusion_hidden_dims=(32, 16),
            fusion_type='concatenate')
        variables = init_variables(model)
        sc = CatalogScorer(model, variables, self.store, item_chunk=128,
                           user_chunk=8)
        with pytest.raises(ValueError, match='attention'):
            sc.auto_cascade(np.arange(2, dtype=np.int32), 3)

    def test_score_candidates_attention_fast_matches_generic(self):
        sc = self.make_scorer()
        slow = self.make_scorer(fast_path=False)
        rng = np.random.default_rng(3)
        users = np.arange(6, dtype=np.int32)
        cand = rng.integers(0, N_ITEMS, (6, 7)).astype(np.int32)
        mask = rng.random((6, 7)) > 0.2
        vf = sc.score_candidates(users, cand, mask)
        vs = slow.score_candidates(users, cand, mask)
        np.testing.assert_allclose(vf, vs, rtol=2e-4, atol=2e-5)


class TestCascadeMesh:
    def test_sharded_cascade_matches_single_device(self):
        from pixelrec_multimodal_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip('needs 8 simulated devices')
        model = make_model()
        variables = init_variables(model)
        store = make_store()
        single = CatalogScorer(model, variables, store, item_chunk=32,
                               user_chunk=8)
        mesh = make_mesh(model_parallel=4)
        meshed = CatalogScorer(model, variables, store, item_chunk=32,
                               user_chunk=8, mesh=mesh)
        users = np.arange(6, dtype=np.int32)
        for screen in ('additive', 'token0', 'funnel'):
            vs, is_ = single.top_k_cascade(users, 4, n_candidates=16,
                                           screen=screen, funnel_c1=18)
            vm, im = meshed.top_k_cascade(users, 4, n_candidates=16,
                                          screen=screen, funnel_c1=18)
            np.testing.assert_array_equal(im, is_)
            np.testing.assert_allclose(vm, vs, rtol=1e-4, atol=1e-5)
