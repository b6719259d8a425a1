"""Unit tests for splitting strategies (parity with reference splitting.py)."""
import numpy as np
import pandas as pd
import pytest

from pixelrec_multimodal_tpu.data.splitting import DataSplitter, create_robust_splits


def make_interactions(n_users=20, items_per_user=8, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        items = rng.choice(50, size=items_per_user, replace=False)
        for it in items:
            rows.append((f'u{u}', f'i{it}', 'tagA' if it % 2 else 'tagB'))
    df = pd.DataFrame(rows, columns=['user_id', 'item_id', 'tag'])
    # Interleaved timestamps so every user has both old and new interactions.
    df['timestamp'] = rng.permutation(len(df))
    return df


class TestLeaveOneOut:
    def test_basic(self):
        df = make_interactions()
        tr, va, te = DataSplitter(42).leave_one_out_split(df)
        assert len(va) == df['user_id'].nunique()
        assert len(te) == df['user_id'].nunique()
        assert len(tr) + len(va) + len(te) == len(df)
        # Test holds each user's latest interaction.
        latest = df.sort_values('timestamp').groupby('user_id').tail(1)
        assert set(zip(te['user_id'], te['item_id'])) == \
            set(zip(latest['user_id'], latest['item_id']))

    def test_short_histories_to_train(self):
        df = pd.DataFrame({
            'user_id': ['u1', 'u1', 'u2', 'u2', 'u2'],
            'item_id': ['a', 'b', 'c', 'd', 'e'],
            'timestamp': [1, 2, 3, 4, 5],
        })
        tr, va, te = DataSplitter(42).leave_one_out_split(df)
        assert set(tr[tr['user_id'] == 'u1']['item_id']) == {'a', 'b'}
        assert list(va['item_id']) == ['d']
        assert list(te['item_id']) == ['e']

    def test_requires_timestamp(self):
        with pytest.raises(ValueError):
            DataSplitter(42).leave_one_out_split(
                pd.DataFrame({'user_id': ['u'], 'item_id': ['i']}))


class TestTemporal:
    def test_temporal_order(self):
        df = make_interactions()
        tr, va = DataSplitter(42).temporal_split(df, train_ratio=0.8)
        assert tr['timestamp'].max() <= va['timestamp'].min()
        assert len(tr) == int(len(df) * 0.8)

    def test_stratified_temporal_three_way(self):
        df = make_interactions()
        tr, va, te = DataSplitter(42).stratified_temporal_split(
            df, stratify_by='tag')
        assert set(va['user_id']).issubset(set(tr['user_id']))
        assert set(te['user_id']).issubset(set(tr['user_id']))
        assert list(tr.columns) == ['user_id', 'item_id', 'timestamp']


class TestUserItemSplits:
    def test_user_disjoint(self):
        df = make_interactions()
        tr, va = DataSplitter(42).user_based_split(df, min_interactions_per_user=5)
        assert not (set(tr['user_id']) & set(va['user_id']))

    def test_item_disjoint(self):
        df = make_interactions()
        tr, va = DataSplitter(42).item_based_split(df, min_interactions_per_item=1)
        assert not (set(tr['item_id']) & set(va['item_id']))

    def test_user_split_no_valid_users(self):
        df = make_interactions(items_per_user=2)
        with pytest.raises(ValueError):
            DataSplitter(42).user_based_split(df, min_interactions_per_user=100)


class TestStratified:
    def test_per_user_ratio(self):
        df = make_interactions(items_per_user=10)
        tr, va = DataSplitter(42).stratified_split(df, train_ratio=0.8)
        assert len(tr) + len(va) == len(df)
        # Every user appears in both sets (each has 10 >= 3 interactions).
        assert set(tr['user_id']) == set(df['user_id'])
        assert set(va['user_id']) == set(df['user_id'])
        per_user_train = tr.groupby('user_id').size()
        assert (per_user_train == 8).all()

    def test_reproducible(self):
        df = make_interactions()
        tr1, _ = DataSplitter(7).stratified_split(df)
        tr2, _ = DataSplitter(7).stratified_split(df)
        pd.testing.assert_frame_equal(
            tr1.sort_values(['user_id', 'item_id']).reset_index(drop=True),
            tr2.sort_values(['user_id', 'item_id']).reset_index(drop=True))

    def test_short_users_all_train(self):
        df = pd.DataFrame({
            'user_id': ['u1', 'u1', 'u2', 'u2', 'u2', 'u2'],
            'item_id': list('abcdef'),
            'timestamp': range(6),
        })
        tr, va = DataSplitter(42).stratified_split(df, min_interactions_per_user=3)
        assert set(tr[tr['user_id'] == 'u1']['item_id']) == {'a', 'b'}
        assert (va['user_id'] == 'u2').all()


class TestColumnStratified:
    def test_ratios_and_balance(self):
        df = make_interactions(n_users=40)
        tr, va, te = DataSplitter(42).column_stratified_split(
            df, 0.6, 0.2, 0.2, stratify_by='tag')
        assert abs(len(tr) - 0.6 * len(df)) <= 2
        assert abs(len(va) - 0.2 * len(df)) <= 2
        # Tag proportions roughly preserved (stratify_by not in output cols).
        assert list(tr.columns) == ['user_id', 'item_id', 'timestamp']

    def test_bad_ratios(self):
        df = make_interactions()
        with pytest.raises(ValueError):
            DataSplitter(42).column_stratified_split(df, 0.5, 0.2, 0.2,
                                                     stratify_by='tag')
        with pytest.raises(ValueError):
            DataSplitter(42).column_stratified_split(df, stratify_by='missing')


class TestMixedAndStats:
    def test_mixed_split_keys(self):
        df = make_interactions(n_users=30)
        out = DataSplitter(42).mixed_split(df)
        assert set(out) == {'train', 'val_warm', 'val_cold_user',
                            'val_cold_item', 'val_cold_both'}

    def test_statistics(self):
        df = make_interactions()
        s = DataSplitter(42)
        tr, va = s.simple_random_split(df)
        stats = s.get_split_statistics(tr, va)
        assert stats['train_interactions'] == len(tr)
        assert 0 <= stats['user_overlap_ratio_val'] <= 1
        tr2, va2, te2 = s.leave_one_out_split(df)
        stats3 = s.get_split_statistics(tr2, va2, te2)
        assert 'test_interactions' in stats3


class TestFactory:
    def test_dispatch(self):
        df = make_interactions()
        out = create_robust_splits(df, 'leave_one_out', random_state=42)
        assert len(out) == 3
        out = create_robust_splits(df, 'simple_random', train_ratio=0.5)
        assert len(out) == 2
        assert abs(len(out[0]) - 0.5 * len(df)) <= 1

    def test_kwarg_whitelisting(self):
        df = make_interactions()
        # Unknown kwargs are silently dropped, not passed through.
        out = create_robust_splits(df, 'temporal', train_ratio=0.7,
                                   bogus_kwarg=123)
        assert len(out) == 2

    def test_unknown_strategy(self):
        with pytest.raises(ValueError):
            create_robust_splits(make_interactions(), 'nope')
