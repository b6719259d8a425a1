"""Unit tests for preprocessing utilities and processors."""
import random

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from pixelrec_multimodal_tpu.config import (
    ImageValidationConfig,
    OfflineImageCompressionConfig,
    OfflineTextCleaningConfig,
)
from pixelrec_multimodal_tpu.data.preprocessing import (
    augment_text,
    check_image_dimensions,
    is_image_corrupted,
    normalize_features,
    normalize_unicode_text,
    remove_html_tags,
)
from pixelrec_multimodal_tpu.data.processors import (
    DataFilter,
    ImageProcessor,
    NumericalProcessor,
    TextProcessor,
)


class TestTextUtils:
    def test_remove_html(self):
        assert remove_html_tags('<b>hi</b> there<br/>') == 'hi there'
        assert remove_html_tags(123) == 123

    def test_normalize_unicode(self):
        assert normalize_unicode_text('ﬁsh') == 'fish'  # NFKC folds ligature

    def test_augment_none(self):
        assert augment_text('a b c', 'none') == 'a b c'
        assert augment_text('', 'random_delete') == ''

    def test_augment_delete_deterministic(self):
        r = random.Random(0)
        out = augment_text('a b c d e', 'random_delete', delete_prob=1.0, rng=r)
        assert out == ''

    def test_augment_swap(self):
        r = random.Random(0)
        out = augment_text('a b', 'random_swap', swap_prob=1.0, rng=r)
        assert out == 'b a'


class TestNormalizeFeatures:
    def test_standardization_fit(self):
        x = np.array([[1.0], [2.0], [3.0]])
        out, scaler = normalize_features(x, 'standardization')
        assert scaler is not None
        np.testing.assert_allclose(out.mean(), 0.0, atol=1e-7)

    def test_reuse_scaler(self):
        x = np.array([[1.0], [2.0], [3.0]])
        _, scaler = normalize_features(x, 'standardization')
        out2, _ = normalize_features(np.array([[2.0]]), 'standardization', scaler)
        np.testing.assert_allclose(out2, [[0.0]], atol=1e-7)

    def test_log1p_and_none(self):
        x = np.array([0.0, 1.0])
        out, s = normalize_features(x, 'log1p')
        assert s is None
        np.testing.assert_allclose(out.ravel(), np.log1p(x))
        out, s = normalize_features(x, 'none')
        assert s is None


class TestImageChecks:
    def test_corrupted_and_dims(self, tmp_path):
        p = tmp_path / 'ok.jpg'
        Image.new('RGB', (100, 80), 'red').save(p)
        assert not is_image_corrupted(str(p))
        assert check_image_dimensions(str(p), 64, 64)
        assert not check_image_dimensions(str(p), 101, 64)
        bad = tmp_path / 'bad.jpg'
        bad.write_bytes(b'not an image')
        assert is_image_corrupted(str(bad))
        assert not check_image_dimensions(str(bad), 1, 1)


class TestImageProcessorOnline:
    def test_load_and_transform_shape(self, tmp_path):
        p = tmp_path / 'x.jpg'
        Image.new('RGB', (320, 200), (120, 50, 200)).save(p)
        ip = ImageProcessor(model_name='resnet')
        out = ip.load_and_transform_image(str(p))
        assert out.shape == (3, 224, 224)
        assert out.dtype == np.float32
        assert np.isfinite(out).all()

    def test_missing_image_placeholder(self):
        ip = ImageProcessor(model_name='clip')
        out = ip.load_and_transform_image('/nonexistent/x.jpg')
        assert out.shape == (3, 224, 224)
        assert np.all(out == 0)

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError):
            ImageProcessor(model_name='nope')


class TestImageProcessorOffline:
    def test_validate_and_copy(self, tmp_path):
        src, dst = tmp_path / 'src', tmp_path / 'dst'
        src.mkdir()
        Image.new('RGB', (100, 100), 'blue').save(src / 'a.jpg')
        Image.new('RGB', (10, 10), 'blue').save(src / 'tiny.jpg')  # too small
        (src / 'broken.jpg').write_bytes(b'xx')
        ip = ImageProcessor(
            validation_config=ImageValidationConfig(min_width=64, min_height=64),
            compression_config=OfflineImageCompressionConfig(enabled=False))
        valid = ip.process_items_images(['a', 'tiny', 'broken', 'missing'], src, dst)
        assert valid == {'a'}
        assert (dst / 'a.jpg').exists()

    def test_compression_resize(self, tmp_path):
        src, dst = tmp_path / 'src', tmp_path / 'dst'
        src.mkdir()
        # Large noisy image so it exceeds the compress threshold.
        arr = np.random.default_rng(0).integers(0, 255, (2500, 3000, 3), np.uint8)
        Image.fromarray(arr).save(src / 'big.jpg', quality=98)
        ip = ImageProcessor(
            validation_config=ImageValidationConfig(),
            compression_config=OfflineImageCompressionConfig(
                enabled=True, compress_if_kb_larger_than=10,
                resize_target_longest_edge=1024))
        valid = ip.process_items_images(['big'], src, dst)
        assert valid == {'big'}
        with Image.open(dst / 'big.jpg') as img:
            assert max(img.size) <= 1024


class TestTextProcessor:
    def test_clean_field(self):
        tp = TextProcessor(cleaning_config=OfflineTextCleaningConfig())
        assert tp.clean_text_field('<p>Hello   World</p>') == 'hello world'
        assert tp.clean_text_field(None) == ''

    def test_clean_dataframe(self):
        tp = TextProcessor(cleaning_config=OfflineTextCleaningConfig())
        df = pd.DataFrame({'title': ['<b>A</b>', 'B  C'], 'other': [1, 2]})
        out = tp.clean_dataframe_text_columns(df, ['title', 'missing'])
        assert list(out['title']) == ['a', 'b c']
        assert list(out['other']) == [1, 2]

    def test_online_tokenize_shapes(self):
        tp = TextProcessor(model_name='sentence-bert', max_length=32)
        out = tp.process_text('hello world')
        assert out['text_input_ids'].shape == (32,)
        assert out['text_attention_mask'].shape == (32,)
        assert out['text_attention_mask'].sum() >= 3  # cls + 2 words + sep
        ph = tp.get_placeholder_tensors()
        assert ph['text_input_ids'].shape == (32,)
        assert ph['text_attention_mask'].sum() == 0

    def test_tokenize_deterministic(self):
        tp = TextProcessor(model_name='bert', max_length=16)
        a = tp.process_text('same text')
        b = tp.process_text('same text')
        np.testing.assert_array_equal(a['text_input_ids'], b['text_input_ids'])

    def test_combined_text(self):
        tp = TextProcessor(cleaning_config=OfflineTextCleaningConfig())
        row = pd.Series({'a': 'x', 'b': None, 'c': ' y '})
        assert tp.get_combined_text(row, ['a', 'b', 'c']) == 'x y'


class TestNumericalProcessor:
    def _df(self):
        return pd.DataFrame({
            'item_id': ['i1', 'i2', 'i3'],
            'views': [10.0, 20.0, 30.0],
            'likes': [1.0, np.nan, 3.0],
        })

    def test_fit_transform_row(self):
        np_proc = NumericalProcessor(['views', 'likes'], 'standardization')
        np_proc.fit_scaler(self._df(), ['views', 'likes'])
        feats = np_proc.get_features(self._df().iloc[0])
        assert feats.shape == (2,)
        assert feats.dtype == np.float32

    def test_matrix_matches_rows(self):
        df = self._df()
        np_proc = NumericalProcessor(['views', 'likes'], 'standardization')
        np_proc.fit_scaler(df, ['views', 'likes'])
        mat = np_proc.transform_matrix(df)
        assert mat.shape == (3, 2)
        for i in range(3):
            np.testing.assert_allclose(mat[i], np_proc.get_features(df.iloc[i]),
                                       rtol=1e-5)

    def test_save_load_scaler(self, tmp_path):
        np_proc = NumericalProcessor(['views'], 'standardization')
        np_proc.fit_scaler(self._df(), ['views'])
        path = tmp_path / 'scaler.pkl'
        assert np_proc.save_scaler(path)
        np2 = NumericalProcessor(['views'], 'standardization')
        assert np2.load_scaler(path)
        assert np2.fitted_columns == ['views']
        np.testing.assert_allclose(
            np2.get_features(self._df().iloc[1]),
            np_proc.get_features(self._df().iloc[1]))

    def test_empty_cols(self):
        np_proc = NumericalProcessor([], 'none')
        assert np_proc.get_features(pd.Series({'x': 1})).shape == (0,)

    def test_log1p(self):
        np_proc = NumericalProcessor(['views'], 'log1p')
        out = np_proc.get_features(self._df().iloc[0])
        np.testing.assert_allclose(out, np.log1p([10.0]), rtol=1e-6)


class TestDataFilter:
    def _interactions(self):
        return pd.DataFrame({
            'user_id': ['u1'] * 5 + ['u2'] * 2 + ['u3'] * 5,
            'item_id': ['a', 'b', 'a', 'b', 'c', 'a', 'b', 'a', 'b', 'a', 'b', 'c'],
        })

    def test_filter_by_valid_items(self):
        out = DataFilter.filter_interactions_by_valid_items(
            self._interactions(), {'a', 'b'})
        assert set(out['item_id']) == {'a', 'b'}

    def test_activity_filter_items_then_users(self):
        out = DataFilter.filter_by_activity(self._interactions(),
                                            min_user_interactions=3,
                                            min_item_interactions=3)
        assert 'c' not in set(out['item_id'])  # item c has 2 < 3
        assert 'u2' not in set(out['user_id'])  # u2 has 2 < 3 after item filter

    def test_align_item_info(self):
        items = pd.DataFrame({'item_id': ['a', 'b', 'c', 'z']})
        out = DataFilter.align_item_info_with_interactions(
            items, self._interactions())
        assert set(out['item_id']) == {'a', 'b', 'c'}

    def test_stats(self):
        inter = self._interactions()
        items = pd.DataFrame({'item_id': ['a', 'b', 'c']})
        stats = DataFilter.get_filtering_stats(inter, inter.iloc[:6], items,
                                               items.iloc[:2])
        assert stats['interactions']['retention_rate'] == 0.5
        assert stats['items']['filtered'] == 2
