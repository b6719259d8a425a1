"""Numerical parity tests: Flax encoder zoo vs Hugging Face torch modules.

Strategy: instantiate each HF architecture from a small config (random
weights, no hub downloads), convert the state_dict with encoders/convert.py,
and compare pooled outputs — proving the converters and Flax architectures
match the reference's backbones bit-for-bit (up to float32 tolerance)
without needing network access.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402

from pixelrec_multimodal_tpu.encoders.clip import (  # noqa: E402
    CLIPTextConfig as JCLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig as JCLIPVisionConfig,
    CLIPVisionTower,
)
from pixelrec_multimodal_tpu.encoders.convert import (  # noqa: E402
    convert_bert_family,
    convert_clip_text,
    convert_clip_vision,
    convert_convnext,
    convert_dinov2,
    convert_resnet,
)
from pixelrec_multimodal_tpu.encoders.convnext import (  # noqa: E402
    ConvNextConfig as JConvNextConfig,
    ConvNextTower,
)
from pixelrec_multimodal_tpu.encoders.dinov2 import (  # noqa: E402
    Dinov2Config as JDinov2Config,
    Dinov2Tower,
)
from pixelrec_multimodal_tpu.encoders.resnet import (  # noqa: E402
    ResNetConfig as JResNetConfig,
    ResNetTower,
)
from pixelrec_multimodal_tpu.encoders.text_models import (  # noqa: E402
    TextEncoderConfig,
    TextTransformer,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def _ids(batch=2, seq=12, vocab=100, pad_from=8, pad_id=0, seed=0):
    rng = np.random.default_rng(seed)
    lo = 5 if pad_id < 5 else pad_id + 2
    ids = rng.integers(lo, vocab, (batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    ids[1, pad_from:] = pad_id
    mask[1, pad_from:] = 0
    return ids, mask


def _images(batch=2, size=28, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, 3, size, size)).astype(np.float32)


class TestBertParity:
    def test_bert(self):
        from transformers import BertConfig, BertModel
        hf = BertModel(BertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)).eval()
        cfg = TextEncoderConfig(vocab_size=100, hidden_size=32, num_layers=2,
                                num_heads=2, intermediate_size=64)
        model = TextTransformer(cfg)
        params = convert_bert_family(hf.state_dict(), num_layers=2)
        ids, mask = _ids()
        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(mask).long())
        last, pooled = model.apply({'params': params}, ids, mask)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)
        np.testing.assert_allclose(np.asarray(last),
                                   out.last_hidden_state.numpy(), **TOL)

    def test_roberta_position_offset(self):
        from transformers import RobertaConfig, RobertaModel
        hf = RobertaModel(RobertaConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=20, pad_token_id=1, type_vocab_size=1,
            layer_norm_eps=1e-5,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)).eval()
        cfg = TextEncoderConfig(vocab_size=100, hidden_size=32, num_layers=2,
                                num_heads=2, intermediate_size=64,
                                max_position_embeddings=20, type_vocab_size=1,
                                layer_norm_eps=1e-5, pad_token_id=1,
                                position_style='absolute_offset')
        model = TextTransformer(cfg)
        params = convert_bert_family(hf.state_dict(), num_layers=2)
        ids, mask = _ids(pad_id=1)
        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(mask).long())
        _, pooled = model.apply({'params': params}, ids, mask)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)

    def test_mpnet_relative_bias(self):
        from transformers import MPNetConfig, MPNetModel
        hf = MPNetModel(MPNetConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=20, layer_norm_eps=1e-5,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)).eval()
        cfg = TextEncoderConfig(vocab_size=100, hidden_size=32, num_layers=2,
                                num_heads=2, intermediate_size=64,
                                max_position_embeddings=20, type_vocab_size=0,
                                layer_norm_eps=1e-5, pad_token_id=1,
                                position_style='absolute_offset',
                                use_relative_bias=True)
        model = TextTransformer(cfg)
        params = convert_bert_family(hf.state_dict(), num_layers=2,
                                     has_relative_bias=True)
        ids, mask = _ids(pad_id=1)
        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(mask).long())
        _, pooled = model.apply({'params': params}, ids, mask)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)


class TestCLIPParity:
    def test_vision(self):
        from transformers import CLIPVisionConfig, CLIPVisionModel
        hf = CLIPVisionModel(CLIPVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, image_size=28, patch_size=14)).eval()
        model = CLIPVisionTower(JCLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
            image_size=28, patch_size=14))
        params = convert_clip_vision(hf.state_dict(), num_layers=2)
        x = _images()
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        _, pooled = model.apply({'params': params}, x)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)

    def test_text_eot_pooling(self):
        from transformers import CLIPTextConfig, CLIPTextModel
        hf = CLIPTextModel(CLIPTextConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=16, eos_token_id=99,
            bos_token_id=98)).eval()
        model = CLIPTextTower(JCLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, max_position_embeddings=16))
        params = convert_clip_text(hf.state_dict(), num_layers=2)
        # CLIP-style sequences: bos ... eos (= highest id) then pad with 0s.
        rng = np.random.default_rng(0)
        ids = np.zeros((2, 12), np.int32)
        for b, length in enumerate((12, 8)):
            ids[b, 0] = 98
            ids[b, 1:length - 1] = rng.integers(5, 90, length - 2)
            ids[b, length - 1] = 99
        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(ids).long())
        _, pooled = model.apply({'params': params}, ids)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)


class TestVisionParity:
    def test_dinov2(self):
        from transformers import Dinov2Config, Dinov2Model
        hf = Dinov2Model(Dinov2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=28, patch_size=14, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)).eval()
        model = Dinov2Tower(JDinov2Config(
            hidden_size=32, num_layers=2, num_heads=2, patch_size=14,
            pos_embed_grid=2))
        params = convert_dinov2(hf.state_dict(), num_layers=2)
        x = _images(size=28)
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        _, pooled = model.apply({'params': params}, x)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)

    def test_resnet(self):
        from transformers import ResNetConfig, ResNetModel
        hf = ResNetModel(ResNetConfig(
            embedding_size=8, hidden_sizes=[16, 32], depths=[2, 2])).eval()
        model = ResNetTower(JResNetConfig(
            embedding_size=8, hidden_sizes=(16, 32), depths=(2, 2)))
        params = convert_resnet(hf.state_dict(), depths=(2, 2))
        x = _images(size=64)
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        _, pooled = model.apply({'params': params}, x)
        hf_pooled = out.pooler_output.squeeze(-1).squeeze(-1).numpy()
        np.testing.assert_allclose(np.asarray(pooled), hf_pooled, **TOL)

    def test_resnet_odd_input_uses_canonical_stem(self):
        # Odd spatial dims can't pack 2x2 blocks; the tower must fall back
        # to the canonical 7x7/s2 stem and still match torch.
        from transformers import ResNetConfig, ResNetModel
        hf = ResNetModel(ResNetConfig(
            embedding_size=8, hidden_sizes=[16, 32], depths=[2, 2])).eval()
        model = ResNetTower(JResNetConfig(
            embedding_size=8, hidden_sizes=(16, 32), depths=(2, 2)))
        params = convert_resnet(hf.state_dict(), depths=(2, 2))
        x = _images(size=63)
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        hf_pooled = out.pooler_output.squeeze(-1).squeeze(-1).numpy()
        _, pooled = model.apply({'params': params}, x)
        np.testing.assert_allclose(np.asarray(pooled), hf_pooled, **TOL)

    def test_convnext(self):
        from transformers import ConvNextConfig, ConvNextModel
        hf = ConvNextModel(ConvNextConfig(
            hidden_sizes=[8, 16, 24, 32], depths=[1, 1, 2, 1])).eval()
        model = ConvNextTower(JConvNextConfig(
            hidden_sizes=(8, 16, 24, 32), depths=(1, 1, 2, 1)))
        params = convert_convnext(hf.state_dict(), depths=(1, 1, 2, 1))
        x = _images(size=64)
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        _, pooled = model.apply({'params': params}, x)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)


class TestSpaceToDepthStem:
    """The packed 4x4/s1 stem is the same function as the canonical 7x7/s2
    conv — same params, same output, same kernel gradient."""

    def test_matches_canonical_conv_and_grads(self):
        import jax.numpy as jnp

        from pixelrec_multimodal_tpu.encoders.resnet import ConvBN

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        mod_std = ConvBN(8, 7, 2, space_to_depth=False)
        mod_s2d = ConvBN(8, 7, 2, space_to_depth=True)
        params = mod_std.init(jax.random.PRNGKey(0), x)
        y_std = mod_std.apply(params, x)
        y_s2d = mod_s2d.apply(params, x)
        assert y_s2d.shape == y_std.shape == (2, 8, 8, 8)
        np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_std),
                                   rtol=1e-5, atol=1e-5)

        def loss(p, mod):
            return jnp.sum(mod.apply(p, x) ** 2)

        g_std = jax.grad(loss)(params, mod_std)
        g_s2d = jax.grad(loss)(params, mod_s2d)
        np.testing.assert_allclose(
            np.asarray(g_s2d['params']['conv']['kernel']),
            np.asarray(g_std['params']['conv']['kernel']),
            rtol=1e-4, atol=1e-5)


class TestDinov2InterpolationMatrix:
    """The torch-convention bicubic matrix used for DINOv2 pos-embed
    interpolation is exact vs torch F.interpolate (align_corners=False,
    a=-0.75) — jax.image.resize's Catmull-Rom kernel would not be."""

    @pytest.mark.parametrize('src,dst', [(37, 16), (37, 8), (7, 16)])
    def test_matches_torch_bicubic(self, src, dst):
        import torch.nn.functional as F
        from pixelrec_multimodal_tpu.encoders.dinov2 import (
            bicubic_resize_matrix)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 5, src, src)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x), size=(dst, dst),
                            mode='bicubic', align_corners=False).numpy()
        M = np.asarray(bicubic_resize_matrix(src, dst))
        ours = np.einsum('oh,bchw,pw->bcop', M, x, M)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


class TestZooShapes:
    """Full-size modules initialize and produce registry-declared dims."""

    @pytest.mark.parametrize('key,dim', [('sentence-bert', 384),
                                         ('mpnet', 768)])
    def test_language_dims(self, key, dim):
        from pixelrec_multimodal_tpu.encoders import build_language_encoder
        model = build_language_encoder(key)
        ids = np.ones((1, 16), np.int32) * 5
        variables = model.init(jax.random.PRNGKey(0), ids)
        _, pooled = model.apply(variables, ids)
        assert pooled.shape == (1, dim)
