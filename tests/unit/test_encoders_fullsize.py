"""Full-geometry encoder-zoo validation vs HF torch (VERDICT r2 item 4).

The small-config suite (test_encoders.py) proves converter + architecture
logic but would miss production-geometry bugs: stage-depth indexing at
ResNet-50's [3,4,6,3], DINOv2's 518-native position-embedding interpolation
down to 224 px, MPNet's relative-bias buckets at seq 512, CLIP text at its
full 77-token context. These tests instantiate the REAL registry geometries
with random weights (no hub downloads; pretrained fidelity still requires
checkpoints — BASELINE.md) and compare pooled outputs against the HF torch
modules the reference loads (/root/reference/src/models/multimodal.py:
207-250, 388-470).

Marked slow: full-size CPU forwards + compiles.
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
    TEXT_CONFIGS,
    TextTransformer,
)

pytestmark = pytest.mark.slow

# Full-depth fp32 towers accumulate reduction-order differences between
# torch (sequential CPU kernels) and XLA; the per-layer error of the small
# suite (2e-4) compounds over 12 blocks / 50 convs.
TOL = dict(rtol=2e-3, atol=2e-3)


def _images(batch=2, size=224, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, 3, size, size)).astype(np.float32)


def _ids(batch, seq, vocab, pad_id, pad_from, seed=0):
    rng = np.random.default_rng(seed)
    lo = pad_id + 2
    ids = rng.integers(lo, vocab, (batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    ids[1, pad_from:] = pad_id
    mask[1, pad_from:] = 0
    return ids, mask


class TestVisionFullGeometry:
    def test_resnet50(self):
        """microsoft/resnet-50 geometry: stem 64, stages (256,512,1024,2048)
        x depths (3,4,6,3), 224 px — the HF ResNetConfig defaults."""
        from transformers import ResNetConfig, ResNetModel
        hf_cfg = ResNetConfig()
        assert list(hf_cfg.depths) == [3, 4, 6, 3]
        assert list(hf_cfg.hidden_sizes) == [256, 512, 1024, 2048]
        hf = ResNetModel(hf_cfg).eval()
        model = ResNetTower(JResNetConfig())
        params = convert_resnet(hf.state_dict(), depths=(3, 4, 6, 3))
        x = _images()
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        _, pooled = model.apply({'params': params}, x)
        assert pooled.shape == (2, 2048)
        hf_pooled = out.pooler_output.squeeze(-1).squeeze(-1).numpy()
        np.testing.assert_allclose(np.asarray(pooled), hf_pooled, **TOL)

    def test_dinov2_base_224_interpolated_pos_embeds(self):
        """facebook/dinov2-base geometry with 518-native position embeddings
        (37x37 grid) driven at 224 px (16x16 grid) — exercises the bicubic
        interpolation path HF runs on every PixelRec forward
        (/root/reference/src/models/multimodal.py:221 at 224-px inputs)."""
        from transformers import Dinov2Config, Dinov2Model
        hf = Dinov2Model(Dinov2Config(image_size=518)).eval()
        assert hf.embeddings.position_embeddings.shape[1] == 37 * 37 + 1
        model = Dinov2Tower(JDinov2Config())  # pos_embed_grid=37
        params = convert_dinov2(hf.state_dict(), num_layers=12)
        x = _images(size=224)
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        _, pooled = model.apply({'params': params}, x)
        assert pooled.shape == (2, 768)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)

    def test_convnext_base(self):
        """facebook/convnext-base-224 geometry: (128,256,512,1024) x
        (3,3,27,3)."""
        from transformers import ConvNextConfig, ConvNextModel
        hf = ConvNextModel(ConvNextConfig(
            hidden_sizes=[128, 256, 512, 1024], depths=[3, 3, 27, 3])).eval()
        model = ConvNextTower(JConvNextConfig())
        params = convert_convnext(hf.state_dict(), depths=(3, 3, 27, 3))
        x = _images()
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        _, pooled = model.apply({'params': params}, x)
        assert pooled.shape == (2, 1024)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)

    def test_clip_vision_b32(self):
        """openai/clip-vit-base-patch32 vision geometry: hidden 768, 12x12,
        patch 32, 224 px."""
        from transformers import CLIPVisionConfig, CLIPVisionModel
        hf = CLIPVisionModel(CLIPVisionConfig()).eval()
        model = CLIPVisionTower(JCLIPVisionConfig())
        params = convert_clip_vision(hf.state_dict(), num_layers=12)
        x = _images()
        with torch.no_grad():
            out = hf(pixel_values=torch.from_numpy(x))
        _, pooled = model.apply({'params': params}, x)
        assert pooled.shape == (2, 768)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)


class TestLanguageFullGeometry:
    def _bert_family(self, hf, key, seq, pad_from, num_layers,
                     has_relative_bias=False):
        cfg = TEXT_CONFIGS[key]
        model = TextTransformer(cfg)
        params = convert_bert_family(hf.state_dict(), num_layers=num_layers,
                                     has_relative_bias=has_relative_bias)
        ids, mask = _ids(2, seq, min(cfg.vocab_size, 30000), cfg.pad_token_id,
                         pad_from)
        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(mask).long())
        _, pooled = model.apply({'params': params}, ids, mask)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)
        return pooled

    def test_minilm_seq_256(self):
        """sentence-transformers/all-MiniLM-L6-v2 geometry (384 hidden,
        6 layers) at its full 256-token window."""
        from transformers import BertConfig, BertModel
        hf = BertModel(BertConfig(
            hidden_size=384, num_hidden_layers=6, num_attention_heads=12,
            intermediate_size=1536, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)).eval()
        pooled = self._bert_family(hf, 'sentence-bert', seq=256,
                                   pad_from=180, num_layers=6)
        assert pooled.shape == (2, 384)

    def test_bert_base_seq_512(self):
        """bert-base-uncased geometry at the full 512-token window
        (/root/reference/src/data/processors/text_processor.py:49 pads to
        model_max_length)."""
        from transformers import BertConfig, BertModel
        hf = BertModel(BertConfig(
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)).eval()
        pooled = self._bert_family(hf, 'bert', seq=512, pad_from=300,
                                   num_layers=12)
        assert pooled.shape == (2, 768)

    def test_roberta_base_seq_512(self):
        """roberta-base geometry (514 positions, offset-by-pad_token_id+1
        position ids) at seq 512."""
        from transformers import RobertaConfig, RobertaModel
        hf = RobertaModel(RobertaConfig(
            vocab_size=50265, max_position_embeddings=514, pad_token_id=1,
            type_vocab_size=1, layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0)).eval()
        pooled = self._bert_family(hf, 'roberta', seq=512, pad_from=300,
                                   num_layers=12)
        assert pooled.shape == (2, 768)

    def test_mpnet_base_seq_512(self):
        """sentence-transformers/all-mpnet-base-v2 geometry at seq 512 —
        relative-bias bucketing must cover the full 32-bucket/512-distance
        range, not just the small-test distances."""
        from transformers import MPNetConfig, MPNetModel
        # all-mpnet-base-v2 ships 514 positions (offset-by-pad+1 ids need
        # seq+2); HF's MPNetConfig default of 512 cannot even run seq 512.
        hf = MPNetModel(MPNetConfig(
            max_position_embeddings=514,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)).eval()
        assert hf.config.vocab_size == 30527
        assert hf.config.relative_attention_num_buckets == 32
        pooled = self._bert_family(hf, 'mpnet', seq=512, pad_from=300,
                                   num_layers=12, has_relative_bias=True)
        assert pooled.shape == (2, 768)

    def test_clip_text_seq_77(self):
        """openai/clip-vit-base-patch32 text tower at the full 77-token
        context with EOT pooling (the contrastive stream,
        /root/reference/src/data/dataset.py:296-301 pads to 77)."""
        from transformers import CLIPTextConfig, CLIPTextModel
        hf = CLIPTextModel(CLIPTextConfig()).eval()
        model = CLIPTextTower(JCLIPTextConfig())
        params = convert_clip_text(hf.state_dict(), num_layers=12)
        rng = np.random.default_rng(0)
        eos = hf.config.eos_token_id
        ids = np.zeros((2, 77), np.int32)
        for b, length in enumerate((77, 30)):
            ids[b, 0] = hf.config.bos_token_id
            ids[b, 1:length - 1] = rng.integers(5, 40000, length - 2)
            ids[b, length - 1] = eos
        with torch.no_grad():
            out = hf(input_ids=torch.from_numpy(ids).long())
        _, pooled = model.apply({'params': params}, ids)
        assert pooled.shape == (2, 512)
        np.testing.assert_allclose(np.asarray(pooled),
                                   out.pooler_output.numpy(), **TOL)


