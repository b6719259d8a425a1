"""Unit tests for the config system (parity with reference src/config.py)."""
import dataclasses

import pytest
import yaml

from pixelrec_multimodal_tpu.config import (
    Config,
    DataConfig,
    HyperparameterSearchConfig,
    ImageAugmentationConfig,
    MODEL_CONFIGS,
    ModelConfig,
    SimpleCacheConfig,
    TrainingConfig,
)


class TestDefaults:
    def test_model_defaults(self):
        m = ModelConfig()
        assert m.vision_model == 'resnet'
        assert m.language_model == 'sentence-bert'
        assert m.embedding_dim == 64
        assert m.fusion_type == 'concatenate'
        assert m.fusion_hidden_dims == [512, 256, 128]
        assert m.final_activation == 'sigmoid'

    def test_training_defaults(self):
        t = TrainingConfig()
        assert t.batch_size == 64
        assert t.learning_rate == 0.001
        assert t.epochs == 30
        assert t.patience == 10
        assert t.optimizer_type == 'adamw'

    def test_model_registry(self):
        assert set(MODEL_CONFIGS['vision']) == {'clip', 'dino', 'resnet', 'convnext'}
        assert set(MODEL_CONFIGS['language']) == {'sentence-bert', 'mpnet', 'bert', 'roberta'}
        assert MODEL_CONFIGS['vision']['resnet']['dim'] == 2048
        assert MODEL_CONFIGS['vision']['clip']['text_dim'] == 512

    def test_data_backcompat_aliases(self):
        d = DataConfig()
        assert d.cache_features is True
        assert d.cache_max_items == 1000
        assert d.cache_dir == 'data/cache/features'
        assert d.cache_to_disk is False


class TestPaths:
    def test_checkpoint_dirs(self):
        c = Config()
        assert c.model_specific_checkpoint_dir == 'models/checkpoints/resnet_sentence-bert'
        assert c.shared_encoders_dir == 'models/checkpoints/encoders'
        assert c.get_model_checkpoint_path('best_model.pth') == \
            'models/checkpoints/resnet_sentence-bert/best_model.pth'
        assert c.get_encoder_path('user_encoder.pkl') == \
            'models/checkpoints/encoders/user_encoder.pkl'

    def test_none_modality_dir(self):
        c = Config()
        c.model.vision_model = None
        assert c.model_specific_checkpoint_dir == 'models/checkpoints/None_sentence-bert'


class TestYamlRoundTrip:
    def test_partial_yaml_fills_defaults(self, tmp_path):
        p = tmp_path / 'c.yaml'
        p.write_text(yaml.dump({
            'model': {'vision_model': 'clip', 'embedding_dim': 128},
            'training': {'batch_size': 32},
        }))
        c = Config.from_yaml(str(p))
        assert c.model.vision_model == 'clip'
        assert c.model.embedding_dim == 128
        assert c.model.language_model == 'sentence-bert'  # default preserved
        assert c.training.batch_size == 32
        assert c.training.epochs == 30

    def test_nested_dataclass_from_yaml(self, tmp_path):
        p = tmp_path / 'c.yaml'
        p.write_text(yaml.dump({
            'data': {
                'cache_config': {'enabled': False, 'max_memory_items': 7},
                'splitting': {'strategy': 'leave_one_out', 'random_state': 7},
            },
        }))
        c = Config.from_yaml(str(p))
        assert c.data.cache_config.enabled is False
        assert c.data.cache_config.max_memory_items == 7
        assert c.data.splitting.strategy == 'leave_one_out'
        assert c.data.splitting.random_state == 7

    def test_legacy_flat_cache_keys(self, tmp_path):
        """Old flat cache_* keys at data: level migrate into cache_config."""
        p = tmp_path / 'c.yaml'
        p.write_text(yaml.dump({
            'data': {
                'cache_features': False,
                'cache_max_items': 123,
                'cache_dir': '/tmp/x',
                'cache_to_disk': True,
            },
        }))
        c = Config.from_yaml(str(p))
        assert c.data.cache_config.enabled is False
        assert c.data.cache_config.max_memory_items == 123
        assert c.data.cache_config.cache_directory == '/tmp/x'
        assert c.data.cache_config.use_disk is True

    def test_round_trip_identity(self, tmp_path):
        c1 = Config()
        c1.model.vision_model = 'dino'
        c1.training.learning_rate = 5e-4
        path = tmp_path / 'out.yaml'
        c1.to_yaml(str(path))
        c2 = Config.from_yaml(str(path))
        assert c2.model.vision_model == 'dino'
        assert c2.training.learning_rate == 5e-4
        assert c1.to_dict() == c2.to_dict()

    def test_empty_yaml(self, tmp_path):
        p = tmp_path / 'c.yaml'
        p.write_text('')
        c = Config.from_yaml(str(p))
        assert c.model.vision_model == 'resnet'

    def test_reference_example_configs_load(self):
        """The reference repo's shipped YAML examples parse unchanged."""
        import os
        for name in ('simple_config_example.yaml', 'advanced_config_example.yaml'):
            ref = os.path.join('/root/reference/configs', name)
            if os.path.exists(ref):
                c = Config.from_yaml(ref)
                assert isinstance(c, Config)


class TestValidation:
    def test_image_augmentation_validation(self):
        with pytest.raises(ValueError):
            ImageAugmentationConfig(brightness=-1)
        with pytest.raises(ValueError):
            ImageAugmentationConfig(hue=0.9)
        with pytest.raises(ValueError):
            ImageAugmentationConfig(random_crop=True, crop_scale=[0.9, 0.5])

    def test_hpo_validate(self):
        h = HyperparameterSearchConfig()
        h.validate()  # defaults valid
        h.direction = 'sideways'
        with pytest.raises(ValueError):
            h.validate()
        h.direction = 'minimize'
        h.search_space = {'x': {'type': 'float', 'low': 0}}
        with pytest.raises(ValueError):
            h.validate()

    def test_get_model_info(self):
        info = Config().get_model_info()
        assert info['vision']['pretrained_model_name'] == 'microsoft/resnet-50'
        assert info['language']['output_dimension'] == 384
