# pixelrec_multimodal_tpu/data/processors/image_processor.py
"""Image processing: offline validation/compression and online decode+preprocess.

Parity target: /root/reference/src/data/processors/image_processor.py:26-187.

TPU-native redesign of the online path: instead of a Hugging Face
``AutoImageProcessor`` invoked per sample inside DataLoader workers, each
vision backbone has a static :class:`ImagePreprocessSpec` (resize / crop /
normalization constants matching the HF processors' configs). The host does
only decode + resize + center-crop to a fixed uint8 HWC frame; scaling and
mean/std normalization are cheap vectorized math done either here (numpy, for
table packing) or batched on device. Train-time augmentation runs on device
(see ops/augment.py), not on the host.
"""
from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Set, Tuple

import numpy as np
from PIL import Image

from ...config import (
    ImageAugmentationConfig,
    ImageValidationConfig,
    MODEL_CONFIGS,
    OfflineImageCompressionConfig,
)
from ..preprocessing import check_image_dimensions, is_image_corrupted

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class ImagePreprocessSpec:
    """Static preprocessing recipe for one vision backbone.

    Mirrors the corresponding HF image-processor configs (resize shortest edge,
    center crop, per-channel normalization) so pixel tensors match the
    reference's `pixel_values` pipeline.
    """
    resize_shortest: int
    crop_size: int
    resample: int  # PIL.Image.Resampling value
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]

    @property
    def output_hw(self) -> Tuple[int, int]:
        return (self.crop_size, self.crop_size)


# Per-model specs matching the published HF preprocessor configs.
PREPROCESS_SPECS = {
    'clip': ImagePreprocessSpec(224, 224, Image.Resampling.BICUBIC,
                                _CLIP_MEAN, _CLIP_STD),
    'dino': ImagePreprocessSpec(256, 224, Image.Resampling.BICUBIC,
                                _IMAGENET_MEAN, _IMAGENET_STD),
    'resnet': ImagePreprocessSpec(224, 224, Image.Resampling.BILINEAR,
                                  _IMAGENET_MEAN, _IMAGENET_STD),
    'convnext': ImagePreprocessSpec(256, 224, Image.Resampling.BICUBIC,
                                    _IMAGENET_MEAN, _IMAGENET_STD),
}


def resize_and_center_crop(image: Image.Image, spec: ImagePreprocessSpec
                           ) -> Image.Image:
    """Resize shortest edge to ``spec.resize_shortest`` then center-crop."""
    w, h = image.size
    scale = spec.resize_shortest / min(w, h)
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    image = image.resize((nw, nh), spec.resample)
    left = (nw - spec.crop_size) // 2
    top = (nh - spec.crop_size) // 2
    return image.crop((left, top, left + spec.crop_size, top + spec.crop_size))


def normalize_chw(frame_uint8: np.ndarray, spec: ImagePreprocessSpec
                  ) -> np.ndarray:
    """uint8 HWC frame -> normalized float32 CHW tensor."""
    x = frame_uint8.astype(np.float32) / 255.0
    x = (x - np.asarray(spec.mean, np.float32)) / np.asarray(spec.std, np.float32)
    return np.ascontiguousarray(x.transpose(2, 0, 1))


class ImageProcessor:
    """Dual-mode image processor (online dataset path / offline pipeline path)."""

    def __init__(
        self,
        model_name: Optional[str] = None,
        augmentation_config: Optional[ImageAugmentationConfig] = None,
        is_train: bool = False,
        compression_config: Optional[OfflineImageCompressionConfig] = None,
        validation_config: Optional[ImageValidationConfig] = None,
    ):
        self.model_name = model_name
        self.augmentation_config = augmentation_config
        self.is_train = is_train
        self.compression_config = compression_config
        self.validation_config = validation_config

        if model_name:
            if model_name not in MODEL_CONFIGS['vision']:
                raise ValueError(
                    f"Configuration for vision model '{model_name}' not found.")
            self.config = MODEL_CONFIGS['vision'][model_name]
            self.spec = PREPROCESS_SPECS[model_name]
        else:
            self.config = None
            self.spec = None

    # ------------------------------------------------------------ online mode
    def load_image_uint8(self, image_path: str) -> Optional[np.ndarray]:
        """Decode + resize + center-crop to a uint8 HWC frame; None on failure.

        This is the table-packing entry point: normalization happens later in
        one vectorized pass (host numpy or on-device).
        """
        if self.spec is None:
            raise RuntimeError(
                "ImageProcessor not initialized for online mode. Provide 'model_name'.")
        try:
            with Image.open(image_path) as img:
                img = img.convert('RGB')
                img = resize_and_center_crop(img, self.spec)
                return np.asarray(img, dtype=np.uint8)
        except Exception:
            return None

    def load_and_transform_image(self, image_path: str) -> np.ndarray:
        """Decode a single image into a normalized float32 CHW tensor.

        Zero placeholder on missing/corrupt files (reference
        image_processor.py:98-115 semantics).
        """
        frame = self.load_image_uint8(image_path) if self.spec else None
        if frame is None:
            return self.get_placeholder_tensor()
        return normalize_chw(frame, self.spec)

    def get_placeholder_tensor(self) -> np.ndarray:
        size = self.spec.output_hw if self.spec else (224, 224)
        return np.zeros((3, size[0], size[1]), dtype=np.float32)

    # ----------------------------------------------------------- offline mode
    def process_items_images(self, item_ids: List[str], source_folder: Path,
                             dest_folder: Path) -> Set[str]:
        """Validate/compress/copy each item's image; returns ids that passed
        (reference image_processor.py:125-138)."""
        if not self.validation_config:
            raise RuntimeError(
                "ImageProcessor not initialized for offline mode. "
                "Provide 'validation_config'.")
        dest_folder = Path(dest_folder)
        dest_folder.mkdir(parents=True, exist_ok=True)
        valid: Set[str] = set()
        for item_id in item_ids:
            src = self._find_image_for_item(str(item_id), Path(source_folder))
            if src and self._process_single_image(src, dest_folder / src.name):
                valid.add(item_id)
        return valid

    def _find_image_for_item(self, item_id: str, source_folder: Path
                             ) -> Optional[Path]:
        for ext in self.validation_config.allowed_extensions:
            p = source_folder / f"{item_id}{ext}"
            if p.exists():
                return p
        return None

    def _process_single_image(self, source_path: Path, dest_path: Path) -> bool:
        if dest_path.exists():
            return True
        dest_path.parent.mkdir(parents=True, exist_ok=True)
        try:
            if not source_path.exists():
                return False
            if self.validation_config.check_corrupted and \
                    is_image_corrupted(str(source_path)):
                return False
            if not check_image_dimensions(str(source_path),
                                          self.validation_config.min_width,
                                          self.validation_config.min_height):
                return False
            if self._should_compress_image(source_path):
                self._compress_and_save(source_path, dest_path)
            else:
                shutil.copy2(source_path, dest_path)
            return True
        except Exception:
            return False

    def _should_compress_image(self, image_path: Path) -> bool:
        cc = self.compression_config
        if not cc or not cc.enabled:
            return False
        return image_path.stat().st_size / 1024 > cc.compress_if_kb_larger_than

    def _compress_and_save(self, source_path: Path, dest_path: Path):
        cc = self.compression_config
        with Image.open(source_path) as img:
            img = img.convert('RGB')
            if cc.resize_if_pixels_larger_than and \
                    max(img.size) > cc.resize_target_longest_edge:
                scale = cc.resize_target_longest_edge / max(img.size)
                img = img.resize((int(img.width * scale), int(img.height * scale)),
                                 Image.Resampling.LANCZOS)
            if dest_path.suffix.lower() in ('.jpg', '.jpeg'):
                img.save(dest_path, quality=cc.target_quality, optimize=True)
            else:
                img.save(dest_path)
