# pixelrec_multimodal_tpu/ops/augment.py
"""Device-side batched image augmentation (jit-able).

Parity target: the reference's torchvision augmentation pipeline applied per
sample on the host inside DataLoader workers
(/root/reference/src/data/processors/image_processor.py:69-96:
RandomResizedCrop, ColorJitter, RandomHorizontalFlip, RandomRotation,
GaussianBlur + optional gaussian noise from the config,
src/config.py:141-156). Here the whole batch is augmented in one compiled
program on device — the host ships raw frames only.

All ops take CHW float images (normalized or [0,1]) with static shapes; the
random draws come from an explicit PRNG key, so augmentation is reproducible
and parallelizes over the mesh with the batch.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ImageAugmentationConfig


def random_resized_crop(key, images: jnp.ndarray, scale=(0.8, 1.0),
                        ratio=(0.75, 4.0 / 3.0)) -> jnp.ndarray:
    """Batched RandomResizedCrop back to the input size (B, C, H, W)."""
    B, C, H, W = images.shape
    k_area, k_ratio, k_x, k_y = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (B,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k_ratio, (B,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    ch = jnp.clip(jnp.sqrt(area / r) * H, 8, H)
    cw = jnp.clip(jnp.sqrt(area * r) * W, 8, W)
    y0 = jax.random.uniform(k_y, (B,)) * (H - ch)
    x0 = jax.random.uniform(k_x, (B,)) * (W - cw)

    # Per-image bilinear resample of the crop window via map coordinates.
    ys = jnp.linspace(0.0, 1.0, H)
    xs = jnp.linspace(0.0, 1.0, W)

    def crop_one(img, y0i, x0i, chi, cwi):
        src_y = y0i + ys * (chi - 1)
        src_x = x0i + xs * (cwi - 1)
        y_f = jnp.floor(src_y).astype(jnp.int32)
        x_f = jnp.floor(src_x).astype(jnp.int32)
        y_c = jnp.clip(y_f + 1, 0, H - 1)
        x_c = jnp.clip(x_f + 1, 0, W - 1)
        wy = (src_y - y_f)[None, :, None]
        wx = (src_x - x_f)[None, None, :]
        tl = img[:, y_f][:, :, x_f]
        tr = img[:, y_f][:, :, x_c]
        bl = img[:, y_c][:, :, x_f]
        br = img[:, y_c][:, :, x_c]
        top = tl * (1 - wx) + tr * wx
        bot = bl * (1 - wx) + br * wx
        return top * (1 - wy) + bot * wy

    return jax.vmap(crop_one)(images, y0, x0, ch, cw)


def color_jitter(key, images: jnp.ndarray, brightness=0.2, contrast=0.2,
                 saturation=0.2, hue=0.1) -> jnp.ndarray:
    """Batched brightness/contrast/saturation/hue jitter on CHW images.

    Hue is approximated as a rotation of the chroma components in YIQ space
    (cheap and differentiable; torchvision converts through HSV).
    """
    B = images.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    out = images
    if brightness:
        f = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness,
                               maxval=1 + brightness)
        out = out * f
    if contrast:
        f = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast,
                               maxval=1 + contrast)
        mean = out.mean(axis=(1, 2, 3), keepdims=True)
        out = (out - mean) * f + mean
    if saturation:
        f = jax.random.uniform(ks, (B, 1, 1, 1), minval=1 - saturation,
                               maxval=1 + saturation)
        gray = out.mean(axis=1, keepdims=True)
        out = gray + (out - gray) * f
    if hue:
        theta = jax.random.uniform(kh, (B, 1, 1), minval=-hue * 2 * jnp.pi,
                                   maxval=hue * 2 * jnp.pi)
        r, g, b = out[:, 0], out[:, 1], out[:, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        i = 0.596 * r - 0.274 * g - 0.322 * b
        q = 0.211 * r - 0.523 * g + 0.312 * b
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        i2 = i * cos - q * sin
        q2 = i * sin + q * cos
        out = jnp.stack([
            y + 0.956 * i2 + 0.621 * q2,
            y - 0.272 * i2 - 0.647 * q2,
            y - 1.106 * i2 + 1.703 * q2,
        ], axis=1)
    return out


def random_horizontal_flip(key, images: jnp.ndarray, p=0.5) -> jnp.ndarray:
    B = images.shape[0]
    flip = jax.random.bernoulli(key, p, (B, 1, 1, 1))
    return jnp.where(flip, images[..., ::-1], images)


def random_rotation(key, images: jnp.ndarray, degrees: float) -> jnp.ndarray:
    """Batched rotation by a uniform angle in ±degrees (bilinear, zero fill)."""
    B, C, H, W = images.shape
    theta = jax.random.uniform(key, (B,), minval=-degrees, maxval=degrees)
    theta = theta * jnp.pi / 180.0
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing='ij')

    def rotate_one(img, t):
        cos, sin = jnp.cos(t), jnp.sin(t)
        src_y = cos * (yy - cy) + sin * (xx - cx) + cy
        src_x = -sin * (yy - cy) + cos * (xx - cx) + cx
        y_f = jnp.floor(src_y).astype(jnp.int32)
        x_f = jnp.floor(src_x).astype(jnp.int32)
        wy, wx = src_y - y_f, src_x - x_f
        valid = ((src_y >= 0) & (src_y <= H - 1)
                 & (src_x >= 0) & (src_x <= W - 1))

        def sample(yi, xi):
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            return img[:, yc, xc]

        val = (sample(y_f, x_f) * (1 - wy) * (1 - wx)
               + sample(y_f, x_f + 1) * (1 - wy) * wx
               + sample(y_f + 1, x_f) * wy * (1 - wx)
               + sample(y_f + 1, x_f + 1) * wy * wx)
        return jnp.where(valid[None], val, 0.0)

    return jax.vmap(rotate_one)(images, theta)


def gaussian_blur(key, images: jnp.ndarray, kernel_size: int = 5,
                  sigma_range=(0.1, 2.0)) -> jnp.ndarray:
    """Batched separable Gaussian blur with a per-batch random sigma."""
    sigma = jax.random.uniform(key, (), minval=sigma_range[0],
                               maxval=sigma_range[1])
    half = kernel_size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k1d = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k1d = k1d / k1d.sum()
    B, C, H, W = images.shape
    x = images.reshape(B * C, 1, H, W)
    kh = k1d.reshape(1, 1, -1, 1)
    kw = k1d.reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1),
                                     [(half, half), (0, 0)],
                                     dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1),
                                     [(0, 0), (half, half)],
                                     dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return x.reshape(B, C, H, W)


def gaussian_noise(key, images: jnp.ndarray, std: float) -> jnp.ndarray:
    return images + jax.random.normal(key, images.shape) * std


def augment_batch(key, images: jnp.ndarray,
                  config: Optional[ImageAugmentationConfig]) -> jnp.ndarray:
    """Apply the configured augmentation pipeline to a CHW image batch.

    Order matches the reference's online pipeline
    (image_processor.py:74-96): crop, color jitter, flip, rotation, blur
    (+noise from the config schema).
    """
    if config is None or not config.enabled:
        return images
    keys = jax.random.split(key, 6)
    out = images
    if config.random_crop:
        out = random_resized_crop(keys[0], out, scale=tuple(config.crop_scale))
    if any([config.brightness, config.contrast, config.saturation,
            config.hue]):
        out = color_jitter(keys[1], out, config.brightness, config.contrast,
                           config.saturation, config.hue)
    if config.horizontal_flip:
        out = random_horizontal_flip(keys[2], out)
    if config.rotation_degrees > 0:
        out = random_rotation(keys[3], out, config.rotation_degrees)
    if config.gaussian_blur:
        out = gaussian_blur(keys[4], out,
                            kernel_size=int(config.blur_kernel_size[0]))
    if config.gaussian_noise:
        out = gaussian_noise(keys[5], out, config.noise_std)
    return out
