"""LPIPS perceptual metric in JAX (VGG16 backbone + learned linear heads).

Equivalent of the reference's vendored lpipsPyTorch (lpipsPyTorch/modules/
lpips.py, networks.py): per-layer unit-normalized VGG16 feature differences,
squared, reduced by learned 1x1 linear weights, spatially averaged, summed
over layers. Input images are in [0, 1] and shifted/scaled by the standard
LPIPS normalization constants.

This environment has no torchvision/lpips weights and no network egress, so
the backbone + head weights load from an ``.npz`` whose arrays follow the
naming below; without a weight file ``available()`` is False and metrics
report LPIPS as null (PSNR/SSIM are always computed).

Expected npz keys:
  conv<i>_W (kh, kw, cin, cout), conv<i>_b (cout,)   for the 13 VGG16 convs
  lin<j>_W (c_j,)                                     for the 5 heads
"""

from __future__ import annotations

import functools
import os

import numpy as np

# channel counts of the 13 VGG16 convs and the maxpool positions
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512]
# indices (into the conv list) after which LPIPS taps features: relu1_2,
# relu2_2, relu3_3, relu4_3, relu5_3
TAP_AFTER_CONV = [1, 3, 6, 9, 12]

SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ENV_VAR = "GSLM_LPIPS_WEIGHTS"


def default_weight_path() -> str:
    return os.environ.get(_ENV_VAR, os.path.join(
        os.path.dirname(__file__), "lpips_vgg16.npz"))


def available(path: str | None = None) -> bool:
    return os.path.exists(path or default_weight_path())


@functools.lru_cache(maxsize=2)
def _load_weights(path: str):
    data = np.load(path)
    convs = []
    i = 0
    while f"conv{i}_W" in data:
        convs.append((data[f"conv{i}_W"].astype(np.float32),
                      data[f"conv{i}_b"].astype(np.float32)))
        i += 1
    lins = []
    j = 0
    while f"lin{j}_W" in data:
        lins.append(data[f"lin{j}_W"].astype(np.float32))
        j += 1
    assert len(convs) == 13 and len(lins) == 5, \
        f"unexpected LPIPS weight file: {len(convs)} convs, {len(lins)} lins"
    return tuple(convs), tuple(lins)


def _vgg_features(x, convs):
    """x (B, 3, H, W) normalized; returns the 5 tapped feature maps."""
    import jax
    import jax.numpy as jnp

    feats = []
    ci = 0
    for c in VGG16_CFG:
        if c == "M":
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        else:
            W, b = convs[ci]
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(W), window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
            x = jax.nn.relu(x + jnp.asarray(b)[None, :, None, None])
            if ci in TAP_AFTER_CONV:
                feats.append(x)
            ci += 1
    return feats


def lpips(img1, img2, weight_path: str | None = None):
    """LPIPS distance per batch element; img (B, 3, H, W) in [0, 1]."""
    import jax.numpy as jnp

    convs, lins = _load_weights(weight_path or default_weight_path())

    def norm_input(x):
        x = 2.0 * x - 1.0   # [0,1] → [-1,1] (lpipsPyTorch scaling layer)
        return (x - jnp.asarray(SHIFT)[None, :, None, None]) \
            / jnp.asarray(SCALE)[None, :, None, None]

    f1 = _vgg_features(norm_input(img1), convs)
    f2 = _vgg_features(norm_input(img2), convs)

    total = 0.0
    for a, b, w in zip(f1, f2, lins):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        d = (a - b) ** 2                                  # (B, C, H, W)
        d = jnp.sum(d * jnp.asarray(w)[None, :, None, None], axis=1)
        total = total + jnp.mean(d, axis=(1, 2))          # (B,)
    return total
