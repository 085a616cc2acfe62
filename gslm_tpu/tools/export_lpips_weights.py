"""Export LPIPS(VGG16) weights to the .npz format gslm_tpu/eval/lpips.py
loads (keys conv<i>_W/conv<i>_b HWIO + lin<j>_W per-channel head weights).

Run this on a machine WITH network access + torchvision (this build
environment has neither), then point GSLM_LPIPS_WEIGHTS at the output (or
drop it at gslm_tpu/eval/lpips_vgg16.npz):

    python -m gslm_tpu.tools.export_lpips_weights lpips_vgg16.npz

Sources (reference lpipsPyTorch/modules/networks.py:52-66 get_network +
LinLayers): the VGG16 backbone from torchvision, the 5 linear-head weight
maps from richzhang/PerceptualSimilarity's released v0.1 vgg.pth (the same
state dict the reference's get_state_dict() downloads).
"""

from __future__ import annotations

import sys

LIN_URL = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity"
           "/master/lpips/weights/v0.1/vgg.pth")


def main(out_path: str = "lpips_vgg16.npz"):
    import numpy as np
    import torch
    import torchvision

    vgg = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1).features
    arrays = {}
    i = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            # torch OIHW -> HWIO (what lax.conv_general_dilated consumes)
            arrays[f"conv{i}_W"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0))
            arrays[f"conv{i}_b"] = layer.bias.detach().numpy()
            i += 1
    assert i == 13, f"expected 13 VGG16 convs, got {i}"

    state = torch.hub.load_state_dict_from_url(
        LIN_URL, map_location="cpu", progress=True)
    for j in range(5):
        w = state[f"lin{j}.model.1.weight"]      # (1, C, 1, 1)
        arrays[f"lin{j}_W"] = w.detach().numpy().reshape(-1)

    np.savez(out_path, **arrays)
    print(f"wrote {out_path}: "
          f"{sum(a.size for a in arrays.values()) * 4 / 1e6:.1f} MB, "
          f"{len(arrays)} arrays")


if __name__ == "__main__":
    main(*sys.argv[1:])
