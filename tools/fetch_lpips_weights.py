"""Fetch + convert the real LPIPS(vgg) weights for `training.lpips_jax`.

The reference vendors lpipsPyTorch and downloads torchvision's ImageNet
VGG16 on first use (`lpipsPyTorch/modules/networks.py`); this repo's
environment has zero egress, so eval falls back to a seeded-random
backbone labelled "lpips_rand".  Run this script ONCE on a machine with
network access to produce the single checkpoint `lpips_jax` consumes:

    python tools/fetch_lpips_weights.py --out weights/lpips_vgg16.pth
    export LPIPS_WEIGHTS=/root/repo/weights/lpips_vgg16.pth

After that, `training.evaluate` reports the metric as "lpips" (true
LPIPS: ImageNet VGG16 features + the official v0.1 linear calibration)
instead of "lpips_rand".

Sources (same files the reference pipeline uses):
  * torchvision VGG16 ImageNet weights:
      https://download.pytorch.org/models/vgg16-397923af.pth
  * official LPIPS v0.1 linear weights (Zhang et al.):
      https://github.com/richzhang/PerceptualSimilarity/raw/master/
      lpips/weights/v0.1/vgg.pth
"""
from __future__ import annotations

import argparse
import os
import urllib.request

VGG_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
LIN_URL = ("https://github.com/richzhang/PerceptualSimilarity/raw/"
           "master/lpips/weights/v0.1/vgg.pth")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_vgg16.pth")
    args = ap.parse_args()

    import torch

    def fetch(url, name):
        path = f"/tmp/{name}"
        if not os.path.exists(path):
            print(f"downloading {url} ...")
            urllib.request.urlretrieve(url, path)
        return torch.load(path, map_location="cpu", weights_only=False)

    vgg = fetch(VGG_URL, "vgg16_imagenet.pth")          # features.<i>.*
    lin = fetch(LIN_URL, "lpips_v01_vgg.pth")           # lin<k>.model.1.weight

    merged = {k: v for k, v in vgg.items() if k.startswith("features.")}
    for k, v in lin.items():
        # official file keys: "lin0.model.1.weight" ... "lin4.model.1.weight"
        merged[k] = v
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    torch.save(merged, args.out)
    print(f"wrote {args.out} ({len(merged)} tensors) — set "
          f"LPIPS_WEIGHTS={os.path.abspath(args.out)}")

    # sanity: the converter accepts it
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from relightable3dgaussian_tpu.training import lpips_jax
    p = lpips_jax.load_torch_weights(args.out)
    assert p.label == "lpips" and p.lins is not None
    print("verified: 13 convs,", len(p.lins), "lin taps, label", p.label)


if __name__ == "__main__":
    main()
