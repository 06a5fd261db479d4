"""Convert torchvision VGG19 weights → the npz overlay consumed by
models/generator_j.py::load_vgg_weights_npz (and so by the stage-3
perceptual loss — set $DSU_VGG19_NPZ or GANConfig.vgg_npz to the output).

The reference trains its style translators against frozen ImageNet VGG19
features (3_style_translator/training/models.py:480-548). This environment
cannot fetch those weights (zero egress), so the conversion runs wherever
the user has them:

    # from torchvision's pretrained model (downloads on a connected box)
    python scripts/export_vgg19_npz.py --out vgg19_features.npz

    # or from a saved torch state_dict / full-model checkpoint
    python scripts/export_vgg19_npz.py --state-dict vgg19.pth --out ...

Only the conv weights of features[0..7] (conv1_1..conv2_2, indices
0/2/5/7) are needed for feature_layers (0, 3, 5); --max-index widens that.
Layer-mapping correctness is proven by
tests/test_reference_parity.py::TestPerceptualVGGParity with synthetic
weights through this exact key schema.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--state-dict", default=None,
                    help="torch .pth with a vgg19 state_dict (keys "
                         "'features.N.*' or bare 'N.*'); default: "
                         "torchvision.models.vgg19(pretrained=True)")
    ap.add_argument("--max-index", type=int, default=7,
                    help="highest features index to export (7 covers "
                         "feature_layers 0/3/5)")
    args = ap.parse_args(argv)

    if args.state_dict:
        import torch
        sd = torch.load(args.state_dict, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        try:
            from torchvision import models
        except ImportError:
            print("torchvision not available here — run on a box that has "
                  "it, or pass --state-dict", file=sys.stderr)
            return 1
        model = models.vgg19(pretrained=True)
        sd = {f"features.{k}": v.detach().numpy()
              for k, v in model.features.state_dict().items()}

    from drawingspinup_tpu.utils.torch_port import vgg19_features_to_npz
    vgg19_features_to_npz(sd, args.out, max_index=args.max_index)
    import numpy as np
    d = np.load(args.out)
    print(f"wrote {args.out}: {sorted(d.keys())}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
