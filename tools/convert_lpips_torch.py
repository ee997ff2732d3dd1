"""Convert pretrained LPIPS (AlexNet) weights from the torch ``lpips``
package into the ``.npz`` layout read by ``geneface_tpu.models.lpips``.

Usage (on a machine where ``pip install lpips`` is possible):

    python tools/convert_lpips_torch.py --out lpips_alex.npz

Then point the training config at it: ``lpips_weights: /path/lpips_alex.npz``.

Torch conv weights are OIHW; Flax expects HWIO. The five NetLinLayer 1x1
convs become plain per-channel weight vectors.
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(out_path: str) -> None:
    try:
        import lpips  # noqa: gated — not shipped in the TPU image
        import torch
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "This converter needs the torch `lpips` package "
            f"(pip install lpips): {e}"
        )

    model = lpips.LPIPS(net="alex")
    model.eval()

    convs = [m for m in model.net.slice1] + [
        m for s in (model.net.slice2, model.net.slice3, model.net.slice4, model.net.slice5)
        for m in s
    ]
    conv_layers = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    lins = [model.lin0, model.lin1, model.lin2, model.lin3, model.lin4]
    arrays = convert_from_modules(
        conv_layers, [lin.model[-1].weight for lin in lins]
    )
    np.savez(out_path, **arrays)
    print(f"wrote {out_path}: " + ", ".join(sorted(arrays)))


def convert_from_modules(conv_layers, lin_weights) -> dict:
    """Five torch Conv2d layers + five [1, C, 1, 1] head weights → the
    ``.npz`` array dict ``geneface_tpu.models.lpips`` reads. Split out so the
    mapping is testable without the ``lpips`` pip package
    (``tests/test_lpips.py`` golden vs a torch oracle)."""
    assert len(conv_layers) == 5, f"expected 5 convs, got {len(conv_layers)}"
    arrays = {}
    for i, conv in enumerate(conv_layers):
        arrays[f"conv{i}/kernel"] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
        )
        arrays[f"conv{i}/bias"] = conv.bias.detach().numpy()
    for i, w in enumerate(lin_weights):
        arrays[f"lin{i}"] = w.detach().numpy().reshape(-1)
    return arrays


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_alex.npz")
    convert(ap.parse_args().out)
