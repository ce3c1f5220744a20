"""LPIPS perceptual metric: VGG16 feature extractor + linear heads, in JAX.

The reference computes LPIPS(VGG) in its image-metrics notebook
(reference utils/evaluate_images.ipynb cell 5) via the `lpips` pip package
(pretrained torchvision VGG16 + learned linear calibration weights). This
environment has no network access, so the weights are a USER-SUPPLIED file;
given one, the metric runs natively in JAX (XLA convs — TPU or CPU).

Weights file format (.npz), produced by `export_weights()` on a connected
machine (or by any script following the same naming):

- vgg_conv{i}_weight: (out, in, 3, 3) float32, i = 0..12 — the 13 conv
  layers of torchvision VGG16 `features`, in order.
- vgg_conv{i}_bias:   (out,) float32
- lin{k}_weight:      (C_k,) or (1, C_k, 1, 1) float32, k = 0..4 — LPIPS
  linear head weights over the 5 tapped activations
  (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).

Distance definition (Zhang et al., CVPR 2018): images scaled to [-1, 1],
normalized by the fixed shift/scale, passed through VGG16; each tapped
activation is channel-unit-normalized; the squared difference is weighted by
the linear head and averaged spatially; the five layer scores are summed.
"""

from __future__ import annotations

import os

import numpy as np

# VGG16 feature-layer plan: conv channel widths and pool positions.
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)
# tap after the relu of these conv indices (0-based over the 13 convs):
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAPS = (1, 3, 6, 9, 12)
_TAP_CHANNELS = (64, 128, 256, 512, 512)

# fixed normalization from the LPIPS reference implementation
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class LPIPSEvaluator:
    """Loads a weights file once and evaluates distances in JAX."""

    def __init__(self, weights_path: str):
        if not os.path.isfile(weights_path):
            raise FileNotFoundError(
                f"LPIPS weights file not found: {weights_path}. Produce one "
                "with neurofluid_tpu.utils.lpips.export_weights() on a "
                "machine with torchvision, or set NF_LPIPS_WEIGHTS."
            )
        data = np.load(weights_path)
        self.conv_w = []
        self.conv_b = []
        for i in range(13):
            w = np.asarray(data[f"vgg_conv{i}_weight"], np.float32)
            b = np.asarray(data[f"vgg_conv{i}_bias"], np.float32)
            self.conv_w.append(w)
            self.conv_b.append(b)
        self.lin_w = []
        for k, c in enumerate(_TAP_CHANNELS):
            w = np.asarray(data[f"lin{k}_weight"], np.float32).reshape(-1)
            if w.shape[0] != c:
                raise ValueError(
                    f"lin{k}_weight has {w.shape[0]} channels, expected {c}"
                )
            self.lin_w.append(w)
        self._fn = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        conv_w = [jnp.asarray(w) for w in self.conv_w]
        conv_b = [jnp.asarray(b) for b in self.conv_b]
        lin_w = [jnp.asarray(w) for w in self.lin_w]

        def features(x):  # x: (1, H, W, 3) in [-1, 1]
            x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
            taps = []
            ci = 0
            for item in _VGG16_CFG:
                if item == "M":
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max,
                        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
                    )
                    continue
                # torch OIHW -> HWIO
                w = jnp.transpose(conv_w[ci], (2, 3, 1, 0))
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + conv_b[ci]
                x = jax.nn.relu(x)
                if ci in _TAPS:
                    taps.append(x)
                ci += 1
            return taps

        def distance(a, b):  # (1, H, W, 3) each, in [-1, 1]
            fa = features(a)
            fb = features(b)
            total = 0.0
            for ta, tb, w in zip(fa, fb, lin_w):
                na = ta / jnp.sqrt(jnp.sum(ta**2, -1, keepdims=True) + 1e-10)
                nb = tb / jnp.sqrt(jnp.sum(tb**2, -1, keepdims=True) + 1e-10)
                d2 = (na - nb) ** 2
                total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(1, 2))
            return total[0]

        self._fn = jax.jit(distance)

    def __call__(self, pred: np.ndarray, gt: np.ndarray) -> float:
        """pred, gt: (H, W, 3) in [0, 1]. Returns the LPIPS distance."""
        if self._fn is None:
            self._build()
        import jax.numpy as jnp

        a = jnp.asarray(np.asarray(pred, np.float32) * 2.0 - 1.0)[None]
        b = jnp.asarray(np.asarray(gt, np.float32) * 2.0 - 1.0)[None]
        return float(self._fn(a, b))


_CACHED: dict = {}


def get_evaluator(weights_path: str | None = None) -> LPIPSEvaluator:
    path = weights_path or os.environ.get("NF_LPIPS_WEIGHTS", "")
    if not path:
        raise FileNotFoundError(
            "No LPIPS weights configured. Pass weights_path or set the "
            "NF_LPIPS_WEIGHTS env var to a file produced by "
            "neurofluid_tpu.utils.lpips.export_weights()."
        )
    if path not in _CACHED:
        _CACHED[path] = LPIPSEvaluator(path)
    return _CACHED[path]


def export_weights(out_path: str) -> str:
    """On a CONNECTED machine with torchvision + lpips installed: bundle the
    torchvision VGG16 features and the official LPIPS linear heads into the
    .npz format this module loads. (Not runnable offline — provided so users
    can produce the weights file once and copy it in.)"""
    import lpips as lpips_pkg  # type: ignore
    import torchvision  # type: ignore

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    model = lpips_pkg.LPIPS(net="vgg")
    arrays = {}
    ci = 0
    for m in vgg:
        if m.__class__.__name__ == "Conv2d":
            arrays[f"vgg_conv{ci}_weight"] = m.weight.detach().numpy()
            arrays[f"vgg_conv{ci}_bias"] = m.bias.detach().numpy()
            ci += 1
    for k in range(5):
        lin = getattr(model, f"lin{k}")
        arrays[f"lin{k}_weight"] = lin.model[-1].weight.detach().numpy()
    np.savez_compressed(out_path, **arrays)
    return out_path
