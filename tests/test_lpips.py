"""LPIPS tests: the JAX VGG16+linear-head evaluator vs an independent torch
functional implementation on the SAME (synthetic) weights file, plus the
weights gating contract."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from neurofluid_tpu.utils import lpips as lpips_mod
from neurofluid_tpu.utils import metrics


def _synthetic_weights(path, rng):
    cfg = lpips_mod._VGG16_CFG
    arrays = {}
    cin = 3
    ci = 0
    for item in cfg:
        if item == "M":
            continue
        arrays[f"vgg_conv{ci}_weight"] = (
            rng.normal(size=(item, cin, 3, 3)) * (0.5 / np.sqrt(cin * 9))
        ).astype(np.float32)
        arrays[f"vgg_conv{ci}_bias"] = rng.normal(size=(item,)).astype(np.float32) * 0.01
        cin = item
        ci += 1
    for k, c in enumerate(lpips_mod._TAP_CHANNELS):
        arrays[f"lin{k}_weight"] = np.abs(
            rng.normal(size=(1, c, 1, 1)).astype(np.float32)
        )
    np.savez(path, **arrays)
    return path


def _torch_lpips(weights, a_hwc, b_hwc):
    """Independent torch evaluation of the LPIPS definition."""
    import torch.nn.functional as F

    data = np.load(weights)
    shift = torch.tensor(lpips_mod._SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(lpips_mod._SCALE).view(1, 3, 1, 1)

    def feats(img_hwc):
        x = torch.tensor(
            np.ascontiguousarray(img_hwc.transpose(2, 0, 1)), dtype=torch.float32
        )[None] * 2.0 - 1.0
        x = (x - shift) / scale
        taps = []
        ci = 0
        for item in lpips_mod._VGG16_CFG:
            if item == "M":
                x = F.max_pool2d(x, 2, 2)
                continue
            w = torch.tensor(data[f"vgg_conv{ci}_weight"])
            b = torch.tensor(data[f"vgg_conv{ci}_bias"])
            x = F.relu(F.conv2d(x, w, b, padding=1))
            if ci in lpips_mod._TAPS:
                taps.append(x)
            ci += 1
        return taps

    fa, fb = feats(a_hwc), feats(b_hwc)
    total = 0.0
    for k, (ta, tb) in enumerate(zip(fa, fb)):
        na = ta / torch.sqrt((ta**2).sum(1, keepdim=True) + 1e-10)
        nb = tb / torch.sqrt((tb**2).sum(1, keepdim=True) + 1e-10)
        w = torch.tensor(data[f"lin{k}_weight"]).view(1, -1, 1, 1)
        total = total + ((na - nb) ** 2 * w).sum(1).mean()
    return float(total)


class TestLPIPS:
    def test_matches_torch_reference(self, rng, tmp_path):
        wfile = _synthetic_weights(str(tmp_path / "w.npz"), rng)
        a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        b = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        got = metrics.lpips(a, b, weights_path=wfile)
        want = _torch_lpips(wfile, a, b)
        np.testing.assert_allclose(got, want, rtol=2e-3)
        assert got > 0

    def test_identity_is_zero(self, rng, tmp_path):
        wfile = _synthetic_weights(str(tmp_path / "w.npz"), rng)
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        assert abs(metrics.lpips(a, a, weights_path=wfile)) < 1e-6

    def test_gated_without_weights(self, rng, monkeypatch):
        monkeypatch.delenv("NF_LPIPS_WEIGHTS", raising=False)
        with pytest.raises(FileNotFoundError, match="NF_LPIPS_WEIGHTS"):
            metrics.lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3)))

    def test_missing_file_clean_error(self):
        with pytest.raises(FileNotFoundError, match="not found"):
            lpips_mod.LPIPSEvaluator("/nonexistent/w.npz")
