"""Evaluator and metrics tests."""

import numpy as np
import pytest

from neurofluid_tpu.utils import metrics


class TestFluidErrors:
    def test_stats_and_windows(self, rng):
        fe = metrics.FluidErrors()
        pred = rng.normal(size=(50, 3)).astype(np.float32)
        gt = pred + 0.001  # 1 mm offset -> ~1.73 mm distance, x1000 scale
        d = fe.cal_errors(pred, gt, 1)
        assert d == pytest.approx(np.sqrt(3) * 1.0, rel=1e-3)
        assert 1 in fe.errors
        assert fe.errors[1]["num_particles"] == 50

    def test_nonfinite_guard(self, rng):
        fe = metrics.FluidErrors()
        pred = rng.normal(size=(10, 3))
        pred[0, 0] = np.nan
        assert fe.cal_errors(pred, rng.normal(size=(10, 3)), 0) is None

    def test_save_load_roundtrip(self, tmp_path, rng):
        fe = metrics.FluidErrors()
        fe.cal_errors(rng.normal(size=(10, 3)), rng.normal(size=(10, 3)), 3)
        p = str(tmp_path / "err.json")
        fe.save(p)
        fe2 = metrics.FluidErrors()
        fe2.load(p)
        assert fe2.errors[3]["gt2pred_mean"] == pytest.approx(
            fe.errors[3]["gt2pred_mean"]
        )


class TestImageMetrics:
    def test_psnr_identity(self, rng):
        img = rng.uniform(size=(16, 16, 3))
        assert metrics.psnr(img, img) >= 120 - 1e-6
        noisy = np.clip(img + 0.1, 0, 1)
        assert metrics.psnr(img, noisy) < 25

    def test_ssim_identity_and_noise(self, rng):
        img = rng.uniform(size=(32, 32, 3))
        assert metrics.ssim(img, img) == pytest.approx(1.0, abs=1e-6)
        assert metrics.ssim(img, rng.uniform(size=(32, 32, 3))) < 0.5

    def test_lpips_gated(self, rng, monkeypatch):
        monkeypatch.delenv("NF_LPIPS_WEIGHTS", raising=False)
        with pytest.raises(FileNotFoundError):
            metrics.lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3)))


class TestPred2GTReport:
    def test_report_runs_on_short_sequences(self, capsys):
        from neurofluid_tpu.train.evaluation import print_pred2gt_report

        print_pred2gt_report([1.0, 2.0, 3.0, 4.0])
        out = capsys.readouterr().out
        assert "trained 50 steps" in out
        assert "rollout 10 steps" in out
