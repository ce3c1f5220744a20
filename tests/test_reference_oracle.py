"""Direct-reference oracle tests (round-3 VERDICT item 7).

These tests import the reference's OWN pure-torch modules from
/root/reference (models/nerf.py, utils/ray_utils.py, utils/lr_schedulers.py
— all CPU-runnable) and run them as numerical oracles against this
framework's JAX counterparts. This upgrades "faithful by reimplementation"
(the numpy re-derivations in other test files) to "matched against the
reference code itself".

The reference modules are imported at test time only — no reference code is
copied into the framework. utils/ray_utils.py imports kornia (not installed
here); `create_meshgrid` is the only symbol used, so a minimal stub module is
injected before import.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_nerf_mod():
    return _load("ref_nerf", f"{REF}/models/nerf.py")


@pytest.fixture(scope="module")
def ref_ray_utils():
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")

        def create_meshgrid(height, width, normalized_coordinates=True):
            # kornia convention: (1, H, W, 2) with last dim (x, y)
            assert not normalized_coordinates  # only use in the reference
            ys, xs = torch.meshgrid(
                torch.arange(height, dtype=torch.float32),
                torch.arange(width, dtype=torch.float32),
                indexing="ij",
            )
            return torch.stack([xs, ys], dim=-1)[None]

        kornia.create_meshgrid = create_meshgrid
        sys.modules["kornia"] = kornia
    return _load("ref_ray_utils", f"{REF}/utils/ray_utils.py")


@pytest.fixture(scope="module")
def ref_lr():
    return _load("ref_lr_schedulers", f"{REF}/utils/lr_schedulers.py")


class TestNeRFOracle:
    @pytest.mark.parametrize("xyz,dirc", [(63, 27), (198, 54)])
    def test_forward_parity_on_imported_weights(self, ref_nerf_mod, xyz, dirc, rng):
        """Reference NeRF forward vs flax NeRF on importer-converted weights
        (reference models/nerf.py:41-123; the 198/54 case is the renderer's
        actual working point, configs/end2end.yaml encodings)."""
        import jax.numpy as jnp

        from neurofluid_tpu.models.nerf import NeRF
        from neurofluid_tpu.utils.torch_import import import_nerf_state

        torch.manual_seed(10)
        ref = ref_nerf_mod.NeRF(in_channels_xyz=xyz, in_channels_dir=dirc)
        ref.eval()
        params, skipped = import_nerf_state(ref.state_dict())
        assert not skipped

        x = rng.normal(size=(17, xyz + dirc)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        ours = NeRF(in_channels_xyz=xyz, in_channels_dir=dirc)
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)

        with torch.no_grad():
            want_sigma = ref(torch.from_numpy(x[:, :xyz]), sigma_only=True).numpy()
        got_sigma = np.asarray(
            ours.apply({"params": params}, jnp.asarray(x[:, :xyz]), sigma_only=True)
        )
        np.testing.assert_allclose(got_sigma, want_sigma, atol=2e-5)

    def test_embedding_parity(self, ref_nerf_mod, rng):
        """Reference Embedding (interleaved sin/cos per frequency) vs
        positional_encoding (reference models/nerf.py:4-38)."""
        import jax.numpy as jnp

        from neurofluid_tpu.models.embedding import positional_encoding

        for n_freqs, logscale in ((10, True), (4, True), (4, False)):
            emb = ref_nerf_mod.Embedding(3, n_freqs, logscale=logscale)
            x = rng.normal(size=(9, 3)).astype(np.float32)
            with torch.no_grad():
                want = emb(torch.from_numpy(x)).numpy()
            got = np.asarray(
                positional_encoding(jnp.asarray(x), n_freqs, logscale=logscale)
            )
            np.testing.assert_allclose(got, want, atol=1e-6)


class TestRayUtilsOracle:
    def test_ray_directions_and_rays(self, ref_ray_utils, rng):
        """Reference get_ray_directions/get_rays (utils/ray_utils.py:85-130)
        vs ops/ray_ops."""
        import jax.numpy as jnp

        from neurofluid_tpu.ops import ray_ops

        h, w, focal = 12, 16, 20.0
        want_dirs = ref_ray_utils.get_ray_directions(h, w, focal).numpy()
        got_dirs = np.asarray(ray_ops.get_ray_directions(h, w, focal))
        np.testing.assert_allclose(got_dirs, want_dirs, atol=1e-6)

        c2w = rng.normal(size=(3, 4)).astype(np.float32)
        want_o, want_d = ref_ray_utils.get_rays(
            torch.from_numpy(want_dirs), torch.from_numpy(c2w)
        )
        got_o, got_d = ray_ops.get_rays(jnp.asarray(got_dirs), jnp.asarray(c2w))
        np.testing.assert_allclose(np.asarray(got_o), want_o.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_d), want_d.numpy(), atol=1e-5)

    def test_coarse_sample_ray(self, ref_ray_utils, rng):
        """Reference coarse_sample_ray (utils/ray_utils.py:232-256),
        deterministic path."""
        import jax.numpy as jnp

        from neurofluid_tpu.ops import ray_ops

        rays = rng.normal(size=(7, 6)).astype(np.float32)
        for use_disp in (False, True):
            want_z, want_xyz = ref_ray_utils.coarse_sample_ray(
                9.0, 13.0, torch.from_numpy(rays), 16, use_disp, 0.0
            )
            got_z, got_xyz = ray_ops.coarse_sample_rays(
                9.0, 13.0, jnp.asarray(rays), 16, use_disp=use_disp
            )
            np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(got_xyz), want_xyz.numpy(), atol=1e-4
            )

    def test_sample_pdf_det(self, ref_ray_utils, rng):
        """Reference sample_pdf det path (utils/ray_utils.py:178-220)."""
        import jax.numpy as jnp

        from neurofluid_tpu.ops import ray_ops

        bins = np.sort(rng.uniform(9.0, 13.0, size=(5, 63)).astype(np.float32), -1)
        weights = rng.uniform(0.0, 1.0, size=(5, 62)).astype(np.float32)
        # a few exact zeros exercise the 1e-5 floor
        weights[:, ::7] = 0.0
        want = ref_ray_utils.sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), 32, det=True
        ).numpy()
        got = np.asarray(
            ray_ops.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 32, det=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_importance_sampling_det(self, ref_ray_utils, rng):
        """Reference ImportanceSampling (utils/ray_utils.py:222-229)."""
        import jax.numpy as jnp

        from neurofluid_tpu.ops import ray_ops

        n_rays, n_coarse = 6, 24
        z = np.broadcast_to(
            np.linspace(9.0, 13.0, n_coarse, dtype=np.float32), (n_rays, n_coarse)
        ).copy()
        weights = rng.uniform(0.0, 1.0, size=(n_rays, n_coarse)).astype(np.float32)
        rays_o = rng.normal(size=(n_rays, 3)).astype(np.float32)
        rays_d = rng.normal(size=(n_rays, 3)).astype(np.float32)
        want_xyz, want_z = ref_ray_utils.ImportanceSampling(
            torch.from_numpy(z), torch.from_numpy(weights), 16,
            torch.from_numpy(rays_o), torch.from_numpy(rays_d), True,
        )
        got_xyz, got_z = ray_ops.importance_sampling(
            jnp.asarray(z), jnp.asarray(weights), 16,
            jnp.asarray(rays_o), jnp.asarray(rays_d), det=True,
        )
        np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_xyz), want_xyz.numpy(), atol=1e-3)


class TestSchedulerOracle:
    def test_exponential_lr(self, ref_lr):
        """Reference ExponentialLR gamma^(epoch/decay_epochs)
        (utils/lr_schedulers.py:3-12) vs train.schedules.exponential_decay."""
        from neurofluid_tpu.train import schedules

        lin = torch.nn.Linear(2, 2)
        opt = torch.optim.Adam(lin.parameters(), lr=5e-4)
        sched = ref_lr.ExponentialLR(opt, decay_epochs=10000, gamma=0.1)
        ours = schedules.exponential_decay(5e-4, decay_epochs=10000, gamma=0.1)
        for step in range(0, 30000, 1500):
            want = 5e-4 * 0.1 ** (step / 10000)
            # drive the torch scheduler to `step`
            while sched.last_epoch < step:
                sched.step()
            got_ref = opt.param_groups[0]["lr"]
            np.testing.assert_allclose(got_ref, want, rtol=1e-6)
            np.testing.assert_allclose(float(ours(step)), got_ref, rtol=1e-6)

    def test_warmup_exponential_lr(self, ref_lr):
        """Reference WarmupExponentialLR (utils/lr_schedulers.py:14-35)."""
        from neurofluid_tpu.train import schedules

        lin = torch.nn.Linear(2, 2)
        opt = torch.optim.Adam(lin.parameters(), lr=1e-3)
        sched = ref_lr.WarmupExponentialLR(
            opt, decay_epochs=5000, warmup_epochs=500, gamma=0.1
        )
        ours = schedules.warmup_exponential_decay(
            1e-3, decay_epochs=5000, warmup_epochs=500, gamma=0.1
        )
        for step in range(0, 8000, 250):
            while sched.last_epoch < step:
                sched.step()
            got_ref = opt.param_groups[0]["lr"]
            np.testing.assert_allclose(
                float(ours(step)), got_ref, rtol=1e-5,
                err_msg=f"step {step}",
            )
