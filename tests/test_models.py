"""Model-level tests: NeRF MLP, ParticleNet transition model, RenderNet."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neurofluid_tpu.models import NeRF, ParticleNet, RenderNet
from neurofluid_tpu.models.embedding import embedding_channels, positional_encoding


class TestEmbedding:
    def test_channels_and_order(self):
        x = jnp.asarray([[0.5, -0.25, 1.0]])
        out = np.asarray(positional_encoding(x, 2))
        assert out.shape == (1, embedding_channels(3, 2)) == (1, 15)
        np.testing.assert_allclose(out[0, :3], [0.5, -0.25, 1.0])
        # interleaved per-frequency [sin(1x), cos(1x), sin(2x), cos(2x)]
        np.testing.assert_allclose(out[0, 3:6], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 6:9], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 9:12], np.sin([1.0, -0.5, 2.0]), atol=1e-6)

    def test_reference_channel_counts(self):
        # reference: xyz 63, dir 27, density 9 (renderer.py:30-36)
        assert embedding_channels(3, 10) == 63
        assert embedding_channels(3, 4) == 27
        assert embedding_channels(1, 4) == 9


class TestNeRF:
    def test_shapes_and_sigma_consistency(self, rng):
        model = NeRF(in_channels_xyz=63, in_channels_dir=27)
        x = jnp.asarray(rng.normal(size=(10, 90)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (10, 4)
        rgb = np.asarray(out[:, :3])
        assert np.all(rgb >= 0) and np.all(rgb <= 1)  # sigmoid head
        # sigma_only path must agree with the trunk's sigma
        sig = model.apply(params, x[:, :63], sigma_only=True)
        np.testing.assert_allclose(np.asarray(sig[:, 0]), np.asarray(out[:, 3]), atol=1e-5)

    def test_skip_connection_width(self):
        """Reference contract: input re-concatenated at layer index 4."""
        model = NeRF(in_channels_xyz=198, in_channels_dir=54)
        x = jnp.zeros((2, 252))
        params = model.init(jax.random.PRNGKey(0), x)
        k5 = params["params"]["xyz_encoding_5"]["kernel"]
        assert k5.shape == (256 + 198, 256)


def _scene(rng, n=200, m=80):
    pos = rng.uniform(-0.4, 0.4, size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    box = rng.uniform(-0.6, 0.6, size=(m, 3)).astype(np.float32)
    box[:, 2] = -0.5  # a floor
    nrm = np.zeros((m, 3), np.float32)
    nrm[:, 2] = 1.0
    return map(jnp.asarray, (pos, vel, box, nrm))


class TestParticleNet:
    def test_step_shapes_and_counts(self, rng):
        pos, vel, box, nrm = _scene(rng)
        net = ParticleNet(search_backend="brute")
        params = net.init(jax.random.PRNGKey(0), pos, vel, box, nrm)
        p1, v1, nn = net.apply(params, pos, vel, box, nrm)
        assert p1.shape == pos.shape and v1.shape == vel.shape
        assert np.all(np.isfinite(np.asarray(p1)))
        # neighbor counts match a scipy oracle (radius = extent/2, self excluded)
        from scipy.spatial import cKDTree

        dt = net.timestep
        g = np.asarray(net.gravity)
        veln = np.asarray(vel) + g * dt
        posn = np.asarray(pos) + (np.asarray(vel) + veln) / 2 * dt
        tree = cKDTree(posn)
        counts = np.asarray([len(tree.query_ball_point(p, 0.1125)) - 1 for p in posn])
        np.testing.assert_array_equal(np.asarray(nn).astype(int), counts)

    def test_gravity_only_when_correction_off(self, rng):
        pos, vel, box, nrm = _scene(rng, n=50, m=10)
        net = ParticleNet(correction_scale=0.0, search_backend="brute")
        params = net.init(jax.random.PRNGKey(0), pos, vel, box, nrm)
        p1, v1, _ = net.apply(params, pos, vel, box, nrm)
        dt = net.timestep
        g = np.asarray(net.gravity, np.float32)
        v_new = np.asarray(vel) + g * dt
        p_expect = np.asarray(pos) + (np.asarray(vel) + v_new) / 2 * dt
        np.testing.assert_allclose(np.asarray(p1), p_expect, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(v1), (p_expect - np.asarray(pos)) / dt, atol=1e-5
        )

    def test_translation_invariant_correction(self, rng):
        """CConv sees only relative offsets -> pos_correction is translation
        invariant (same shift applied to fluid + box)."""
        pos, vel, box, nrm = _scene(rng, n=60, m=20)
        net = ParticleNet(gravity=(0.0, 0.0, 0.0), search_backend="brute")
        params = net.init(jax.random.PRNGKey(0), pos, vel, box, nrm)
        p1, _, _ = net.apply(params, pos, vel, box, nrm)
        shift = jnp.asarray([0.13, -0.2, 0.07])
        p1s, _, _ = net.apply(params, pos + shift, vel, box + shift, nrm)
        np.testing.assert_allclose(
            np.asarray(p1s - p1), np.broadcast_to(np.asarray(shift), p1.shape),
            atol=5e-5,
        )

    @pytest.mark.slow
    def test_gradients_flow_to_positions_and_params(self, rng):
        pos, vel, box, nrm = _scene(rng, n=40, m=10)
        net = ParticleNet(search_backend="brute")
        params = net.init(jax.random.PRNGKey(0), pos, vel, box, nrm)

        def loss_pos(p):
            p1, v1, _ = net.apply(params, p, vel, box, nrm)
            return jnp.sum(p1**2)

        g = jax.grad(loss_pos)(pos)
        assert np.all(np.isfinite(np.asarray(g))) and np.any(np.asarray(g) != 0)

        def loss_params(pr):
            p1, _, _ = net.apply(pr, pos, vel, box, nrm)
            return jnp.sum(p1**2)

        gp = jax.grad(loss_params)(params)
        leaves = jax.tree_util.tree_leaves(gp)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(np.any(np.asarray(l) != 0) for l in leaves)

    @pytest.mark.slow
    def test_overflow_flagged_on_compressed_state(self, rng):
        """A compressed state (denser than grid_max_per_cell allows) must set
        diag['grid_overflow'] — the silent-candidate-drop failure mode."""
        # 2000 particles in one ~cell-sized blob (cell = r = 0.1125)
        pos = jnp.asarray(rng.uniform(-0.05, 0.05, size=(2000, 3)).astype(np.float32))
        vel = jnp.zeros_like(pos)
        box = jnp.asarray(rng.uniform(-0.6, 0.6, size=(30, 3)).astype(np.float32))
        nrm = jnp.zeros_like(box)
        net = ParticleNet(search_backend="grid")
        params = net.init(jax.random.PRNGKey(0), pos, vel, box, nrm)
        _, _, _, diag = net.apply(params, pos, vel, box, nrm, return_diag=True)
        assert bool(np.asarray(diag["grid_overflow"]))
        assert bool(np.asarray(diag["cap_exceeded"]))
        # rest-density state: no overflow, no cap hit
        side = np.arange(8, dtype=np.float32) * 0.05
        grid_pos = np.stack(np.meshgrid(side, side, side, indexing="ij"), -1)
        pos2 = jnp.asarray(grid_pos.reshape(-1, 3))
        _, _, _, diag2 = net.apply(
            params, pos2, jnp.zeros_like(pos2), box, nrm, return_diag=True
        )
        assert not bool(np.asarray(diag2["grid_overflow"]))
        assert not bool(np.asarray(diag2["cap_exceeded"]))

    def test_cap_k_reproduces_uncapped_on_compressed_state(self, rng):
        """fluid_neighbor_k=64 (nearest-K) vs effectively-uncapped K on a 2x
        compressed state: the poly6 window decays with distance, so dropping
        the farthest neighbors must stay within tolerance of the reference's
        uncapped Open3D CConv semantics (reference models/transmodel.py:80-98)."""
        # ~2x rest density: 0.04 spacing -> ~90 neighbors in r=0.1125
        side = np.arange(10, dtype=np.float32) * 0.04
        grid_pos = np.stack(np.meshgrid(side, side, side, indexing="ij"), -1)
        pos = jnp.asarray(grid_pos.reshape(-1, 3))
        pos = pos + jnp.asarray(rng.normal(size=pos.shape).astype(np.float32)) * 0.002
        vel = jnp.asarray(rng.normal(size=pos.shape).astype(np.float32)) * 0.1
        box = jnp.asarray(rng.uniform(-0.3, 0.7, size=(40, 3)).astype(np.float32))
        nrm = jnp.zeros_like(box)
        net64 = ParticleNet(search_backend="brute", fluid_neighbor_k=64)
        net_uncapped = ParticleNet(search_backend="brute", fluid_neighbor_k=160)
        params = net64.init(jax.random.PRNGKey(0), pos, vel, box, nrm)
        p64, v64, nn64, diag = net64.apply(params, pos, vel, box, nrm, return_diag=True)
        pu, vu, nnu = net_uncapped.apply(params, pos, vel, box, nrm)
        # the capped run must notice it truncated
        assert bool(np.asarray(diag["cap_exceeded"]))
        # true counts identical regardless of cap
        np.testing.assert_array_equal(np.asarray(nn64), np.asarray(nnu))
        # position corrections within tolerance of uncapped
        dp = np.abs(np.asarray(p64) - np.asarray(pu))
        assert dp.max() < 5e-4, f"cap-64 deviates from uncapped by {dp.max()}"

    def test_grid_backend_matches_brute(self, rng):
        pos, vel, box, nrm = _scene(rng, n=120, m=30)
        net_b = ParticleNet(search_backend="brute")
        net_g = ParticleNet(search_backend="grid")
        params = net_b.init(jax.random.PRNGKey(0), pos, vel, box, nrm)
        p_b, v_b, nn_b = net_b.apply(params, pos, vel, box, nrm)
        p_g, v_g, nn_g = net_g.apply(params, pos, vel, box, nrm)
        np.testing.assert_array_equal(np.asarray(nn_b), np.asarray(nn_g))
        np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_g), atol=2e-5)

    def test_fused_cconv_backend_matches_brute(self, rng):
        """The selection-free fused backend (ops/fused_cconv) is exact
        UNCAPPED reference semantics — forward + counts must match the
        uncapped brute pipeline (interpret-mode kernels on CPU). Sized for
        the fast suite: tight grid bounds + coarse cells keep the
        interpret-mode group count low (cost scales with it); the op-level
        gradient parity lives in tests/test_fused_cconv.py and the
        full-model gradient parity in the slow variant below."""
        pos, vel, box, nrm = _scene(rng, n=64, m=24)
        tight = dict(grid_lower=(-0.5, -0.5, -0.65),
                     grid_upper=(0.5, 0.5, 0.55), fused_cell_scale=2.0,
                     layer_channels=(8, 24, 3))
        net_b = ParticleNet(search_backend="brute", fluid_neighbor_k=64,
                            layer_channels=(8, 24, 3))
        net_f = ParticleNet(search_backend="fused_cconv", **tight)
        params = net_b.init(jax.random.PRNGKey(0), pos, vel, box, nrm)
        p_b, v_b, nn_b = net_b.apply(params, pos, vel, box, nrm)
        p_f, v_f, nn_f, diag = net_f.apply(
            params, pos, vel, box, nrm, return_diag=True
        )
        assert not bool(diag["grid_overflow"])
        assert not bool(diag["cap_exceeded"])
        np.testing.assert_array_equal(np.asarray(nn_b), np.asarray(nn_f))
        np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_b), atol=2e-5)
        np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_b), atol=1.5e-3)

    @pytest.mark.slow
    def test_fused_cconv_gradients_match_brute(self, rng):
        """Full-model gradient parity (params AND positions) of the fused
        backend vs the uncapped brute pipeline at the default layer widths."""
        pos, vel, box, nrm = _scene(rng, n=96, m=32)
        tight = dict(grid_lower=(-0.5, -0.5, -0.65),
                     grid_upper=(0.5, 0.5, 0.55))
        net_b = ParticleNet(search_backend="brute", fluid_neighbor_k=96)
        net_f = ParticleNet(search_backend="fused_cconv", **tight)
        params = net_b.init(jax.random.PRNGKey(0), pos, vel, box, nrm)

        def loss(net, prm, pp):
            out_pos, out_vel, _ = net.apply(prm, pp, vel, box, nrm)
            w = jnp.cos(jnp.arange(out_pos.size, dtype=jnp.float32))
            return jnp.sum(out_pos * w.reshape(out_pos.shape))

        g_b = jax.grad(lambda prm, pp: loss(net_b, prm, pp), argnums=(0, 1))(
            params, pos
        )
        g_f = jax.grad(lambda prm, pp: loss(net_f, prm, pp), argnums=(0, 1))(
            params, pos
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_b), jax.tree_util.tree_leaves(g_f)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5
            )

    def test_fused_cconv_box_plan_reuse(self, rng):
        """`make_grid` returns a candidate-only CConvPlan on the fused
        backend; passing it as `box_grid` must match the rebuilt-inside path
        (the trainers' static-box optimization)."""
        pos, vel, box, nrm = _scene(rng, n=48, m=24)
        net_f = ParticleNet(search_backend="fused_cconv",
                            grid_lower=(-0.5, -0.5, -0.65),
                            grid_upper=(0.5, 0.5, 0.55),
                            fused_cell_scale=2.0,
                            layer_channels=(8, 24, 3))
        params = net_f.init(jax.random.PRNGKey(0), pos, vel, box, nrm)
        plan = net_f.make_grid(box)
        from neurofluid_tpu.ops.fused_cconv import CConvPlan

        assert isinstance(plan, CConvPlan)
        p0, v0, n0 = net_f.apply(params, pos, vel, box, nrm)
        p1, v1, n1 = net_f.apply(params, pos, vel, box, nrm, box_grid=plan)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-7)
        np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))


def _tiny_renderer(**kw):
    defaults = dict(
        near=1.0, far=3.0, n_samples=8, n_importance=4,
        nerf_depth=2, nerf_width=32, search_backend="brute",
    )
    defaults.update(kw)
    return RenderNet(**defaults)


class TestRenderNet:
    def _rays(self, n):
        o = np.tile(np.asarray([0.0, 0.0, 2.0], np.float32), (n, 1))
        d = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (n, 1))
        d += np.linspace(0, 0.1, n, dtype=np.float32)[:, None] * np.asarray(
            [1.0, 0, 0], np.float32
        )
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(np.concatenate([o, d], -1))

    @pytest.mark.slow
    def test_full_render_shapes(self, rng):
        model = _tiny_renderer()
        particles = jnp.asarray(rng.uniform(-0.3, 0.3, size=(100, 3)).astype(np.float32))
        rays = self._rays(6)
        ro = jnp.asarray([0.0, 0.0, 2.0])
        params = model.init(jax.random.PRNGKey(0), particles, ro, rays)
        out = model.apply(params, particles, ro, rays)
        assert out["rgb0"].shape == (6, 3)
        assert out["rgb1"].shape == (6, 3)
        assert out["opacity0"].shape == (6,)
        assert out["num_nn_0"].shape == (6 * 8, 1)
        assert out["num_nn_1"].shape == (6 * 12, 1)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))

    @pytest.mark.slow
    def test_empty_scene_renders_white(self, rng):
        """use_mask zeroes sigma outside the fluid; empty space -> white."""
        model = _tiny_renderer()
        particles = jnp.asarray(
            rng.uniform(-0.3, 0.3, size=(50, 3)).astype(np.float32) + 100.0
        )
        rays = self._rays(4)
        ro = jnp.asarray([0.0, 0.0, 2.0])
        params = model.init(jax.random.PRNGKey(0), particles, ro, rays)
        out = model.apply(params, particles, ro, rays)
        np.testing.assert_allclose(np.asarray(out["rgb0"]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["rgb1"]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["mask_0"]), 0.0)

    @pytest.mark.slow
    def test_mask_semantics_requires_full_k(self, rng):
        """A sample with 0 < n < K neighbors is masked out (torch.all)."""
        model = _tiny_renderer(num_neighbors=20, use_mask=True)
        # 5 particles only -> never 20 neighbors -> all masked
        particles = jnp.asarray(rng.uniform(-0.1, 0.1, size=(5, 3)).astype(np.float32))
        rays = self._rays(3)
        ro = jnp.asarray([0.0, 0.0, 2.0])
        params = model.init(jax.random.PRNGKey(0), particles, ro, rays)
        out = model.apply(params, particles, ro, rays)
        np.testing.assert_allclose(np.asarray(out["mask_0"]), 0.0)
        np.testing.assert_allclose(np.asarray(out["rgb0"]), 1.0, atol=1e-6)

    @pytest.mark.slow
    def test_coarse_and_fine_rendering_paths(self, rng):
        model = _tiny_renderer()
        particles = jnp.asarray(rng.uniform(-0.3, 0.3, size=(80, 3)).astype(np.float32))
        rays = self._rays(4)
        ro = jnp.asarray([0.0, 0.0, 2.0])
        params = model.init(jax.random.PRNGKey(0), particles, ro, rays)
        coarse = model.apply(params, particles, ro, rays, method=model.coarse_rendering)
        assert set(coarse) == {
            "rgb0", "depth0", "opacity0", "num_nn_0", "mask_0", "overflow"
        }
        fine = model.apply(params, particles, ro, rays, method=model.fine_rendering)
        assert set(fine) == {
            "rgb1", "depth1", "opacity1", "num_nn_1", "mask_1", "overflow"
        }
        full = model.apply(params, particles, ro, rays)
        # deterministic coarse pass agrees between entry points
        np.testing.assert_allclose(
            np.asarray(coarse["rgb0"]), np.asarray(full["rgb0"]), atol=1e-6
        )

    @pytest.mark.slow
    def test_gradients_flow_to_particles(self, rng):
        """Image loss -> particle positions: the core NeuroFluid property."""
        model = _tiny_renderer(num_neighbors=4, use_mask=False)
        particles = jnp.asarray(rng.uniform(-0.2, 0.2, size=(60, 3)).astype(np.float32))
        rays = self._rays(2)
        ro = jnp.asarray([0.0, 0.0, 2.0])
        params = model.init(jax.random.PRNGKey(0), particles, ro, rays)

        def loss(p):
            out = model.apply(params, p, ro, rays)
            return jnp.mean(out["rgb1"] ** 2) + jnp.mean(out["rgb0"] ** 2)

        g = jax.grad(loss)(particles)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.abs(np.asarray(g)) > 0)

    def test_input_channel_count_matches_reference(self):
        model = _tiny_renderer()
        # reference default encodings: xyz 63+9+63+63=198, dir 27+27=54
        assert model.in_channels_xyz == 198
        assert model.in_channels_dir == 54

    def _smoothing_oracle(self, flat_xyz, nbrs, particles, radius,
                          exclude_ray, same_smooth_factor):
        """Reference smoothing_position in numpy (reference renderer.py:96-109):
        masked gather pads neighbors with the ORIGIN, weights include padding,
        and the exclude_ray=False branch alpha-blends with the ray position
        using num_nn from dists.ne(0)."""
        idx = np.asarray(nbrs.idx)
        mask = np.asarray(nbrs.mask)
        pts = np.asarray(particles)
        q = np.asarray(flat_xyz)
        nb = np.where(mask[..., None], pts[np.maximum(idx, 0)], 0.0)  # (Q,K,3)
        d = np.linalg.norm(nb - q[:, None, :], axis=-1)
        w = np.clip(1.0 - (d / radius) ** 3, 0.0, None)
        weighted = (w[..., None] * nb).sum(1) / (w.sum(1, keepdims=True) + 1e-12)
        if exclude_ray:
            return weighted
        num_nn = np.asarray(nbrs.sq_dists != 0).sum(-1, keepdims=True)
        if same_smooth_factor:
            alpha = np.full((q.shape[0], 1), 0.9)
        else:
            alpha = np.where(num_nn <= 20, 0.1, 0.9)
        return q * (1.0 - alpha) + weighted * alpha

    @pytest.mark.parametrize(
        "exclude_ray,same_smooth_factor",
        [(True, False), (False, False), (False, True)],
    )
    def test_smoothing_branches_match_oracle(self, rng, exclude_ray,
                                             same_smooth_factor):
        """All three smoothing modes vs a numpy oracle of the reference
        (reference models/renderer.py:96-109). The smoothed position is read
        back out of the feature vector (PE includes the raw input as its
        first 3 channels)."""
        from neurofluid_tpu.ops import neighbor_search as ns

        model = _tiny_renderer(
            exclude_ray=exclude_ray, same_smooth_factor=same_smooth_factor,
            num_neighbors=8,
        )
        particles = jnp.asarray(
            rng.uniform(-0.3, 0.3, size=(60, 3)).astype(np.float32)
        )
        rays = self._rays(3)
        ro = jnp.asarray([0.0, 0.0, 2.0])
        n_s = 8
        z = np.linspace(1.0, 3.0, n_s, dtype=np.float32)
        sample_xyz = jnp.asarray(
            np.asarray(rays)[:, None, :3]
            + np.asarray(rays)[:, None, 3:] * z[None, :, None]
        )
        flat = sample_xyz.reshape(-1, 3)
        nbrs = ns.ball_query(flat, particles, model.search_radius, 8)

        params = model.init(jax.random.PRNGKey(0), particles, ro, rays)
        feats, num_nn, full_mask = model.apply(
            params, particles, sample_xyz, rays, ro, nbrs,
            method=RenderNet._local_features,
        )
        # feature layout: xyz PE (63) | density PE (9) | smoothed_pos PE (63)
        got = np.asarray(feats[:, 72:75])
        want = self._smoothing_oracle(
            flat, nbrs, particles, model.search_radius,
            exclude_ray, same_smooth_factor,
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_overflow_flag_grid_backend(self, rng):
        """Grid cells fuller than grid_max_per_cell must FLAG, never silently
        drop (overflow policy)."""
        model = _tiny_renderer(
            search_backend="grid", grid_max_per_cell=8, num_neighbors=4
        )
        # 500 particles crammed into one search-radius cell (0.225)
        particles = jnp.asarray(
            rng.uniform(-0.05, 0.05, size=(500, 3)).astype(np.float32)
        )
        rays = self._rays(2)
        ro = jnp.asarray([0.0, 0.0, 2.0])
        params = model.init(jax.random.PRNGKey(0), particles, ro, rays)
        out = model.apply(params, particles, ro, rays)
        assert bool(np.asarray(out["overflow"]))
        # sparse scene: no overflow
        sparse = jnp.asarray(
            (rng.uniform(-0.4, 0.4, size=(40, 3))).astype(np.float32)
        )
        out2 = model.apply(params, sparse, ro, rays)
        assert not bool(np.asarray(out2["overflow"]))
