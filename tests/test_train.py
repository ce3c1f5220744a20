"""Training-layer tests: losses, schedules, checkpointing, tiny stage runs."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neurofluid_tpu.train import losses, schedules
from neurofluid_tpu.train import checkpoint as ckpt


class TestLosses:
    def test_boundary_loss_zero_inside(self):
        bounds = losses.default_box_bounds()
        pos = jnp.asarray([[0.0, 0.0, 0.0], [0.5, -0.5, 1.0]])
        assert float(losses.boundary_loss(pos, bounds)) == 0.0

    def test_boundary_loss_outside_value(self):
        bounds = losses.default_box_bounds()
        # one coordinate 0.125 past +x bound (0.975): L1 mean = 0.125/6
        pos = jnp.asarray([[1.1, 0.0, 0.0]])
        np.testing.assert_allclose(
            float(losses.boundary_loss(pos, bounds)), 0.125 / 3, rtol=1e-5
        )

    def test_boundary_bounds_match_reference(self):
        b = losses.default_box_bounds()
        np.testing.assert_allclose(np.asarray(b.lower), [-0.975, -0.975, -0.975])
        np.testing.assert_allclose(np.asarray(b.upper), [0.975, 0.975, 2.4302])

    def test_weighted_mse_golden(self):
        pred = jnp.asarray([[1.0, 0.0, 0.0]])
        gt = jnp.zeros((1, 3))
        nn = jnp.asarray([40.0])
        # importance = e^-1, dist = 1, dist^0.5 = 1
        np.testing.assert_allclose(
            float(losses.weighted_mse_loss(pred, gt, nn)), np.exp(-1.0), rtol=1e-5
        )

    def test_psnr(self):
        mse = jnp.asarray(0.01)
        np.testing.assert_allclose(float(losses.mse_to_psnr(mse)), 20.0, rtol=1e-5)


class TestSchedules:
    def test_exponential_matches_reference_formula(self):
        s = schedules.exponential_decay(5e-4, 10000, gamma=0.1)
        np.testing.assert_allclose(float(s(0)), 5e-4, rtol=1e-6)
        np.testing.assert_allclose(float(s(10000)), 5e-5, rtol=1e-6)
        np.testing.assert_allclose(float(s(5000)), 5e-4 * 0.1**0.5, rtol=1e-6)

    def test_warmup_exponential(self):
        s = schedules.warmup_exponential_decay(1e-3, 10000, warmup_epochs=100)
        np.testing.assert_allclose(float(s(0)), 1e-3 / 100, rtol=1e-5)
        np.testing.assert_allclose(float(s(99)), 1e-3, rtol=1e-5)
        assert float(s(200)) < 1e-3

    def test_e2e_piecewise_tables(self):
        """Factor chosen by step > boundary (reference trainer_e2e.py:103-110)."""
        r = schedules.e2e_renderer_schedule(3e-4)
        np.testing.assert_allclose(float(r(10000)), 3e-4, rtol=1e-6)  # not yet >
        np.testing.assert_allclose(float(r(10001)), 1.5e-4, rtol=1e-6)
        np.testing.assert_allclose(float(r(200000)), 3e-4 * 0.125, rtol=1e-6)
        t = schedules.e2e_transition_schedule(1e-5)
        np.testing.assert_allclose(float(t(300001)), 1e-5 * 0.03125, rtol=1e-6)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        state = {
            "step": 7,
            "params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
        }
        d = str(tmp_path / "models")
        ckpt.save_checkpoint(d, 7, state)
        restored, step = ckpt.restore_checkpoint(d)
        assert step == 7
        np.testing.assert_allclose(restored["params"]["a"], state["params"]["a"])

    def test_latest_step(self, tmp_path):
        d = str(tmp_path / "models")
        for s in (5, 20, 10):
            ckpt.save_checkpoint(d, s, {"x": np.zeros(2)})
        assert ckpt.latest_step(d) == 20

    def test_partial_merge_sigma_xyz_only(self):
        target = {
            "nerf_coarse": {
                "sigma": {"kernel": np.zeros(3)},
                "xyz_encoding_1": {"kernel": np.zeros(3)},
                "rgb": {"kernel": np.zeros(3)},
            }
        }
        loaded = {
            "nerf_coarse": {
                "sigma": {"kernel": np.ones(3)},
                "xyz_encoding_1": {"kernel": np.ones(3)},
                "rgb": {"kernel": np.ones(3)},
            }
        }
        merged = ckpt.merge_renderer_params(target, loaded, partial_load=True)
        np.testing.assert_allclose(merged["nerf_coarse"]["sigma"]["kernel"], 1.0)
        np.testing.assert_allclose(merged["nerf_coarse"]["xyz_encoding_1"]["kernel"], 1.0)
        np.testing.assert_allclose(merged["nerf_coarse"]["rgb"]["kernel"], 0.0)

    def test_full_merge_tolerates_extra_keys(self):
        target = {"a": {"w": np.zeros(2)}}
        loaded = {"a": {"w": np.ones(2)}, "extra": {"w": np.ones(2)}}
        merged = ckpt.merge_renderer_params(target, loaded)
        np.testing.assert_allclose(merged["a"]["w"], 1.0)


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    from neurofluid_tpu.data import synthetic

    root = str(tmp_path_factory.mktemp("scene"))
    synthetic.generate_blender_scene(
        root, n_frames=4, n_side=3, img_wh=(24, 24),
        train_views=("view_1",), test_views=("view_5",),
    )
    return root


def _scene_cfg(root):
    return dict(
        data_type="splishsplash", near=9.0, far=13.0, gravity=[0.0, 0.0, -9.81],
        train=dict(start_index=0, end_index=4, path=root,
                   views=dict(warmup=["view_1"], dynamic=["view_1"])),
        test=dict(start_index=0, end_index=4, path=root, views=["view_5"]),
    )


def _tiny_renderer_cfg():
    return dict(
        ray=dict(ray_chunk=64, N_importance=4, N_samples=8),
        NN_search=dict(fix_radius=True, particle_radius=0.025,
                       search_radius_scale=9.0, N_neighbor=6, backend="brute"),
        encoding=dict(density=True, var=True, smoothed_pos=True,
                      smoothed_dir=True, exclude_ray=True,
                      same_smooth_factor=False),
        use_mask=True,
    )


class TestWarmupTrainer:
    @pytest.mark.slow
    def test_few_steps_reduce_loss(self, tiny_scene, tmp_path):
        from neurofluid_tpu.utils.config import ConfigNode
        from neurofluid_tpu.train.warmup import WarmupTrainer

        cfg = ConfigNode(
            dict(
                expdir=str(tmp_path), expname="warmup", resume_from="",
                TRAIN=dict(seed=10, N_iters=10, precrop_iters=1, save_interval=1000,
                           log_interval=100, imgW=24, imgH=24, scale=1.0,
                           LR=dict(lr=5e-3, use_scheduler=True, decay_epochs=10000),
                           pretrained_renderer="", partial_load=False),
                TEST=dict(imgW=24, imgH=24, scale=1.0, start_index=0, end_index=4),
                RENDERER=_tiny_renderer_cfg(),
                **_scene_cfg(tiny_scene),
            )
        )
        tr = WarmupTrainer(cfg)
        loss = tr.train(n_iters=10)
        assert np.isfinite(loss)
        res = tr.eval(9)
        assert np.isfinite(res["view_5"]["psnr_1"])
        tr.save_checkpoint(9)
        assert os.path.isdir(os.path.join(tr.modelpath, "9"))


class TestE2ETrainer:
    @pytest.mark.slow
    def test_train_and_resume(self, tiny_scene, tmp_path):
        from neurofluid_tpu.utils.config import ConfigNode
        from neurofluid_tpu.train.e2e import E2ETrainer

        cfg = ConfigNode(
            dict(
                expdir=str(tmp_path), expname="e2e", resume_from="",
                TRAIN=dict(seed=10, epochs=1, precrop_iters=1, save_interval=10000,
                           log_interval=100, imgW=24, imgH=24, scale=1.0,
                           grad_clip_value=0,
                           LR=dict(trans_lr=1e-5, renderer_lr=3e-4, use_scheduler=True),
                           loss_weight=dict(boundary_loss=1.0),
                           pretrained_renderer="", pretrained_transition_model="",
                           partial_load=False, search_backend="brute"),
                TEST=dict(imgW=24, imgH=24, scale=1.0, start_index=0, end_index=4),
                RENDERER=_tiny_renderer_cfg(),
                **_scene_cfg(tiny_scene),
            )
        )
        tr = E2ETrainer(cfg)
        loss = tr.train(n_epochs=1, eval_during_training=False)
        assert np.isfinite(loss)
        avg, _ = tr.eval(3, render_frames=(0,), save_obj=False)
        assert np.isfinite(avg)
        tr.save_checkpoint(3)

        cfg2 = cfg.clone()
        cfg2.resume_from = tr.modelpath
        tr2 = E2ETrainer(cfg2)
        assert tr2.start_step == 4

    @pytest.mark.slow
    def test_anchor_loss_runs(self, tiny_scene, tmp_path):
        """Renderer-protection anchor (make_e2e_train_step with_anchor): the
        step renders frame-0 GT particles on warmup views alongside the
        joint objective; smoke-checks the wiring + that the anchored loss
        stays finite and the anchor term increases the total (extra
        positive MSE)."""
        from neurofluid_tpu.utils.config import ConfigNode
        from neurofluid_tpu.train.e2e import E2ETrainer

        cfg = ConfigNode(
            dict(
                expdir=str(tmp_path), expname="e2e_anchor", resume_from="",
                TRAIN=dict(seed=10, epochs=1, precrop_iters=1, save_interval=10000,
                           log_interval=100, imgW=24, imgH=24, scale=1.0,
                           grad_clip_value=0,
                           LR=dict(trans_lr=1e-5, renderer_lr=3e-4, use_scheduler=True),
                           loss_weight=dict(boundary_loss=1.0),
                           anchor=dict(enabled=True, weight=1.0, rays=32,
                                       n_views=1),
                           pretrained_renderer="", pretrained_transition_model="",
                           partial_load=False, search_backend="brute"),
                TEST=dict(imgW=24, imgH=24, scale=1.0, start_index=0, end_index=4),
                RENDERER=_tiny_renderer_cfg(),
                **_scene_cfg(tiny_scene),
            )
        )
        tr = E2ETrainer(cfg)
        assert tr.anchor_enabled and tr.anchor_data is not None
        loss = tr.train(n_epochs=1, eval_during_training=False)
        assert np.isfinite(loss)


class TestOverflowPolicy:
    def _stub_trainer(self, tmp_path, policy=None):
        from neurofluid_tpu.utils.config import ConfigNode
        from neurofluid_tpu.train.trainer_base import TrainerBase

        train = dict(seed=0)
        if policy is not None:
            train["on_search_overflow"] = policy
        cfg = ConfigNode(dict(expdir=str(tmp_path), expname="x", TRAIN=train))
        return TrainerBase(cfg)

    def test_raises_by_default(self, tmp_path):
        tr = self._stub_trainer(tmp_path)
        tr.check_search_overflow(False, 0, "ctx")  # no-op on clean flag
        with pytest.raises(RuntimeError, match="overflow"):
            tr.check_search_overflow(True, 0, "ctx")

    def test_warn_policy(self, tmp_path):
        tr = self._stub_trainer(tmp_path, policy="warn")
        tr.check_search_overflow(True, 0, "ctx")  # logs, does not raise


class TestE2ESingleOptimizer:
    @pytest.mark.slow
    def test_transition_follows_renderer_boundaries(self, tiny_scene, tmp_path):
        """seperate_render_transition=False = the reference's single-Adam
        mode (reference trainer_e2e.py:71-86): both groups keep their base
        LRs but share the RENDERER piecewise schedule."""
        from neurofluid_tpu.utils.config import ConfigNode
        from neurofluid_tpu.train.e2e import E2ETrainer

        cfg = ConfigNode(
            dict(
                expdir=str(tmp_path), expname="e2e_single", resume_from="",
                TRAIN=dict(seed=10, epochs=1, precrop_iters=1, save_interval=10000,
                           log_interval=1, imgW=24, imgH=24, scale=1.0,
                           grad_clip_value=0.5, seperate_render_transition=False,
                           LR=dict(trans_lr=1e-5, renderer_lr=3e-4, use_scheduler=True),
                           loss_weight=dict(boundary_loss=1.0),
                           pretrained_renderer="", pretrained_transition_model="",
                           partial_load=False, search_backend="brute"),
                TEST=dict(imgW=24, imgH=24, scale=1.0, start_index=0, end_index=4),
                RENDERER=_tiny_renderer_cfg(),
                **_scene_cfg(tiny_scene),
            )
        )
        tr = E2ETrainer(cfg)
        # renderer boundaries (10k/75k/150k), NOT the transition table
        np.testing.assert_allclose(float(tr.sched_t(10001)), 0.5e-5, rtol=1e-6)
        np.testing.assert_allclose(float(tr.sched_t(30001)), 0.5e-5, rtol=1e-6)
        np.testing.assert_allclose(float(tr.sched_t(75001)), 0.25e-5, rtol=1e-6)
        # grad_clip_value=0.5 + log_interval=1: exercise the clip path and
        # the before/after grad-norm + neighbor-count histogram logging
        # (reference trainer_e2e.py:247-253, 268-276)
        loss = tr.train(n_epochs=1, eval_during_training=False)
        assert np.isfinite(loss)
        import json
        events = [json.loads(l) for l in open(
            os.path.join(tr.exppath, "metrics.jsonl"))]
        tags = {e["tag"] for e in events}
        assert "train/grad_hist_renderer_before" in tags
        assert "train/grad_hist_transition_after" in tags
        assert "view_1/num_neighbors_1" in tags
        # separate mode uses the transition table
        cfg2 = cfg.clone()
        cfg2.expname = "e2e_sep"
        cfg2.TRAIN.seperate_render_transition = True
        tr2 = E2ETrainer(cfg2)
        np.testing.assert_allclose(float(tr2.sched_t(30001)), 0.25e-5, rtol=1e-6)


class TestConfigValidation:
    def test_defaults_pass(self):
        from neurofluid_tpu.utils import config as cfg_mod

        for stage in ("warmup", "transmodel", "end2end"):
            cfg = cfg_mod.load_config(stage)
            cfg.merge(cfg_mod.dataset_config()["watercube"])
            cfg.merge(dict(expdir="exps", expname="x", dataset="watercube",
                           config="", dataset_config="", resume_from=""))
            cfg_mod.validate_keys(cfg, stage)  # must not raise

    def test_unknown_key_raises(self):
        from neurofluid_tpu.utils import config as cfg_mod

        cfg = cfg_mod.load_config("end2end")
        cfg.RENDERER.encoding["smoothed_po"] = True  # typo
        with pytest.raises(ValueError, match="smoothed_po"):
            cfg_mod.validate_keys(cfg, "end2end")

    def test_unknown_nested_section_raises(self):
        from neurofluid_tpu.utils import config as cfg_mod

        cfg = cfg_mod.load_config("warmup")
        cfg.merge({"RENDERR": {"use_mask": True}})
        with pytest.raises(ValueError, match="RENDERR"):
            cfg_mod.validate_keys(cfg, "warmup")


class TestTransitionTrainer:
    def test_one_epoch(self, tiny_scene, tmp_path):
        from neurofluid_tpu.utils.config import ConfigNode
        from neurofluid_tpu.train.transition import TransitionTrainer

        cfg = ConfigNode(
            dict(
                expdir=str(tmp_path), expname="trans", resume_from="",
                TRAIN=dict(seed=10, N_iters=1, save_interval=100, log_interval=100,
                           lr=1e-4, grad_clip_value=1.0, start_index=0, end_index=4,
                           particle_radius=0.025, gravity=[0.0, 0.0, -9.81],
                           pretrained="", search_backend="brute",
                           datapath=dict(train=tiny_scene, train_datatype="blender_all",
                                         eval=tiny_scene, eval_datatype="blender_all")),
            )
        )
        tr = TransitionTrainer(cfg)
        loss = tr.train(n_epochs=1)
        assert np.isfinite(loss)
        avg = tr.eval(1, save_obj=False)
        assert np.isfinite(avg)

    def test_remat_policy_matches_plain_checkpoint(self, rng):
        """The trainer's save_only_these_names("nbr_static") remat policy
        (train/transition.py) must not change gradients vs plain
        jax.checkpoint — it only exempts the discrete search products
        (particle_net._name_static) from backward recompute."""
        import functools

        import jax
        import jax.numpy as jnp

        from neurofluid_tpu.models.particle_net import ParticleNet

        net = ParticleNet(
            search_backend="grid", fluid_neighbor_k=16,
            obstacle_neighbor_k=16, grid_max_per_cell=16,
            gravity=(0, 0, -9.81),
        )
        pos = jnp.asarray(rng.uniform(-0.5, 0.5, (128, 3)), jnp.float32)
        vel = jnp.asarray(rng.normal(size=(128, 3)) * 0.1, jnp.float32)
        box = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)), jnp.float32)
        nrm = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        params = net.init(jax.random.key(0), pos, vel, box, nrm)

        def grads_with(ck):
            one = ck(lambda p, x, v: net.apply(p, x, v, box, nrm))

            def loss(p):
                p1, v1, nn = one(p, pos, vel)
                p2, v2, _ = one(p, p1, v1)
                return jnp.sum(p2**2) + jnp.sum(v2**2) + jnp.sum(nn)

            return jax.grad(loss)(params)

        ga = jax.jit(lambda: grads_with(jax.checkpoint))()
        policy = functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.save_only_these_names("nbr_static"),
        )
        gb = jax.jit(lambda: grads_with(policy))()
        la, lb = jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
        assert max(float(jnp.max(jnp.abs(a))) for a in la) > 0
        for a, b in zip(la, lb):
            np.testing.assert_allclose(a, b, atol=2e-6)


class TestResumeScheduleOffset:
    @pytest.mark.slow
    def test_warmup_resume_continues_lr_schedule(self, tiny_scene, tmp_path):
        """Round-1 weak item: resume-at-step -> schedule-offset interaction.

        The warmup optimizer's exponential decay is driven by the optax
        step count inside the restored optimizer state; after resume the
        effective LR must continue from the saved step, not restart
        (reference trainer_renderer.py restores the optimizer for the same
        reason). The e2e stage deliberately does NOT restore optimizer
        state (reference trainer_e2e.py:145-149) so its schedules restart —
        also pinned here."""
        from neurofluid_tpu.utils.config import ConfigNode
        from neurofluid_tpu.train.warmup import WarmupTrainer

        cfg = ConfigNode(
            dict(
                expdir=str(tmp_path), expname="warmup_res", resume_from="",
                TRAIN=dict(seed=10, N_iters=4, precrop_iters=0, save_interval=1000,
                           log_interval=100, imgW=24, imgH=24, scale=1.0,
                           LR=dict(lr=5e-3, use_scheduler=True, decay_epochs=10),
                           pretrained_renderer="", partial_load=False),
                TEST=dict(imgW=24, imgH=24, scale=1.0, start_index=0, end_index=4),
                RENDERER=_tiny_renderer_cfg(),
                **_scene_cfg(tiny_scene),
            )
        )
        tr = WarmupTrainer(cfg)
        tr.train(n_iters=4)
        tr.save_checkpoint(3)

        def opt_count(state):
            import optax
            leaves = [
                l for l in jax.tree_util.tree_leaves(state)
                if getattr(l, "dtype", None) is not None and l.dtype == np.int32
                and l.ndim == 0
            ]
            return max(int(l) for l in leaves)

        cfg2 = cfg.clone()
        cfg2.resume_from = tr.modelpath
        tr2 = WarmupTrainer(cfg2)
        assert tr2.start_step == 4
        # the restored optimizer count equals the completed steps, so the
        # exponential schedule resumes mid-decay instead of restarting
        assert opt_count(tr2.opt_state) == opt_count(tr.opt_state) == 4

        # e2e contract: resume restores weights only -> fresh opt state
        from neurofluid_tpu.train.e2e import E2ETrainer

        cfg3 = ConfigNode(
            dict(
                expdir=str(tmp_path), expname="e2e_res", resume_from="",
                TRAIN=dict(seed=10, epochs=1, precrop_iters=0, save_interval=10000,
                           log_interval=100, imgW=24, imgH=24, scale=1.0,
                           grad_clip_value=0,
                           LR=dict(trans_lr=1e-5, renderer_lr=3e-4, use_scheduler=True),
                           loss_weight=dict(boundary_loss=1.0),
                           pretrained_renderer="", pretrained_transition_model="",
                           partial_load=False, search_backend="brute"),
                TEST=dict(imgW=24, imgH=24, scale=1.0, start_index=0, end_index=4),
                RENDERER=_tiny_renderer_cfg(),
                **_scene_cfg(tiny_scene),
            )
        )
        te = E2ETrainer(cfg3)
        te.train(n_epochs=1, eval_during_training=False)
        te.save_checkpoint(3)
        cfg4 = cfg3.clone()
        cfg4.resume_from = te.modelpath
        te2 = E2ETrainer(cfg4)
        assert te2.start_step == 4
        assert opt_count(te2.opt_r_state) == 0  # fresh (reference quirk)


class TestChunkRendererParity:
    def test_scan_matches_fallback_on_ragged_ray_count(self, rng):
        """ADVICE r3: the scan renderer is the default path for every eval
        metric but had no parity test against the per-chunk fallback. Use a
        ray count that is NOT a multiple of the chunk so the padding path
        (repeat-last-ray, trim) is exercised, and compare every output key."""
        from neurofluid_tpu.models.render_net import RenderNet
        from neurofluid_tpu.train.trainer_base import TrainerBase

        net = RenderNet(
            near=1.0, far=3.0, n_samples=8, n_importance=4,
            nerf_depth=2, nerf_width=32, search_backend="brute",
            num_neighbors=6,
        )
        pos = jnp.asarray(rng.uniform(-0.4, 0.4, (60, 3)).astype(np.float32))
        ro = jnp.asarray([0.0, 0.0, 2.0], jnp.float32)
        n_rays, chunk = 21, 8  # 21 = 2 full chunks + ragged 5-ray tail
        d = np.tile([0.0, 0.0, -1.0], (n_rays, 1)).astype(np.float32)
        d[:, 0] += np.linspace(-0.15, 0.15, n_rays, dtype=np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(
            np.concatenate([np.tile(np.asarray(ro), (n_rays, 1)), d], -1)
        )
        params = net.init(jax.random.PRNGKey(0), pos, ro, rays[:chunk])

        # make_chunk_renderer reads nothing from self (method for API
        # grouping only) — call unbound to skip trainer scaffolding
        scan_rf = TrainerBase.make_chunk_renderer(
            None, net, chunk=chunk, use_scan=True
        )
        loop_rf = TrainerBase.make_chunk_renderer(
            None, net, chunk=chunk, use_scan=False
        )
        out_s = scan_rf(params, pos, ro, rays)
        out_l = loop_rf(params, pos, ro, rays)
        assert set(out_s) == set(out_l)
        for k in out_s:
            np.testing.assert_allclose(
                np.asarray(out_s[k]), np.asarray(out_l[k]),
                rtol=1e-5, atol=1e-5, err_msg=f"key {k}",
            )
            if np.asarray(out_s[k]).ndim >= 1 and out_s[k].shape[0] in (
                n_rays, n_rays * 8, n_rays * 12
            ):
                pass  # per-ray/per-sample outputs trimmed to the real count
