"""Evaluation drivers (the "serve" analogs).

- `E2EEvaluator`: counterpart of reference eval_e2e.py:26-160 — load a joint
  checkpoint, autoregressively roll the transition model over the full test
  sequence, report per-frame Pred2GT (trained-50 / rollout-10 windows in the
  reference's print format), dump pred/GT obj clouds, render every frame on
  the test views.
- `TransitionEvaluator`: counterpart of reference eval_transmodel.py — the
  particle-only rollout evaluation, including the clipped-positions variant
  metrics (strict box clip before scoring).
- `RendererEvaluator`: counterpart of reference eval_renderer.py — render a
  GT-particle sequence from a fixed camera with a warmup checkpoint.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from neurofluid_tpu.data.blender import BlenderDataset
from neurofluid_tpu.data import io as data_io
from neurofluid_tpu.data.particles import ParticleDataset
from neurofluid_tpu.models.particle_net import ParticleNet
from neurofluid_tpu.train import checkpoint as ckpt
from neurofluid_tpu.train import losses
from neurofluid_tpu.train.trainer_base import TrainerBase
from neurofluid_tpu.train.transition import build_particle_net, make_rollout_fn
from neurofluid_tpu.train.warmup import build_renderer
from neurofluid_tpu.utils.metrics import FluidErrors, psnr as psnr_np


def print_pred2gt_report(dists):
    """The reference's eval report format (reference eval_e2e.py:122-130)."""
    dists = [d for d in dists if d is not None]
    print("----------------- trained 50 steps ------------------------")
    print("Pred2GT:", np.mean(dists[0:49]) if len(dists) > 49 else np.mean(dists))
    print("Pred2GT-10:", np.mean(dists[:10]))
    if len(dists) > 48:
        print("Pred2GT-end:", dists[48])
    print("\n----------------- rollout 10 steps ------------------------")
    print("Pred2GT:", np.mean(dists[-10:]))
    print("Pred2GT-end:", dists[-1])


class E2EEvaluator(TrainerBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.test_views = list(cfg.test.views)
        self.test_dataset = BlenderDataset(
            cfg.test.path, data_type=cfg.data_type,
            img_wh=(int(cfg.TEST.imgW), int(cfg.TEST.imgH)),
            img_scale=float(cfg.TEST.scale),
            start_index=int(cfg.test.start_index), end_index=int(cfg.test.end_index),
            view_names=self.test_views, split="test",
        )
        gravity = tuple(float(g) for g in cfg.get("gravity", (0.0, -9.81, 0.0)))
        self.transition = ParticleNet(gravity=gravity)
        self.renderer = build_renderer(cfg)

        d0 = self.test_dataset[0]
        pos = jnp.asarray(d0["particles_pos"])
        self.params_t = self.transition.init(
            jax.random.PRNGKey(0), pos, jnp.asarray(d0["particles_vel"]),
            jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]),
        )
        self.params_r = self.renderer.init(
            jax.random.PRNGKey(0), pos, jnp.asarray(d0["cw"][0][:, 3]),
            jnp.asarray(d0["rays"][0][:8]),
        )
        if cfg.get("resume_from"):
            loaded, _ = ckpt.restore_checkpoint(cfg.resume_from)
            self.params_r = jax.tree_util.tree_map(jnp.asarray, loaded["renderer"])
            self.params_t = jax.tree_util.tree_map(jnp.asarray, loaded["transition"])

        self.rollout = make_rollout_fn(self.transition)
        self.render_full = self.make_chunk_renderer(
            self.renderer, chunk=self.eval_chunk_size()
        )

    def eval(self, render: bool = True):
        d0 = self.test_dataset[0]
        n_steps = len(self.test_dataset)
        traj = np.asarray(
            self.rollout(
                self.params_t,
                jnp.asarray(d0["particles_pos"]), jnp.asarray(d0["particles_vel"]),
                jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]), n_steps,
            )
        )
        fluid_errors = FluidErrors()
        dists = []
        os.makedirs(osp.join(self.particlepath, "Pred"), exist_ok=True)
        os.makedirs(osp.join(self.particlepath, "GT"), exist_ok=True)
        h = int(self.cfg.TEST.imgH // self.cfg.TEST.scale)
        w = int(self.cfg.TEST.imgW // self.cfg.TEST.scale)
        psnrs = []
        for t in range(n_steps):
            data = self.test_dataset[t]
            gt = data["particles_pos_1"]
            dists.append(fluid_errors.cal_errors(traj[t], gt, t + 1))
            with open(osp.join(self.particlepath, f"Pred/{t + 1}.obj"), "w") as fp:
                data_io.write_obj_pointcloud(traj[t], fp, color=[255, 0, 0])
            with open(osp.join(self.particlepath, f"GT/{t + 1}.obj"), "w") as fp:
                data_io.write_obj_pointcloud(gt, fp, color=[3, 168, 158])
            if render:
                for v, name in enumerate(self.test_views):
                    ro = jnp.asarray(data["cw_1"][v][:, 3])
                    out = self.render_full(
                        self.params_r, jnp.asarray(traj[t]), ro, data["rays_1"][v]
                    )
                    gt_rgb = data["rgb_1"][v]
                    psnrs.append(psnr_np(out["rgb1"], gt_rgb))
                    for pass_name, key in (("coarse", "rgb0"), ("fine", "rgb1")):
                        pdir = osp.join(self.imgpath, pass_name, name)
                        os.makedirs(osp.join(pdir, "Pred"), exist_ok=True)
                        os.makedirs(osp.join(pdir, "GT"), exist_ok=True)
                        from neurofluid_tpu.utils.logging import to8b
                        from PIL import Image

                        Image.fromarray(
                            to8b(np.asarray(out[key]).reshape(h, w, 3))
                        ).save(osp.join(pdir, "Pred", f"{t + 1:05d}.png"))
                        Image.fromarray(to8b(gt_rgb.reshape(h, w, 3))).save(
                            osp.join(pdir, "GT", f"{t + 1:05d}.png")
                        )
        fluid_errors.save(osp.join(self.exppath, "pred2gt.json"))
        print_pred2gt_report(dists)
        if psnrs:
            print("mean fine PSNR:", float(np.mean(psnrs)))
        return dists, psnrs


class TransitionEvaluator:
    def __init__(self, cfg):
        self.cfg = cfg
        self.exppath = osp.join(cfg.expdir, cfg.expname)
        self.particlepath = osp.join(self.exppath, "particles")
        os.makedirs(self.particlepath, exist_ok=True)
        gravity = tuple(float(g) for g in cfg.TEST.gravity)
        self.net = ParticleNet(gravity=gravity)
        self.dataset = ParticleDataset(
            cfg.TEST.datapath, data_type=cfg.TEST.datatype,
            start=int(cfg.TEST.start_index), end=int(cfg.TEST.end_index),
            random_rot=False, window=2,
        )
        d0 = self.dataset[0]
        self.params = self.net.init(
            jax.random.PRNGKey(0),
            jnp.asarray(d0["particles_pos_0"]), jnp.asarray(d0["particles_vel_0"]),
            jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]),
        )
        if cfg.get("resume_from"):
            loaded, _ = ckpt.restore_checkpoint(cfg.resume_from)
            self.params = jax.tree_util.tree_map(jnp.asarray, loaded["transition"])
        self.rollout = make_rollout_fn(self.net)
        self.bounds = losses.default_box_bounds()

    def eval(self, save_obj: bool | None = None):
        save_obj = bool(self.cfg.TEST.get("save_obj", True)) if save_obj is None else save_obj
        d0 = self.dataset[0]
        n_steps = len(self.dataset)
        traj = np.asarray(
            self.rollout(
                self.params,
                jnp.asarray(d0["particles_pos_0"]), jnp.asarray(d0["particles_vel_0"]),
                jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]), n_steps,
            )
        )
        errors, clipped_errors = FluidErrors(), FluidErrors()
        dists, clipped_dists = [], []
        lower = np.asarray(self.bounds.lower)
        upper = np.asarray(self.bounds.upper)
        for t in range(n_steps):
            gt = self.dataset[t]["particles_pos_1"]
            dists.append(errors.cal_errors(traj[t], gt, t + 1))
            clipped = np.clip(traj[t], lower, upper)
            clipped_dists.append(clipped_errors.cal_errors(clipped, gt, t + 1))
            if save_obj:
                os.makedirs(osp.join(self.particlepath, "eval"), exist_ok=True)
                with open(
                    osp.join(self.particlepath, "eval", f"pred_{t + 1}.obj"), "w"
                ) as fp:
                    data_io.write_obj_pointcloud(traj[t], fp, color=[255, 0, 0])
        errors.save(osp.join(self.exppath, "pred2gt.json"))
        clipped_errors.save(osp.join(self.exppath, "pred2gt_clipped.json"))
        print("unclipped:")
        print_pred2gt_report(dists)
        print("\nclipped to box:")
        print_pred2gt_report(clipped_dists)
        return dists, clipped_dists


class RendererEvaluator(TrainerBase):
    """Render a GT-particle sequence from a fixed camera
    (reference eval_renderer.py:63-160)."""

    def __init__(self, cfg, camera_c2w=None):
        super().__init__(cfg)
        self.renderer = build_renderer(cfg)
        self.test_views = list(cfg.test.views)
        self.dataset = BlenderDataset(
            cfg.test.path, data_type=cfg.data_type,
            img_wh=(int(cfg.TEST.imgW), int(cfg.TEST.imgH)),
            img_scale=float(cfg.TEST.scale),
            start_index=int(cfg.test.start_index), end_index=int(cfg.test.end_index),
            view_names=self.test_views, split="test",
        )
        d0 = self.dataset[0]
        self.c2w = (
            np.asarray(camera_c2w, np.float32)
            if camera_c2w is not None
            else d0["cw"][0]
        )
        pos = jnp.asarray(d0["particles_pos"])
        self.params = self.renderer.init(
            jax.random.PRNGKey(0), pos, jnp.asarray(self.c2w[:, 3]),
            jnp.asarray(d0["rays"][0][:8]),
        )
        if cfg.get("resume_from"):
            loaded, _ = ckpt.restore_checkpoint(cfg.resume_from)
            self.params = jax.tree_util.tree_map(jnp.asarray, loaded["renderer"])
        self.render_full = self.make_chunk_renderer(
            self.renderer, chunk=self.eval_chunk_size()
        )

    def eval(self, max_frames: int = 53):
        from neurofluid_tpu.ops import ray_ops
        from neurofluid_tpu.utils.logging import to8b
        from PIL import Image

        h = int(self.cfg.TEST.imgH // self.cfg.TEST.scale)
        w = int(self.cfg.TEST.imgW // self.cfg.TEST.scale)
        focal = 0.5 * w / np.tan(0.5 * float(self.cfg.TEST.camera_angle_x))
        dirs = ray_ops.get_ray_directions(h, w, focal)
        rays = np.asarray(
            ray_ops.make_ray_bundle(dirs, jnp.asarray(self.c2w))
        ).reshape(-1, 6)
        ro = jnp.asarray(self.c2w[:, 3])
        outdir = osp.join(self.exppath, "render_GT")
        os.makedirs(outdir, exist_ok=True)
        for t in range(min(len(self.dataset) + 1, max_frames)):
            particles = jnp.asarray(self.dataset.particles_pos[t])
            out = self.render_full(self.params, particles, ro, rays)
            for pass_name, key in (("coarse", "rgb0"), ("fine", "rgb1")):
                Image.fromarray(
                    to8b(np.asarray(out[key]).reshape(h, w, 3))
                ).save(osp.join(outdir, f"{pass_name}_pred_{t}.png"))
        return outdir
