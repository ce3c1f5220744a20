"""Warm-up stage: train the renderer alone on frame-0 GT particles.

Behavioral contract from the reference warm-up trainer
(reference trainer/trainer_renderer.py:22-175):
- data: frame 0 of the training split across the warmup views (data_idx = 0
  every step, reference :81-82),
- per step: per view, sample `ray_chunk` random pixels (pre-crop aware),
  render coarse+fine with GT particles, sum per-view MSE(rgb0) + MSE(rgb1)
  (reference :102-143),
- Adam with continuous exponential LR decay gamma^(step / decay_epochs)
  (reference :55-58),
- periodic eval: render the full test view for frame 0, PSNR, image dumps
  (reference :146-175), checkpoint {step, renderer, optimizer} (:68-72).

TPU design: all warmup views are rendered in ONE jitted step (vmap over the
view axis) — the reference loops views in Python. Loss sums per-view MSEs to
keep gradient scale identical to the reference.
"""

from __future__ import annotations

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurofluid_tpu.data.blender import BlenderDataset
from neurofluid_tpu.models.render_net import RenderNet, camera_origin
from neurofluid_tpu.train import checkpoint as ckpt
from neurofluid_tpu.train import losses, schedules
from neurofluid_tpu.train.trainer_base import TrainerBase
from neurofluid_tpu.utils.metrics import psnr as psnr_np


def build_renderer(cfg) -> RenderNet:
    r = cfg.RENDERER
    return RenderNet(
        near=float(cfg.near),
        far=float(cfg.far),
        n_samples=int(r.ray.N_samples),
        n_importance=int(r.ray.N_importance),
        particle_radius=float(r.NN_search.particle_radius),
        search_radius_scale=float(r.NN_search.search_radius_scale),
        num_neighbors=int(r.NN_search.N_neighbor),
        use_mask=bool(r.use_mask),
        encode_density=bool(r.encoding.density),
        encode_var=bool(r.encoding.var),
        encode_smoothed_pos=bool(r.encoding.smoothed_pos),
        encode_smoothed_dir=bool(r.encoding.smoothed_dir),
        exclude_ray=bool(r.encoding.exclude_ray),
        same_smooth_factor=bool(r.encoding.get("same_smooth_factor", False)),
        compute_dtype=jnp.bfloat16 if r.get("bf16", False) else jnp.float32,
        search_backend=r.NN_search.get("backend", "auto"),
        search_selection=r.NN_search.get("selection", "approx"),
        search_mode=r.NN_search.get("mode", "dense"),
    )


class WarmupTrainer(TrainerBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.build_data()
        self.build_model()
        self.build_optimizer()
        self.build_steps()
        self.start_step = 0
        if cfg.get("resume_from"):
            self.resume(cfg.resume_from)

    # ------------------------------------------------------------------

    def build_data(self):
        cfg = self.cfg
        self.train_views = list(cfg.train.views.warmup)
        self.test_views = list(cfg.test.views)
        wh = (int(cfg.TRAIN.imgW), int(cfg.TRAIN.imgH))
        self.dataset = BlenderDataset(
            cfg.train.path, data_type=cfg.data_type, img_wh=wh,
            img_scale=float(cfg.TRAIN.scale),
            start_index=int(cfg.train.start_index), end_index=int(cfg.train.end_index),
            view_names=self.train_views, split="train",
        )
        self.test_dataset = BlenderDataset(
            cfg.test.path, data_type=cfg.data_type,
            img_wh=(int(cfg.TEST.imgW), int(cfg.TEST.imgH)),
            img_scale=float(cfg.TEST.scale),
            start_index=int(cfg.test.start_index), end_index=int(cfg.test.end_index),
            view_names=self.test_views, split="test",
        )

    def build_model(self):
        self.model = build_renderer(self.cfg)
        d0 = self.dataset[0]
        particles = jnp.asarray(d0["particles_pos"])
        rays = jnp.asarray(d0["rays"][0][: 8])
        ro = jnp.asarray(d0["cw"][0][:, 3])
        self.params = self.model.init(self.next_key(), particles, ro, rays)
        if self.cfg.TRAIN.get("pretrained_renderer"):
            loaded, _ = ckpt.restore_checkpoint(self.cfg.TRAIN.pretrained_renderer)
            self.params = {
                "params": ckpt.merge_renderer_params(
                    self.params["params"], loaded["renderer"]["params"],
                    partial_load=bool(self.cfg.TRAIN.get("partial_load", False)),
                )
            }

    def build_optimizer(self):
        lr_cfg = self.cfg.TRAIN.LR
        if lr_cfg.get("use_scheduler", True):
            self.schedule = schedules.exponential_decay(
                float(lr_cfg.lr), int(lr_cfg.decay_epochs), gamma=0.1
            )
        else:
            self.schedule = lambda step: float(lr_cfg.lr)
        self.optimizer = optax.adam(self.schedule)
        self.opt_state = self.optimizer.init(self.params)

    def build_steps(self):
        model, optimizer = self.model, self.optimizer

        def train_step(params, opt_state, particles, ro_v, rays_v, rgbs_v):
            def loss_fn(p):
                def render_view(ro, rays):
                    return model.apply(p, particles, ro, rays)

                outs = jax.vmap(render_view)(ro_v, rays_v)
                mse0 = jnp.mean((outs["rgb0"] - rgbs_v) ** 2, axis=(1, 2))
                mse1 = jnp.mean((outs["rgb1"] - rgbs_v) ** 2, axis=(1, 2))
                # sum of per-view losses (reference trainer_renderer.py:127-133)
                total = jnp.sum(mse0 + mse1)
                return total, (mse0, mse1, jnp.any(outs["overflow"]))

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self.render_full = self.make_chunk_renderer(
            model, chunk=self.eval_chunk_size()
        )

    # ------------------------------------------------------------------

    def resume(self, path):
        target = {
            "step": 0,
            "renderer": self.params,
            "opt_state": self.opt_state,
        }
        restored, step = ckpt.restore_checkpoint(path, target=target)
        self.params = restored["renderer"]
        self.opt_state = restored["opt_state"]
        self.start_step = int(restored["step"]) + 1

    def save_checkpoint(self, step):
        ckpt.save_checkpoint(
            self.modelpath, step,
            {"step": step, "renderer": self.params, "opt_state": self.opt_state},
        )

    # ------------------------------------------------------------------

    def train(self, n_iters: int | None = None):
        cfg = self.cfg
        n_iters = int(n_iters if n_iters is not None else cfg.TRAIN.N_iters)
        h = int(cfg.TRAIN.imgH // cfg.TRAIN.scale)
        w = int(cfg.TRAIN.imgW // cfg.TRAIN.scale)
        ray_chunk = int(cfg.RENDERER.ray.ray_chunk)
        precrop = int(cfg.TRAIN.get("precrop_iters", 500))
        data = self.dataset[0]  # frame 0 only (reference :81-82)
        particles = jnp.asarray(data["particles_pos"])
        ro_v = jnp.asarray(data["cw"][:, :, 3])

        log_interval = int(cfg.TRAIN.get("log_interval", 10))
        save_interval = int(cfg.TRAIN.get("save_interval", 500))

        last_loss = None
        for step in range(self.start_step, n_iters):
            rays_sel, rgbs_sel = [], []
            for v in range(len(self.train_views)):
                idx = self.sample_pixel_indices(h, w, step, ray_chunk, precrop)
                rays_sel.append(data["rays"][v][idx])
                rgbs_sel.append(data["rgb"][v][idx])
            rays_v = jnp.asarray(np.stack(rays_sel))
            rgbs_v = jnp.asarray(np.stack(rgbs_sel))

            self.params, self.opt_state, loss, (mse0, mse1, overflow) = self.train_step(
                self.params, self.opt_state, particles, ro_v, rays_v, rgbs_v
            )
            last_loss = loss

            if (step + 1) % log_interval == 0:
                self.check_search_overflow(overflow, step, "warmup-render")
                loss = float(loss)
                self.logger.scalar("train/loss", loss, step)
                self.logger.scalar("train/lr", float(self.schedule(step)), step)
                for v, name in enumerate(self.train_views):
                    self.logger.scalar(f"{name}/rgbloss_0", float(mse0[v]), step)
                    self.logger.scalar(f"{name}/rgbloss", float(mse0[v] + mse1[v]), step)
            if (step + 1) % save_interval == 0:
                self.eval(step)
                self.save_checkpoint(step)
        return float(last_loss) if last_loss is not None else None

    # ------------------------------------------------------------------

    def eval(self, step):
        cfg = self.cfg
        h = int(cfg.TEST.imgH // cfg.TEST.scale)
        w = int(cfg.TEST.imgW // cfg.TEST.scale)
        data = self.test_dataset[0]
        particles = jnp.asarray(data["particles_pos"])
        results = {}
        for v, name in enumerate(self.test_views):
            ro = jnp.asarray(data["cw"][v][:, 3])
            out = self.render_full(self.params, particles, ro, data["rays"][v])
            gt = data["rgb"][v]
            p0 = psnr_np(out["rgb0"], gt)
            p1 = psnr_np(out["rgb1"], gt)
            self.logger.scalar(f"{name}/psnr_0", p0, step)
            self.logger.scalar(f"{name}/psnr_1", p1, step)
            self.visualize_image(out["rgb0"], gt, h, w, step, f"coarse_0_{name}")
            self.visualize_image(out["rgb1"], gt, h, w, step, f"fine_0_{name}")
            results[name] = {"psnr_0": p0, "psnr_1": p1}
        return results
