"""End-to-end stage: joint transition-model + renderer training.

Behavioral contract from the reference e2e trainer
(reference trainer/trainer_e2e.py:28-371):
- per frame (sequential within an epoch): one transition step from the
  previous frame's *detached* state (TBPTT-1, reference :189-199), render the
  dynamic view(s) at frame t+1 on `ray_chunk` random pixels, loss =
  sum_views [MSE(rgb0) + MSE(rgb1)] + boundary_weight * boundary_L1(pred_pos)
  (reference :202-261),
- separate Adam optimizers: renderer lr 3e-4, transition lr 1e-5, with the
  piecewise-halving schedules of schedules.py (reference :71-141),
- periodic eval: autoregressive rollout over the test sequence (state NOT
  detached, no grads), pred2gt per frame, obj dumps, rendering frames
  {0, 20, 30} on the test views with PSNR (reference :305-371),
- checkpoints {step, renderer, transition, optimizers} (reference :152-158);
  resume restores model weights but NOT optimizer state (reference :145-149).

TPU design: transition step + renderer forward + both gradients live in ONE
jitted train step; the rollout eval is a lax.scan. Gradients flow through the
single transition step into the CConv stack exactly as in the reference.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurofluid_tpu.data.blender import BlenderDataset
from neurofluid_tpu.data import io as data_io
from neurofluid_tpu.models.particle_net import ParticleNet
from neurofluid_tpu.train import checkpoint as ckpt
from neurofluid_tpu.train import losses, schedules
from neurofluid_tpu.train.trainer_base import TrainerBase
from neurofluid_tpu.train.transition import make_rollout_fn
from neurofluid_tpu.train.warmup import build_renderer
from neurofluid_tpu.utils.metrics import FluidErrors, psnr as psnr_np


def _leaf_norms(tree):
    """Per-parameter L2 grad norms as one vector — the reference's
    `cal_grad_norm` histogram payload (reference basetrainer.py:37-42)."""
    return jnp.stack(
        [jnp.linalg.norm(x.ravel()) for x in jax.tree_util.tree_leaves(tree)]
    )


def make_e2e_train_step(
    transition, renderer, opt_r, opt_t, bounds, bd_weight, grad_clip_value=0.0,
    with_anchor: bool = False, anchor_weight: float = 1.0,
):
    """Build the (unjitted) end-to-end train step.

    One transition step from detached state + multi-view render at t+1 +
    joint gradients for both parameter sets (reference trainer_e2e.py:202-302).
    Shared by the single-chip trainer (jit) and the multi-chip path
    (jit with ray shardings over a Mesh, see parallel/sharding.py).

    `with_anchor=True` adds a RENDERER-PROTECTION term absent from the
    reference: the step takes 4 extra trailing args (anchor_pos,
    anchor_ro_v, anchor_rays_v, anchor_rgbs_v) and adds `anchor_weight x`
    the warmup objective — rendering the frame-0 GT particles on warmup
    views — to the loss. Rationale: the reference trains e2e at renderer LR
    3e-4 from a CONVERGED 270-sim simulator (trainer_e2e.py:87-141); at
    budget-scaled simulator quality the drifting predicted particles
    destroy the warmup renderer (measured 32.5 -> 15.3 dB at 3e-4,
    BASELINE.md). The anchor replays the stationary warmup task alongside
    the joint objective so image gradients ground the simulator without
    un-learning the renderer. Gradients to the transition model are
    untouched (the anchor term doesn't depend on it)."""

    def train_step(
        params_r, params_t, opt_r_state, opt_t_state,
        pos, vel, box, nrm, ro_v, rays_v, rgbs_v, box_grid=None,
        anchor_pos=None, anchor_ro_v=None, anchor_rays_v=None,
        anchor_rgbs_v=None,
    ):
        def loss_fn(pr, pt):
            # box_grid: the static boundary grid, built once per scene by the
            # caller (ParticleNet.make_grid) — rebuilt inside if not given
            pred_pos, pred_vel, _nn, diag = transition.apply(
                pt, pos, vel, box, nrm, return_diag=True, box_grid=box_grid
            )

            def render_view(ro, rays):
                return renderer.apply(pr, pred_pos, ro, rays)

            outs = jax.vmap(render_view)(ro_v, rays_v)
            mse0 = jnp.mean((outs["rgb0"] - rgbs_v) ** 2, axis=(1, 2))
            mse1 = jnp.mean((outs["rgb1"] - rgbs_v) ** 2, axis=(1, 2))
            rgbloss = jnp.sum(mse0 + mse1)
            bd = losses.boundary_loss(pred_pos, bounds)
            total = rgbloss + bd_weight * bd
            anchor_overflow = jnp.asarray(False)
            if with_anchor:
                apos = jax.lax.stop_gradient(anchor_pos)

                def render_anchor(ro, rays):
                    return renderer.apply(pr, apos, ro, rays)

                aouts = jax.vmap(render_anchor)(anchor_ro_v, anchor_rays_v)
                amse0 = jnp.mean((aouts["rgb0"] - anchor_rgbs_v) ** 2)
                amse1 = jnp.mean((aouts["rgb1"] - anchor_rgbs_v) ** 2)
                total = total + anchor_weight * (amse0 + amse1)
                anchor_overflow = jnp.any(aouts["overflow"])
            aux = {
                "rgbloss_0": jnp.sum(mse0), "rgbloss_1": jnp.sum(mse1),
                "mse0_views": mse0, "mse1_views": mse1,
                "boundary_loss": bd,
                "pred_pos": pred_pos, "pred_vel": pred_vel,
                # search-health flags (overflow policy: trainers check on
                # host and fail loudly — never silently corrupted physics)
                "search_overflow": jnp.logical_or(
                    jnp.logical_or(
                        diag["grid_overflow"], jnp.any(outs["overflow"])
                    ),
                    anchor_overflow,
                ),
                "search_cap_exceeded": diag["cap_exceeded"],
                # per-view neighbor counts for the reference's histograms
                # (reference trainer_e2e.py:247-253)
                "num_nn_0": outs["num_nn_0"], "num_nn_1": outs["num_nn_1"],
            }
            return total, aux

        (loss, aux), (g_r, g_t) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params_r, params_t)
        up_r, opt_r_state = opt_r.update(g_r, opt_r_state, params_r)
        params_r = optax.apply_updates(params_r, up_r)
        up_t, opt_t_state = opt_t.update(g_t, opt_t_state, params_t)
        params_t = optax.apply_updates(params_t, up_t)

        next_pos = jax.lax.stop_gradient(aux.pop("pred_pos"))
        next_vel = jax.lax.stop_gradient(aux.pop("pred_vel"))
        gn_r = optax.global_norm(g_r)
        gn_t = optax.global_norm(g_t)
        aux["grad_norm_renderer"] = gn_r
        aux["grad_norm_transition"] = gn_t
        if grad_clip_value:
            # per-parameter grad-norm histograms before/after the per-model
            # global-norm clip (reference trainer_e2e.py:268-276, 298-302)
            clip = jnp.asarray(grad_clip_value, gn_r.dtype)
            aux["grad_hist_renderer_before"] = _leaf_norms(g_r)
            aux["grad_hist_transition_before"] = _leaf_norms(g_t)
            aux["grad_hist_renderer_after"] = aux[
                "grad_hist_renderer_before"
            ] * jnp.minimum(1.0, clip / (gn_r + 1e-16))
            aux["grad_hist_transition_after"] = aux[
                "grad_hist_transition_before"
            ] * jnp.minimum(1.0, clip / (gn_t + 1e-16))
        return (
            params_r, params_t, opt_r_state, opt_t_state,
            loss, next_pos, next_vel, aux,
        )

    return train_step


class E2ETrainer(TrainerBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.build_data()
        self.build_model()
        self.build_optimizer()
        self.build_steps()
        self.start_step = 0
        self.eval_count = 0
        if cfg.get("resume_from"):
            self.resume(cfg.resume_from)

    # ------------------------------------------------------------------

    def build_data(self):
        cfg = self.cfg
        self.train_views = list(cfg.train.views.dynamic)
        self.test_views = list(cfg.test.views)
        self.dataset = BlenderDataset(
            cfg.train.path, data_type=cfg.data_type,
            img_wh=(int(cfg.TRAIN.imgW), int(cfg.TRAIN.imgH)),
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
        # renderer-protection anchor: frame-0 GT particles + warmup views
        # (see make_e2e_train_step's with_anchor docs)
        anchor_cfg = cfg.TRAIN.get("anchor", {})
        self.anchor_enabled = bool(anchor_cfg.get("enabled", False))
        self.anchor_data = None
        if self.anchor_enabled:
            warmup_views = list(cfg.train.views.warmup)
            n_views = int(anchor_cfg.get("n_views", 2))
            ds = BlenderDataset(
                cfg.train.path, data_type=cfg.data_type,
                img_wh=(int(cfg.TRAIN.imgW), int(cfg.TRAIN.imgH)),
                img_scale=float(cfg.TRAIN.scale),
                start_index=int(cfg.train.start_index),
                end_index=int(cfg.train.start_index) + 2,
                view_names=warmup_views[:n_views], split="train",
            )
            d0 = ds[0]
            self.anchor_data = {
                "pos": jnp.asarray(d0["particles_pos"]),
                "ro_v": jnp.asarray(d0["cw"][:, :, 3]),
                "rays": d0["rays"],   # list per view, full image
                "rgb": d0["rgb"],
            }
            self.anchor_rays = int(anchor_cfg.get("rays", 1024))
            self.anchor_weight = float(anchor_cfg.get("weight", 1.0))

    def build_model(self):
        cfg = self.cfg
        gravity = tuple(float(g) for g in cfg.get("gravity", (0.0, -9.81, 0.0)))
        self.transition = ParticleNet(
            gravity=gravity,
            search_backend=cfg.TRAIN.get("search_backend", "auto"),
            fluid_neighbor_k=int(cfg.TRAIN.get("fluid_neighbor_k", 64)),
            obstacle_neighbor_k=int(cfg.TRAIN.get("obstacle_neighbor_k", 48)),
            grid_max_per_cell=int(cfg.TRAIN.get("grid_max_per_cell", 32)),
            query_chunk=int(cfg.TRAIN.get("query_chunk", 4096)),
            conv_precision=cfg.TRAIN.get("conv_precision", "highest"),
            # see transition.build_particle_net: trainer-facing fused_cconv
            # capacity defaults are higher than the compact-lattice bench's
            fused_group_size=int(cfg.TRAIN.get("fused_group_size", 16)),
            fused_slab_cap=int(cfg.TRAIN.get("fused_slab_cap", 256)),
            fused_cell_scale=float(cfg.TRAIN.get("fused_cell_scale", 1.0)),
        )
        self.renderer = build_renderer(cfg)

        d0 = self.dataset[0]
        pos = jnp.asarray(d0["particles_pos"])
        vel = jnp.asarray(d0["particles_vel"])
        box = jnp.asarray(d0["box"])
        nrm = jnp.asarray(d0["box_normals"])
        self.params_t = self.transition.init(self.next_key(), pos, vel, box, nrm)
        rays8 = jnp.asarray(d0["rays"][0][:8])
        ro = jnp.asarray(d0["cw"][0][:, 3])
        self.params_r = self.renderer.init(self.next_key(), pos, ro, rays8)

        # static boundary grid: built once per scene, passed into every step
        self.box_grid = (
            self.transition.make_grid(box)
            if self.transition.search_backend != "brute" else None
        )
        # The grid is keyed to THIS box; if the dataset ever spans scenes with
        # different boundary geometry the per-step assert below fails loudly
        # instead of silently convolving against a stale grid.
        self._box_grid_src = np.asarray(d0["box"])

        if cfg.TRAIN.get("pretrained_transition_model"):
            loaded, _ = ckpt.restore_checkpoint(cfg.TRAIN.pretrained_transition_model)
            self.params_t = {"params": loaded["transition"]["params"]}
        if cfg.TRAIN.get("pretrained_renderer"):
            loaded, _ = ckpt.restore_checkpoint(cfg.TRAIN.pretrained_renderer)
            self.params_r = {
                "params": ckpt.merge_renderer_params(
                    self.params_r["params"], loaded["renderer"]["params"],
                    partial_load=bool(cfg.TRAIN.get("partial_load", False)),
                )
            }

    def build_optimizer(self):
        lr = self.cfg.TRAIN.LR
        use_sched = bool(lr.get("use_scheduler", True))
        r_lr = float(lr.get("renderer_lr", 3e-4))
        t_lr = float(lr.get("trans_lr", 1e-5))
        # seperate_render_transition=False is the reference's single-optimizer
        # mode (reference trainer_e2e.py:71-86): one Adam with per-group base
        # LRs and the RENDERER piecewise schedule applied to both groups.
        # Adam state is per-parameter, so two optax transforms with identical
        # schedule shape are mathematically the single torch optimizer.
        separate = bool(self.cfg.TRAIN.get("seperate_render_transition", True))
        self.sched_r = (
            schedules.e2e_renderer_schedule(r_lr) if use_sched else (lambda s: r_lr)
        )
        if use_sched:
            self.sched_t = (
                schedules.e2e_transition_schedule(t_lr)
                if separate
                else schedules.e2e_renderer_schedule(t_lr)
            )
        else:
            self.sched_t = lambda s: t_lr
        clip = float(self.cfg.TRAIN.get("grad_clip_value", 0))

        def make(sched):
            tx = [optax.adam(sched)]
            if clip:
                tx.insert(0, optax.clip_by_global_norm(clip))
            return optax.chain(*tx)

        self.opt_r = make(self.sched_r)
        self.opt_t = make(self.sched_t)
        self.opt_r_state = self.opt_r.init(self.params_r)
        self.opt_t_state = self.opt_t.init(self.params_t)

    def build_steps(self):
        train_step = make_e2e_train_step(
            self.transition, self.renderer, self.opt_r, self.opt_t,
            self.box_bounds, float(self.cfg.TRAIN.loss_weight.boundary_loss),
            grad_clip_value=float(self.cfg.TRAIN.get("grad_clip_value", 0)),
            with_anchor=self.anchor_enabled,
            anchor_weight=getattr(self, "anchor_weight", 1.0),
        )
        self.train_step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))
        self.rollout = make_rollout_fn(self.transition, with_diag=True)
        self.render_full = self.make_chunk_renderer(
            self.renderer, chunk=self.eval_chunk_size()
        )

    # ------------------------------------------------------------------

    def resume(self, path):
        loaded, step = ckpt.restore_checkpoint(path)
        self.params_r = jax.tree_util.tree_map(jnp.asarray, loaded["renderer"])
        self.params_t = jax.tree_util.tree_map(jnp.asarray, loaded["transition"])
        self.start_step = int(np.asarray(loaded["step"])) + 1

    def save_checkpoint(self, step):
        ckpt.save_checkpoint(
            self.modelpath, step,
            {
                "step": step,
                "renderer": self.params_r,
                "transition": self.params_t,
                "opt_r_state": self.opt_r_state,
                "opt_t_state": self.opt_t_state,
            },
        )

    # ------------------------------------------------------------------

    def train(self, n_epochs: int | None = None, eval_during_training: bool = True):
        cfg = self.cfg
        n_epochs = int(n_epochs if n_epochs is not None else cfg.TRAIN.epochs)
        h = int(cfg.TRAIN.imgH // cfg.TRAIN.scale)
        w = int(cfg.TRAIN.imgW // cfg.TRAIN.scale)
        ray_chunk = int(cfg.RENDERER.ray.ray_chunk)
        precrop = int(cfg.TRAIN.get("precrop_iters", 500))
        log_interval = int(cfg.TRAIN.get("log_interval", 10))
        save_interval = int(cfg.TRAIN.get("save_interval", 500))

        global_step = self.start_step
        last_loss = None
        for _epoch in range(n_epochs):
            fluid_errors = FluidErrors()
            for data_idx in range(len(self.dataset)):
                data = self.dataset[data_idx]
                if data_idx == 0:
                    # state reset at sequence start (reference :192-193)
                    state_pos = jnp.asarray(data["particles_pos"])
                    state_vel = jnp.asarray(data["particles_vel"])

                rays_sel, rgbs_sel = [], []
                for v in range(len(self.train_views)):
                    idx = self.sample_pixel_indices(h, w, global_step, ray_chunk, precrop)
                    rays_sel.append(data["rays_1"][v][idx])
                    rgbs_sel.append(data["rgb_1"][v][idx])
                rays_v = jnp.asarray(np.stack(rays_sel))
                rgbs_v = jnp.asarray(np.stack(rgbs_sel))
                ro_v = jnp.asarray(data["cw_1"][:, :, 3])

                if self.box_grid is not None and not np.array_equal(
                        np.asarray(data["box"]), self._box_grid_src):
                    raise ValueError(
                        "per-frame box differs from the box the static grid "
                        "was built from; rebuild box_grid per scene"
                    )

                extra = ()
                if self.anchor_enabled:
                    a = self.anchor_data
                    a_rays, a_rgbs = [], []
                    for v in range(len(a["rays"])):
                        idx = self.sample_pixel_indices(
                            h, w, global_step, self.anchor_rays, 0
                        )
                        a_rays.append(a["rays"][v][idx])
                        a_rgbs.append(a["rgb"][v][idx])
                    extra = (
                        a["pos"], a["ro_v"],
                        jnp.asarray(np.stack(a_rays)),
                        jnp.asarray(np.stack(a_rgbs)),
                    )
                (
                    self.params_r, self.params_t,
                    self.opt_r_state, self.opt_t_state,
                    loss, state_pos, state_vel, aux,
                ) = self.train_step(
                    self.params_r, self.params_t,
                    self.opt_r_state, self.opt_t_state,
                    state_pos, state_vel,
                    jnp.asarray(data["box"]), jnp.asarray(data["box_normals"]),
                    ro_v, rays_v, rgbs_v, self.box_grid, *extra,
                )
                last_loss = loss

                if (global_step + 1) % log_interval == 0:
                    self.check_search_overflow(
                        aux["search_overflow"], global_step, "e2e-train"
                    )
                    self.logger.scalar("train/loss", float(loss), global_step)
                    for k in ("rgbloss_0", "rgbloss_1", "boundary_loss",
                              "grad_norm_renderer", "grad_norm_transition",
                              "search_cap_exceeded"):
                        self.logger.scalar(f"train/{k}", float(aux[k]), global_step)
                    # per-view scalars + neighbor-count histograms
                    # (reference trainer_e2e.py:247-253)
                    for v, name in enumerate(self.train_views):
                        m0 = float(aux["mse0_views"][v])
                        m1 = float(aux["mse1_views"][v])
                        self.logger.scalar(f"{name}/rgbloss_0", m0, global_step)
                        self.logger.scalar(f"{name}/rgbloss", m0 + m1, global_step)
                        self.logger.histogram(
                            f"{name}/num_neighbors_0",
                            np.asarray(aux["num_nn_0"][v]), global_step,
                        )
                        self.logger.histogram(
                            f"{name}/num_neighbors_1",
                            np.asarray(aux["num_nn_1"][v]), global_step,
                        )
                    # grad-norm histograms before/after clip
                    # (reference trainer_e2e.py:268-276, 298-302)
                    if "grad_hist_renderer_before" in aux:
                        for tag in (
                            "grad_hist_renderer_before", "grad_hist_renderer_after",
                            "grad_hist_transition_before", "grad_hist_transition_after",
                        ):
                            self.logger.histogram(
                                f"train/{tag}", np.asarray(aux[tag]), global_step
                            )
                    self.logger.scalar(
                        "train/lr_renderer", float(self.sched_r(global_step)), global_step
                    )
                    self.logger.scalar(
                        "train/lr_transition", float(self.sched_t(global_step)), global_step
                    )
                    d = fluid_errors.cal_errors(
                        np.asarray(state_pos), data["particles_pos_1"], data_idx + 1
                    )
                    if d is not None:
                        self.logger.scalar("train/pred2gt_distance", d, global_step)

                global_step += 1
                if eval_during_training and global_step % save_interval == 0:
                    self.eval(global_step)
                    self.save_checkpoint(global_step)
        return float(last_loss) if last_loss is not None else None

    # ------------------------------------------------------------------

    def eval(self, step_idx, render_frames=(0, 20, 30), save_obj: bool = True):
        """Rollout eval + sparse frame rendering (reference :305-371)."""
        d0 = self.test_dataset[0]
        n_steps = len(self.test_dataset)
        traj, rollout_diag = self.rollout(
            self.params_t,
            jnp.asarray(d0["particles_pos"]), jnp.asarray(d0["particles_vel"]),
            jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]),
            n_steps,
        )
        self.last_rollout_overflow = self.check_search_overflow(
            rollout_diag["grid_overflow"], step_idx, "e2e-eval-rollout",
            fatal=False,
        )
        traj = np.asarray(traj)
        fluid_errors = FluidErrors()
        dists = []
        outdir = osp.join(self.particlepath, str(step_idx))
        if save_obj:
            os.makedirs(outdir, exist_ok=True)
        for t in range(n_steps):
            gt = self.test_dataset[t]["particles_pos_1"]
            d = fluid_errors.cal_errors(traj[t], gt, t + 1)
            dists.append(d)
            if save_obj:
                with open(osp.join(outdir, f"pred_{t + 1}.obj"), "w") as fp:
                    data_io.write_obj_pointcloud(traj[t], fp, color=[255, 0, 0])
                with open(osp.join(outdir, f"gt_{t + 1}.obj"), "w") as fp:
                    data_io.write_obj_pointcloud(gt, fp, color=[3, 168, 158])
        avg = float(np.mean(dists))
        self.logger.scalar("eval/avg_pred2gt_distance", avg, step_idx)

        h = int(self.cfg.TEST.imgH // self.cfg.TEST.scale)
        w = int(self.cfg.TEST.imgW // self.cfg.TEST.scale)
        psnrs = {}
        for t in render_frames:
            if t >= n_steps:
                continue
            data = self.test_dataset[t]
            particles = jnp.asarray(traj[t])
            for v, name in enumerate(self.test_views):
                ro = jnp.asarray(data["cw_1"][v][:, 3])
                out = self.render_full(self.params_r, particles, ro, data["rays_1"][v])
                gt = data["rgb_1"][v]
                p0 = psnr_np(out["rgb0"], gt)
                p1 = psnr_np(out["rgb1"], gt)
                self.logger.scalar(f"{name}/psnr_{t}_0", p0, step_idx)
                self.logger.scalar(f"{name}/psnr_{t}_1", p1, step_idx)
                self.visualize_image(out["rgb0"], gt, h, w, step_idx, f"coarse_{t}_{name}")
                self.visualize_image(out["rgb1"], gt, h, w, step_idx, f"fine_{t}_{name}")
                psnrs[f"{name}_{t}"] = (p0, p1)
        return avg, psnrs
