"""Transition-model stage: train ParticleNet on particle sequences alone.

Behavioral contract from the reference transition trainer
(reference trainer/trainer_transmodel.py:23-262):
- data: windowed (window=3) particle samples with random z-rotation
  augmentation, shuffled, batch size 1 (reference :118-124),
- 2-step rollout loss with gradients through both steps:
  0.5 * wmse(pred1, pos1) + 0.5 * wmse(pred2, pos2)
  + boundary(pred1) + boundary(pred2) (reference :179-189),
- Adam, optional global-norm grad clip (reference :159-160, 196-200),
- eval: full-sequence autoregressive rollout from frame 0, per-frame
  pred2gt distance + obj dumps (reference :224-262).

TPU design: the 2-step rollout is a single jitted step; the eval rollout is
a `lax.scan` over frames with donated state buffers.
"""

from __future__ import annotations

import functools
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neurofluid_tpu.data.particles import ParticleDataset
from neurofluid_tpu.data import io as data_io
from neurofluid_tpu.models.particle_net import ParticleNet
from neurofluid_tpu.train import checkpoint as ckpt
from neurofluid_tpu.train import losses
from neurofluid_tpu.train.trainer_base import TrainerBase
from neurofluid_tpu.utils.metrics import FluidErrors


def build_particle_net(cfg) -> ParticleNet:
    g = cfg.TRAIN.get("gravity", (0.0, -9.81, 0.0))
    extra = {}
    # Rotation-safe grid bounds: ParticleDataset's random z-rotation swings
    # the square container's corners (|xy| = 0.975*sqrt(2) ~ 1.38) past the
    # default grid cover (+-1.05); clamped out-of-bounds particles then pile
    # into border cells and trip the fail-loudly bucket-overflow at random
    # augmentation angles. Trainers that rotate MUST widen the grid.
    if cfg.TRAIN.get("grid_lower"):
        extra["grid_lower"] = tuple(float(x) for x in cfg.TRAIN.grid_lower)
    if cfg.TRAIN.get("grid_upper"):
        extra["grid_upper"] = tuple(float(x) for x in cfg.TRAIN.grid_upper)
    return ParticleNet(
        gravity=tuple(float(x) for x in g),
        particle_radius=float(cfg.TRAIN.get("particle_radius", 0.025)),
        search_backend=cfg.TRAIN.get("search_backend", "auto"),
        **extra,
        # static-shape caps (the reference's Open3D search is uncapped);
        # raise these when the fail-loudly overflow policy fires — early
        # transition training legitimately produces compressed states
        fluid_neighbor_k=int(cfg.TRAIN.get("fluid_neighbor_k", 64)),
        obstacle_neighbor_k=int(cfg.TRAIN.get("obstacle_neighbor_k", 48)),
        grid_max_per_cell=int(cfg.TRAIN.get("grid_max_per_cell", 32)),
        query_chunk=int(cfg.TRAIN.get("query_chunk", 4096)),
        conv_precision=cfg.TRAIN.get("conv_precision", "highest"),
        # fused_cconv capacity: a slab is ONE neighbor column over a query
        # group's z-range, so its length is bounded by the column's total
        # occupancy, not by K. Splashy/rotated training states make sparse
        # columns whose 16-row groups span many z-cells — the bench default
        # (128, sized for the compact lattice) overflows there. Trainers
        # default higher; the flag still fail-louds if even this is short.
        fused_group_size=int(cfg.TRAIN.get("fused_group_size", 16)),
        fused_slab_cap=int(cfg.TRAIN.get("fused_slab_cap", 256)),
        fused_cell_scale=float(cfg.TRAIN.get("fused_cell_scale", 1.0)),
    )


def make_rollout_fn(net: ParticleNet, with_diag: bool = False):
    """(params, pos, vel, box, nrm, n_steps) -> (F, N, 3) predicted positions.

    With `with_diag`, returns (traj, diag) where diag is the OR-reduction of
    the per-step search-health flags (see ParticleNet.__call__)."""

    def rollout(params, pos, vel, box, box_normals, n_steps: int):
        # the boundary is static across the rollout: build its grid ONCE
        # instead of once per scanned step
        box_grid = net.make_grid(box) if net.search_backend != "brute" else None

        def body(carry, _):
            p, v, ov = carry
            p2, v2, _, diag = net.apply(
                params, p, v, box, box_normals, return_diag=True,
                box_grid=box_grid,
            )
            ov = {k: jnp.logical_or(ov[k], diag[k]) for k in ov}
            return (p2, v2, ov), p2

        ov0 = {
            "grid_overflow": jnp.asarray(False),
            "cap_exceeded": jnp.asarray(False),
        }
        (_, _, ov), traj = jax.lax.scan(body, (pos, vel, ov0), None, length=n_steps)
        if with_diag:
            return traj, ov
        return traj

    return rollout


class TransitionTrainer(TrainerBase):
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

    def build_data(self):
        cfg = self.cfg
        self.dataset = ParticleDataset(
            cfg.TRAIN.datapath.train, data_type=cfg.TRAIN.datapath.train_datatype,
            start=int(cfg.TRAIN.start_index), end=int(cfg.TRAIN.end_index),
            random_rot=True, window=3, seed=int(cfg.TRAIN.seed),
        )
        self.test_dataset = ParticleDataset(
            cfg.TRAIN.datapath.eval, data_type=cfg.TRAIN.datapath.eval_datatype,
            start=int(cfg.TRAIN.start_index), end=int(cfg.TRAIN.end_index),
            random_rot=False, window=3,
        )

    def build_model(self):
        self.net = build_particle_net(self.cfg)
        d = self.dataset[0]
        self.params = self.net.init(
            self.next_key(),
            jnp.asarray(d["particles_pos_0"]), jnp.asarray(d["particles_vel_0"]),
            jnp.asarray(d["box"]), jnp.asarray(d["box_normals"]),
        )
        if self.cfg.TRAIN.get("pretrained"):
            loaded, _ = ckpt.restore_checkpoint(self.cfg.TRAIN.pretrained)
            self.params = {"params": loaded["transition"]["params"]}

    def build_optimizer(self):
        tx = [optax.adam(float(self.cfg.TRAIN.lr))]
        clip = float(self.cfg.TRAIN.get("grad_clip_value", 0))
        if clip:
            tx.insert(0, optax.clip_by_global_norm(clip))
        self.optimizer = optax.chain(*tx)
        self.opt_state = self.optimizer.init(self.params)

    def build_steps(self):
        net, optimizer = self.net, self.optimizer
        bounds = self.box_bounds

        def train_step(params, opt_state, pos0, vel0, pos1, pos2, box, nrm):
            # the box is constant across the 2-step rollout (rotation
            # augmentation happens per sample, outside): one grid build
            box_grid = net.make_grid(box) if net.search_backend != "brute" else None

            # rematerialize each transition step: keeping BOTH steps' CConv
            # residuals (the one-hot tap expansions dominate) alive for the
            # backward exceeds v5e HBM at reference particle counts (~26 GB
            # compiled); recomputing in the backward trades ~1 extra forward
            # for fitting comfortably. The "nbr_static" policy exempts the
            # DISCRETE search products (neighbor ids, adjoint-sort plans,
            # tap corners — see particle_net._name_static): they carry no
            # gradient, cost only ~tens of MB to keep, and their recompute
            # is the single most expensive part of the step (grid build +
            # candidate scan + selection, twice per backward). "nbr_feats"
            # additionally saves each conv layer's gathered (Q, K, Cin)
            # neighbor features (ops/cconv.py): ~350 MB/layer-step of HBM
            # buys skipping the ~9 ms re-gathers in the backward — measured
            # net win at every working point that fits (14k particles uses
            # <3 GB of the 16 GB chip).
            # The fused_cconv backend skips remat entirely: its custom-VJP
            # saves only the op INPUTS (sorted positions/features, a few MB
            # per layer — no (Q, K, C) gathers or tap expansions ever exist),
            # so rematerialization buys no HBM and would cost a full forward
            # recompute per backward step.
            ckpt = (
                (lambda f: f) if net.search_backend == "fused_cconv"
                else functools.partial(
                    jax.checkpoint,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "nbr_static", "nbr_feats"
                    ),
                )
            )

            @ckpt
            def one_step(p, pos, vel):
                return net.apply(
                    p, pos, vel, box, nrm, return_diag=True, box_grid=box_grid
                )

            def loss_fn(p):
                pred1, v1, nn1, diag1 = one_step(p, pos0, vel0)
                pred2, v2, nn2, diag2 = one_step(p, pred1, v1)
                l1 = losses.weighted_mse_loss(pred1, pos1, nn1)
                l2 = losses.weighted_mse_loss(pred2, pos2, nn2)
                b1 = losses.boundary_loss(pred1, bounds)
                b2 = losses.boundary_loss(pred2, bounds)
                total = 0.5 * l1 + 0.5 * l2 + b1 + b2
                overflow = jnp.logical_or(
                    diag1["grid_overflow"], diag2["grid_overflow"]
                )
                cap = jnp.logical_or(diag1["cap_exceeded"], diag2["cap_exceeded"])
                return total, {
                    "loss1": l1, "loss2": l2, "bloss1": b1, "bloss2": b2,
                    "search_overflow": overflow, "search_cap_exceeded": cap,
                }

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux["grad_norm"] = gnorm
            return params, opt_state, loss, aux

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self.rollout = make_rollout_fn(net, with_diag=True)

    def resume(self, path):
        target = {"step": 0, "transition": self.params, "opt_state": self.opt_state}
        restored, _ = ckpt.restore_checkpoint(path, target=target)
        self.params = restored["transition"]
        self.opt_state = restored["opt_state"]
        self.start_step = int(restored["step"])

    def save_checkpoint(self, step):
        ckpt.save_checkpoint(
            self.modelpath, step,
            {"step": step, "transition": self.params, "opt_state": self.opt_state},
        )

    def train(self, n_epochs: int | None = None):
        cfg = self.cfg
        n_epochs = int(n_epochs if n_epochs is not None else cfg.TRAIN.N_iters)
        log_interval = int(cfg.TRAIN.get("log_interval", 10))
        save_interval = int(cfg.TRAIN.get("save_interval", 10))
        global_step = self.start_step
        order = np.arange(len(self.dataset))
        last_loss = None
        for epoch in range(n_epochs):
            self.np_rng.shuffle(order)
            for i in order:
                d = self.dataset[int(i)]
                self.params, self.opt_state, loss, aux = self.train_step(
                    self.params, self.opt_state,
                    jnp.asarray(d["particles_pos_0"]), jnp.asarray(d["particles_vel_0"]),
                    jnp.asarray(d["particles_pos_1"]), jnp.asarray(d["particles_pos_2"]),
                    jnp.asarray(d["box"]), jnp.asarray(d["box_normals"]),
                )
                last_loss = loss
                if (global_step + 1) % log_interval == 0:
                    self.check_search_overflow(
                        aux.pop("search_overflow"), global_step, "transition"
                    )
                    self.logger.scalar("loss", float(loss), global_step)
                    for k, v in aux.items():
                        self.logger.scalar(k, float(v), global_step)
                global_step += 1
            # checkpoint EVERY epoch (cheap, seconds): a fail-loudly overflow
            # or preemption mid-stage must not lose the completed epochs —
            # resume restores params/opt_state/step and the caller derives
            # remaining epochs from step // len(dataset)
            self.save_checkpoint(global_step)
            if (epoch + 1) % save_interval == 0:
                self.eval(global_step)
        return float(last_loss) if last_loss is not None else None

    def eval(self, step_idx, save_obj: bool = True):
        self.eval_count += 1
        d0 = self.test_dataset[0]
        # roll out ONE physical sequence (reference eval_transmodel.py:101-154
        # evaluates a single sim). len(dataset) would concatenate sequences:
        # with 'blender_all' the same frames appear once per view dir, and an
        # autoregressive rollout across the seam is nonphysical.
        n_steps = (self.test_dataset.sequence_lengths[0]
                   if getattr(self.test_dataset, "sequence_lengths", None)
                   else len(self.test_dataset))
        traj, rollout_diag = self.rollout(
            self.params,
            jnp.asarray(d0["particles_pos_0"]), jnp.asarray(d0["particles_vel_0"]),
            jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]),
            n_steps,
        )
        rollout_overflow = self.check_search_overflow(
            rollout_diag["grid_overflow"], step_idx, "transition-eval-rollout",
            fatal=False,
        )
        self.last_rollout_overflow = rollout_overflow
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
            self.logger.scalar(
                "pred2gt_distance", d, self.eval_count * n_steps + t + 1
            )
            if save_obj:
                with open(osp.join(outdir, f"pred_{t + 1}.obj"), "w") as fp:
                    data_io.write_obj_pointcloud(traj[t], fp, color=[255, 0, 0])
                with open(osp.join(outdir, f"gt_{t + 1}.obj"), "w") as fp:
                    data_io.write_obj_pointcloud(gt, fp, color=[3, 168, 158])
        avg = float(np.mean(dists))
        self.logger.scalar("avg_pred2gt_distance", avg, step_idx)
        fluid_errors.save(osp.join(self.exppath, f"errors_{step_idx}.json"))
        return avg
