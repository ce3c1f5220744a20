"""Full reference-protocol run on TPU at 400x400 (round-2 VERDICT item 1).

Reproduces the reference experiment shape (configs/end2end.yaml:14-46,
configs/dataset.yaml, eval_e2e.py:122-130) on the synthetic watercube-like
scene. Round 3: the scene's ground truth comes from the PBF fluid simulator
(data/synthetic.py::simulate_pbf — incompressible sloshing, the stand-in for
the reference's DFSPH, reference create_physics_scenes.py:257-263), not the
ballistic fallback, so pred2gt is reported on fluid-like dynamics:

  scene:      50 train + 10 rollout frames, ~14k particles, 400x400 images,
              4 warmup views + 1 dynamic view + 1 test view, near 9 / far 13
  warmup:     renderer on frame-0 GT particles, 4 views x 1024 rays/step
  transition: 2-step-rollout particle training on the sequence
  e2e:        joint training, TBPTT-1 across the 50 frames
  eval:       autoregressive 60-frame rollout; Pred2GT windows in the
              reference's trained-50 / rollout-10 report format; full
              400x400 renders of test frames with PSNR/SSIM (LPIPS needs a
              weights file, utils/lpips.py)

Writes PROTOCOL_R3.json at the repo root. Iteration counts are scaled to a
~2 h budget (the reference trains 100k warmup iters / 20k e2e epochs over
days); the point here is the full pipeline at full resolution with honest
metrics, not paper-level convergence.
"""

import json
import os
import os.path as osp
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache")

import numpy as np

ROOT = os.environ.get("PROTO_ROOT", "/tmp/protocol_r3")
SCENE = osp.join(ROOT, "scene")
WARMUP_ITERS = int(os.environ.get("PROTO_WARMUP_ITERS", 2000))
# 3 epochs left the transition model weak enough that its 60-frame eval
# rollout diverged (flagged by the overflow policy); 12 keeps the stage
# within ~10 min while producing rollout-stable dynamics
TRANS_EPOCHS = int(os.environ.get("PROTO_TRANS_EPOCHS", 12))
E2E_EPOCHS = int(os.environ.get("PROTO_E2E_EPOCHS", 2))
# The reference fine-tunes the renderer at 3e-4 assuming a transition model
# pretrained to ~mm accuracy (50k iters over 270 DFSPH sims). At this
# budget-scaled transition quality the carried training states drift to
# ~0.5 m by late epochs, and 3e-4 lets those frames destroy the warmup
# renderer (measured: test-view PSNR 32.5 -> 15.3 even on GT particles,
# clipped or not). 3e-5 over 2 epochs — the best of four measured attempts
# (BASELINE.md) — keeps the renderer in its warmup basin while image
# gradients still fine-tune the transition model.
E2E_RENDERER_LR = float(os.environ.get("PROTO_E2E_RLR", 3e-5))


def scene_cfg(n_frames=61):
    return dict(
        data_type="splishsplash", near=9.0, far=13.0,
        gravity=[0.0, 0.0, -9.81],
        train=dict(start_index=0, end_index=50, path=SCENE,
                   views=dict(warmup=["view_1", "view_2", "view_3", "view_4"],
                              dynamic=["view_1"])),
        test=dict(start_index=0, end_index=61, path=SCENE, views=["view_5"]),
    )


def renderer_cfg():
    return dict(
        ray=dict(ray_chunk=1024, N_importance=128, N_samples=64,
                 eval_ray_chunk=2048),
        NN_search=dict(fix_radius=True, particle_radius=0.025,
                       search_radius_scale=9.0, N_neighbor=20,
                       backend="grid", selection="approx", mode="dense"),
        encoding=dict(density=True, var=True, smoothed_pos=True,
                      smoothed_dir=True, exclude_ray=True,
                      same_smooth_factor=False),
        use_mask=True,
    )


def main():
    from neurofluid_tpu.data.synthetic import generate_blender_scene
    from neurofluid_tpu.train.e2e import E2ETrainer
    from neurofluid_tpu.train.transition import TransitionTrainer
    from neurofluid_tpu.train.warmup import WarmupTrainer
    from neurofluid_tpu.utils.config import ConfigNode
    from neurofluid_tpu.utils.metrics import psnr as psnr_np, ssim as ssim_np

    t_start = time.time()
    out_json = osp.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROTOCOL_R3.json")
    results = {"config": {
        "warmup_iters": WARMUP_ITERS, "trans_epochs": TRANS_EPOCHS,
        "e2e_epochs": E2E_EPOCHS, "img": 400, "sim": "pbf",
        "n_samples": 64, "n_importance": 128, "ray_chunk": 1024,
        "e2e_renderer_lr": E2E_RENDERER_LR, "e2e_grad_clip": 1.0,
    }}

    def flush_results():
        # progressive checkpointing of the report: a crash in a later stage
        # must not lose earlier stages' numbers
        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)

    if not osp.isdir(SCENE):
        os.makedirs(ROOT, exist_ok=True)
        generate_blender_scene(
            SCENE, n_frames=61, n_side=24, img_wh=(400, 400),
            train_views=("view_1", "view_2", "view_3", "view_4"),
            test_views=("view_5",), method="pbf",
        )
    print(f"[{time.time()-t_start:.0f}s] scene ready", flush=True)

    # ---------------------------------------------------------------- warmup
    wm_models = osp.join(ROOT, "exps", "warmup", "models")
    wm_resume = wm_models if (
        osp.isdir(wm_models) and os.listdir(wm_models)
    ) else ""
    if wm_resume:
        print(f"[{time.time()-t_start:.0f}s] resuming warmup from "
              f"{wm_resume}", flush=True)
    cfg = ConfigNode(dict(
        expdir=osp.join(ROOT, "exps"), expname="warmup",
        resume_from=wm_resume,
        TRAIN=dict(seed=10, N_iters=WARMUP_ITERS, precrop_iters=500,
                   save_interval=10**7, log_interval=100,
                   imgW=400, imgH=400, scale=1.0,
                   LR=dict(lr=5e-4, use_scheduler=True, decay_epochs=10000),
                   pretrained_renderer="", partial_load=False),
        TEST=dict(imgW=400, imgH=400, scale=1.0, start_index=0, end_index=61),
        RENDERER=renderer_cfg(),
        **scene_cfg(),
    ))
    wt = WarmupTrainer(cfg)
    loss = wt.train(n_iters=WARMUP_ITERS)  # None when fully resumed
    wt.save_checkpoint(WARMUP_ITERS)
    res = wt.eval(WARMUP_ITERS)
    results["warmup"] = {
        "final_loss": None if loss is None else float(loss),
        "psnr_coarse": float(res["view_5"]["psnr_0"]),
        "psnr_fine": float(res["view_5"]["psnr_1"]),
        "wall_s": time.time() - t_start,
    }
    print(f"[{time.time()-t_start:.0f}s] warmup: {results['warmup']}", flush=True)
    flush_results()

    # ------------------------------------------------------------ transition
    cfg = ConfigNode(dict(
        expdir=osp.join(ROOT, "exps"), expname="transition", resume_from="",
        TRAIN=dict(seed=10, N_iters=1, save_interval=10**7, log_interval=50,
                   lr=1e-4, grad_clip_value=1.0, start_index=0, end_index=50,
                   particle_radius=0.025, gravity=[0.0, 0.0, -9.81],
                   # generous caps: early-training rollouts compress the
                   # fluid well past rest density (reference search uncapped)
                   fluid_neighbor_k=128, obstacle_neighbor_k=64,
                   grid_max_per_cell=64,
                   pretrained="", search_backend="grid",
                   datapath=dict(train=SCENE, train_datatype="blender_all",
                                 eval=SCENE, eval_datatype="blender_all")),
    ))
    tt = TransitionTrainer(cfg)
    tr_models = osp.join(ROOT, "exps", "transition", "models")
    if osp.isdir(tr_models) and os.listdir(tr_models):
        print(f"[{time.time()-t_start:.0f}s] resuming transition from "
              f"{tr_models}", flush=True)
        tt.resume(tr_models)
        tloss = None  # fully resumed, no training this run
    else:
        tloss = tt.train(n_epochs=TRANS_EPOCHS)
        tt.save_checkpoint(1000)
    tavg = tt.eval(1000, save_obj=False)
    results["transition"] = {
        "final_loss": None if tloss is None else float(tloss),
        "rollout_pred2gt_mm": float(tavg),
        "rollout_overflow": bool(getattr(tt, "last_rollout_overflow", False)),
        "wall_s": time.time() - t_start,
    }
    print(f"[{time.time()-t_start:.0f}s] transition: {results['transition']}",
          flush=True)
    flush_results()

    # ------------------------------------------------------------------- e2e
    cfg = ConfigNode(dict(
        expdir=osp.join(ROOT, "exps"), expname="e2e", resume_from="",
        TRAIN=dict(seed=10, epochs=E2E_EPOCHS, precrop_iters=0,
                   save_interval=10**7, log_interval=100,
                   # clip as the reference e2e does (trainer_e2e.py update
                   # step clips both param sets); the unclipped first run
                   # blew up in the final epoch (loss 0.004 -> 0.27)
                   imgW=400, imgH=400, scale=1.0, grad_clip_value=1.0,
                   LR=dict(trans_lr=1e-5, renderer_lr=E2E_RENDERER_LR,
                           use_scheduler=True),
                   loss_weight=dict(boundary_loss=1.0),
                   fluid_neighbor_k=128, obstacle_neighbor_k=64,
                   grid_max_per_cell=64,
                   pretrained_renderer=wt.modelpath,
                   pretrained_transition_model=tt.modelpath,
                   partial_load=False, search_backend="grid"),
        TEST=dict(imgW=400, imgH=400, scale=1.0, start_index=0, end_index=61),
        RENDERER=renderer_cfg(),
        **scene_cfg(),
    ))
    et = E2ETrainer(cfg)
    eloss = et.train(n_epochs=E2E_EPOCHS, eval_during_training=False)
    et.save_checkpoint(E2E_EPOCHS * 50)
    results["e2e"] = {"final_loss": float(eloss),
                      "wall_s": time.time() - t_start}
    print(f"[{time.time()-t_start:.0f}s] e2e: {results['e2e']}", flush=True)
    flush_results()

    # ------------------------------------------------------------------ eval
    # reference eval_e2e.py:58-130: autoregressive rollout over all 60 test
    # frames, Pred2GT windows, full-resolution renders with image metrics
    import jax.numpy as jnp
    from neurofluid_tpu.data import io as data_io
    from neurofluid_tpu.utils.metrics import FluidErrors

    d0 = et.test_dataset[0]
    n_steps = len(et.test_dataset)
    traj, diag = et.rollout(
        et.params_t,
        jnp.asarray(d0["particles_pos"]), jnp.asarray(d0["particles_vel"]),
        jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]), n_steps,
    )
    traj = np.asarray(traj)
    fe = FluidErrors()
    dists = []
    for t in range(n_steps):
        gt = et.test_dataset[t]["particles_pos_1"]
        dists.append(fe.cal_errors(traj[t], gt, t + 1))
    dists = np.asarray(dists, np.float64)
    results["pred2gt_mm"] = {
        "trained_50_mean": float(np.mean(dists[:50])),
        "first_10_mean": float(np.mean(dists[:10])),
        "frame_49": float(dists[49]),
        "rollout_10_mean": float(np.mean(dists[50:60])),
        "final_frame": float(dists[-1]),
        "rollout_overflow": bool(np.asarray(diag["grid_overflow"])),
    }
    print(f"[{time.time()-t_start:.0f}s] pred2gt: {results['pred2gt_mm']}",
          flush=True)
    flush_results()

    # render a spread of test frames at full 400x400 (clamped to the
    # dataset: 61 generated frames -> 60 transitions -> indices 0..n_steps-1)
    frames = sorted({t if t < n_steps else n_steps - 1
                     for t in (0, 10, 25, 49, 54, 59)})
    metrics = {"trained": [], "rollout": []}
    for t in frames:
        data = et.test_dataset[t]
        out = et.render_full(
            et.params_r, jnp.asarray(traj[t]),
            jnp.asarray(data["cw_1"][0][:, 3]), data["rays_1"][0],
        )
        gt = data["rgb_1"][0].reshape(400, 400, 3)
        img = np.asarray(out["rgb1"]).reshape(400, 400, 3)
        rec = {
            "frame": t,
            "psnr": float(psnr_np(img, gt)),
            "ssim": float(ssim_np(img, gt)),
        }
        metrics["trained" if t < 50 else "rollout"].append(rec)
        print(f"[{time.time()-t_start:.0f}s] frame {t}: {rec}", flush=True)
    results["image_metrics"] = metrics
    results["image_metrics_summary"] = {
        "trained_psnr_mean": float(np.mean([m["psnr"] for m in metrics["trained"]])),
        "trained_ssim_mean": float(np.mean([m["ssim"] for m in metrics["trained"]])),
        "rollout_psnr_mean": float(np.mean([m["psnr"] for m in metrics["rollout"]])),
        "rollout_ssim_mean": float(np.mean([m["ssim"] for m in metrics["rollout"]])),
    }
    results["total_wall_s"] = time.time() - t_start

    with open(osp.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROTOCOL_R3.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["image_metrics_summary"]), flush=True)
    print("PROTOCOL RUN COMPLETE", flush=True)


if __name__ == "__main__":
    main()
