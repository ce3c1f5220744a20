"""Full reference-protocol run on TPU at 400x400 (round-5 revision).

Reproduces the reference experiment shape (configs/end2end.yaml:14-46,
configs/dataset.yaml, eval_e2e.py:58-130) on the synthetic watercube-like
scene, with ground truth from the PBF fluid simulator
(data/synthetic.py::simulate_pbf — incompressible sloshing, the stand-in for
the reference's DFSPH, reference create_physics_scenes.py:257-263).

Round-4 changes over the R3 runner (VERDICT items 2, 3, 4, 7 + ADVICE 3):

  1. MULTI-SCENE transition pretraining: the transition stage trains over
     `PROTO_N_SIMS` randomized PBF simulations in the raw layout
     (synthetic.generate_pbf_raw_dataset) — the budget-scaled counterpart of
     the reference's 270-sim DFSPH pretraining (reference run.sh,
     trainer_transmodel.py) — instead of the single render sequence.
  2. ABLATION: the reference-format eval rollout runs TWICE through the SAME
     machinery — once with the pretrained transition model (before any e2e
     update), once after e2e — so the report shows whether image gradients
     improved the simulator (the paper's core claim, reference README.md:1-6).
  3. OVERFLOW RETRY: eval rollouts that trip the search-overflow flag are
     re-run with doubled neighbor/cell caps (up to 2 retries) so committed
     Pred2GT numbers are computed on untruncated neighborhoods.
  4. FULL-COVERAGE image eval: every test frame is rendered
     (PROTO_RENDER_STRIDE subsamples honestly if set), matching reference
     eval_e2e.py:102-120's 60-frame render loop.
  5. Pred2GT windows now match the reference printout EXACTLY
     (eval_e2e.py:122-130): trained = mean(dists[0:49]), trained-10 =
     mean(dists[:10]), trained-end = dists[48]; rollout = mean(dists[-10:]),
     rollout-end = dists[-1].

  scene:      50 train + 10 rollout frames, ~14k particles, 400x400 images,
              4 warmup views + 1 dynamic view + 1 test view, near 9 / far 13
  warmup:     renderer on frame-0 GT particles, 4 views x 1024 rays/step
  transition: 2-step-rollout particle training over the multi-sim set
  e2e:        joint training, TBPTT-1 across the 50 frames
  eval:       autoregressive 60-frame rollout (pretrained AND e2e params);
              full 400x400 renders with PSNR/SSIM (LPIPS is weights-gated,
              utils/lpips.py — documented descope)

Round-5 changes over the R4 runner (VERDICT r4 items 2, 4, 5):

  6. FUSED TRANSITION BACKEND: the transition stages default to
     `search_backend='fused_cconv'` (ops/fused_cconv — selection-free fused
     Pallas conv, exact uncapped reference semantics, measured 246.6 ms vs
     the grid backend's 412.3 ms on the 2-step train step) at
     conv_precision 'default' (bf16 MXU passes; this protocol run IS the
     quality pin for that choice — compare trained_pred2gt against
     PROTOCOL_R4's 96.3 mm). Override with PROTO_SEARCH / PROTO_CONV_PREC.
  7. RENDERER-PROTECTION ANCHOR: the e2e stage enables the frame-0 warmup
     anchor loss (train/e2e.py with_anchor) and steps the renderer LR back
     up to the REFERENCE value 3e-4 (trainer_e2e.py:87-141) — round 3/4
     measured 15.3/24.4 dB frame-0 collapse without it.
  8. More pretraining: 16 sims x 6 epochs by default (was 12 x 4).

Writes PROTOCOL_R5.json at the repo root. Iteration counts are scaled to a
~2.5 h budget (the reference trains 100k warmup iters / 50k transition iters
/ 20k e2e epochs over days); the point is the full pipeline at full
resolution with honest metrics, not paper-level convergence.
"""

import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

ROOT = os.environ.get("PROTO_ROOT", "/tmp/protocol_r5")
SCENE = osp.join(ROOT, "scene")
PRETRAIN = os.environ.get("PROTO_PRETRAIN", "/tmp/pbf_pretrain")
N_SIMS = int(os.environ.get("PROTO_N_SIMS", 16))
WARMUP_ITERS = int(os.environ.get("PROTO_WARMUP_ITERS", 2000))
TRANS_EPOCHS = int(os.environ.get("PROTO_TRANS_EPOCHS", 6))
E2E_EPOCHS = int(os.environ.get("PROTO_E2E_EPOCHS", 2))
# Round 3 measured that at SINGLE-SEQUENCE transition quality the reference's
# renderer LR (3e-4) destroys the warmup renderer (32.5 -> 15.3 dB) and only
# 3e-5 survived. With the multi-scene pretrained simulator the carried states
# drift far less, so the default steps back UP toward the reference value;
# override with PROTO_E2E_RLR to reproduce the old behavior.
# Round 5: back to the REFERENCE renderer LR (trainer_e2e.py:87-141),
# protected by the frame-0 anchor loss (see header note 7).
E2E_RENDERER_LR = float(os.environ.get("PROTO_E2E_RLR", 3e-4))
RENDER_STRIDE = int(os.environ.get("PROTO_RENDER_STRIDE", 1))
SEARCH_BACKEND = os.environ.get("PROTO_SEARCH", "fused_cconv")
CONV_PREC = os.environ.get("PROTO_CONV_PREC", "default")
ANCHOR = os.environ.get("PROTO_ANCHOR", "1") == "1"
# fused_cconv slab cap: since the segment-packed walk (round 5) the cap only
# sizes sentinel/feature padding — the conv is exact for ANY occupancy
# (ops/fused_cconv.py "NO CAPACITY CONDITION"), so there is no capacity to
# tune. 320 is kept for cache continuity with the round-5 protocol run.
FUSED_SLAB = int(os.environ.get("PROTO_FUSED_SLAB", 320))


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


def rollout_with_retry(net, params_t, pos, vel, box, nrm, n_steps, log):
    """Autoregressive rollout; on search overflow retry with doubled caps.

    The static-shape caps (fluid_neighbor_k / obstacle_neighbor_k /
    grid_max_per_cell) can truncate neighborhoods when a rollout compresses
    or diverges the fluid; the overflow flag records that. Committed numbers
    must not carry the asterisk (round-3 VERDICT item 4), so this retries
    with 2x caps (recompile, ~2 min) until the flag clears or retries run
    out. Returns (traj, overflow_flag, caps_used).
    """
    from neurofluid_tpu.train import transition as trans_mod

    for attempt in range(3):
        rollout = jax.jit(
            trans_mod.make_rollout_fn(net, with_diag=True),
            static_argnames=("n_steps",),
        )
        traj, diag = rollout(params_t, pos, vel, box, nrm, n_steps=n_steps)
        traj = np.asarray(traj)
        over = bool(np.asarray(diag["grid_overflow"]))
        caps = dict(
            fluid_neighbor_k=net.fluid_neighbor_k,
            obstacle_neighbor_k=net.obstacle_neighbor_k,
            grid_max_per_cell=net.grid_max_per_cell,
            fused_slab_cap=net.fused_slab_cap,
        )
        if not over:
            return traj, False, caps
        log(f"rollout overflow at caps {caps} (attempt {attempt + 1}); "
            "retrying with doubled caps")
        net = net.clone(
            fluid_neighbor_k=2 * net.fluid_neighbor_k,
            obstacle_neighbor_k=2 * net.obstacle_neighbor_k,
            grid_max_per_cell=2 * net.grid_max_per_cell,
            # the fused_cconv backend's only capacity knob
            fused_slab_cap=2 * net.fused_slab_cap,
        )
    return traj, True, caps


def reference_pred2gt_windows(dists):
    """EXACT reference report windows (eval_e2e.py:122-130)."""
    d = np.asarray(dists, np.float64)
    return {
        "trained_pred2gt": float(np.mean(d[0:49])),
        "trained_pred2gt_10": float(np.mean(d[:10])),
        "trained_pred2gt_end": float(d[48]),
        "rollout_pred2gt": float(np.mean(d[-10:])),
        "rollout_pred2gt_end": float(d[-1]),
        "windows": "reference eval_e2e.py:122-130 conventions",
    }


def main():
    from neurofluid_tpu.data.synthetic import (
        generate_blender_scene, generate_pbf_raw_dataset,
    )
    from neurofluid_tpu.train.e2e import E2ETrainer
    from neurofluid_tpu.train.transition import TransitionTrainer
    from neurofluid_tpu.train.warmup import WarmupTrainer
    from neurofluid_tpu.utils.config import ConfigNode
    from neurofluid_tpu.utils.metrics import FluidErrors
    from neurofluid_tpu.utils.metrics import psnr as psnr_np, ssim as ssim_np

    t_start = time.time()

    def log(msg):
        print(f"[{time.time()-t_start:.0f}s] {msg}", flush=True)

    out_json = osp.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROTOCOL_R5.json")
    results = {"config": {
        "warmup_iters": WARMUP_ITERS, "trans_epochs": TRANS_EPOCHS,
        "pretrain_sims": N_SIMS, "pretrain_frames": 50,
        "e2e_epochs": E2E_EPOCHS, "img": 400, "sim": "pbf",
        "n_samples": 64, "n_importance": 128, "ray_chunk": 1024,
        "e2e_renderer_lr": E2E_RENDERER_LR, "e2e_grad_clip": 1.0,
        "render_stride": RENDER_STRIDE, "search_backend": SEARCH_BACKEND,
        "conv_precision": CONV_PREC, "anchor": ANCHOR,
        "fused_slab_cap": FUSED_SLAB,
        # LPIPS descope: implementation complete and torch-validated
        # (utils/lpips.py, tests/test_lpips.py) but VGG weights cannot be
        # produced on this box (zero egress; no torchvision weights cache) —
        # documented environment limitation, not a silent absence.
        "lpips": "blocked: no VGG16 weights obtainable offline "
                 "(utils/lpips.py:130-137)",
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
    log("render scene ready")
    if not osp.isdir(osp.join(PRETRAIN, f"sim_{N_SIMS - 1:04d}")):
        generate_pbf_raw_dataset(
            PRETRAIN, n_sims=N_SIMS, n_frames=50, n_side=24, seed=42, log=log,
        )
    log("pretrain set ready")

    # ---------------------------------------------------------------- warmup
    wm_models = osp.join(ROOT, "exps", "warmup", "models")
    wm_resume = wm_models if (
        osp.isdir(wm_models) and os.listdir(wm_models)
    ) else ""
    if wm_resume:
        log(f"resuming warmup from {wm_resume}")
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
    log(f"warmup: {results['warmup']}")
    flush_results()

    # ------------------------------------------------------------ transition
    # multi-scene pretraining over the randomized PBF set (raw layout); the
    # reference's counterpart trains ~50k iters over 270 DFSPH sims
    cfg = ConfigNode(dict(
        expdir=osp.join(ROOT, "exps"), expname="transition", resume_from="",
        TRAIN=dict(seed=10, N_iters=1, save_interval=10**7, log_interval=50,
                   lr=1e-4, grad_clip_value=1.0, start_index=0, end_index=50,
                   particle_radius=0.025, gravity=[0.0, 0.0, -9.81],
                   # generous caps: early-training rollouts compress the
                   # fluid well past rest density (reference search uncapped)
                   fluid_neighbor_k=128, obstacle_neighbor_k=64,
                   grid_max_per_cell=64,
                   # rotation-safe grid cover: the z-rotation augmentation
                   # swings container corners to |xy| ~ 1.38 (see
                   # transition.build_particle_net) — the default +-1.05
                   # bounds clamp rotated corner clumps into border cells
                   # and trip the bucket-overflow fail-loud at random steps
                   grid_lower=[-1.45, -1.45, -1.05],
                   grid_upper=[1.45, 1.45, 2.55],
                   pretrained="", search_backend=SEARCH_BACKEND,
                   conv_precision=CONV_PREC, fused_slab_cap=FUSED_SLAB,
                   datapath=dict(train=PRETRAIN, train_datatype="raw",
                                 eval=SCENE, eval_datatype="blender_all")),
    ))
    tt = TransitionTrainer(cfg)
    tr_models = osp.join(ROOT, "exps", "transition", "models")
    done_epochs = 0
    if osp.isdir(tr_models) and os.listdir(tr_models):
        tt.resume(tr_models)
        # per-epoch checkpoints carry step = epochs_done * len(dataset); a
        # checkpoint whose step is NOT a multiple of len(dataset) predates
        # that convention (the old fixed save_checkpoint(1000)) — deriving an
        # epoch count from it would retrain or skip stages silently
        if tt.start_step % max(len(tt.dataset), 1):
            raise SystemExit(
                f"legacy transition checkpoint in {tr_models}: step "
                f"{tt.start_step} is not a multiple of the dataset length "
                f"{len(tt.dataset)} — use a fresh PROTO_ROOT (or delete the "
                f"stage dir) instead of resuming a pre-per-epoch-checkpoint "
                f"run"
            )
        done_epochs = tt.start_step // max(len(tt.dataset), 1)
        log(f"resumed transition from {tr_models} "
            f"(step {tt.start_step} = {done_epochs} epochs)")
    if done_epochs < TRANS_EPOCHS:
        tloss = tt.train(n_epochs=TRANS_EPOCHS - done_epochs)
    else:
        tloss = None  # fully trained, no training this run
    results["transition"] = {
        "final_loss": None if tloss is None else float(tloss),
        "train_windows": len(tt.dataset),
        "wall_s": time.time() - t_start,
    }
    log(f"transition: {results['transition']}")
    flush_results()

    # ------------------------------------------------------------------- e2e
    cfg = ConfigNode(dict(
        expdir=osp.join(ROOT, "exps"), expname="e2e", resume_from="",
        TRAIN=dict(seed=10, epochs=E2E_EPOCHS, precrop_iters=0,
                   save_interval=10**7, log_interval=100,
                   # clip as the reference e2e does (trainer_e2e.py update
                   # step clips both param sets)
                   imgW=400, imgH=400, scale=1.0, grad_clip_value=1.0,
                   LR=dict(trans_lr=1e-5, renderer_lr=E2E_RENDERER_LR,
                           use_scheduler=True),
                   loss_weight=dict(boundary_loss=1.0),
                   fluid_neighbor_k=128, obstacle_neighbor_k=64,
                   grid_max_per_cell=64, conv_precision=CONV_PREC,
                   fused_slab_cap=FUSED_SLAB,
                   anchor=dict(enabled=ANCHOR, weight=1.0, rays=1024,
                               n_views=2),
                   pretrained_renderer=wt.modelpath,
                   pretrained_transition_model=tt.modelpath,
                   partial_load=False, search_backend=SEARCH_BACKEND),
        TEST=dict(imgW=400, imgH=400, scale=1.0, start_index=0, end_index=61),
        RENDERER=renderer_cfg(),
        **scene_cfg(),
    ))
    et = E2ETrainer(cfg)
    d0 = et.test_dataset[0]
    n_steps = len(et.test_dataset)
    roll_args = (
        jnp.asarray(d0["particles_pos"]), jnp.asarray(d0["particles_vel"]),
        jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]),
    )
    fe = FluidErrors()

    def eval_rollout(params_t, tag):
        traj, over, caps = rollout_with_retry(
            et.transition, params_t, *roll_args, n_steps, log,
        )
        dists = []
        for t in range(n_steps):
            gt = et.test_dataset[t]["particles_pos_1"]
            dists.append(fe.cal_errors(traj[t], gt, t + 1))
        row = reference_pred2gt_windows(dists)
        row["rollout_overflow"] = over
        row["caps_used"] = caps
        results[tag] = row
        log(f"{tag}: {row}")
        flush_results()
        return traj

    # ABLATION row 1: the pretrained transition model, before any e2e update
    # (same eval machinery as the post-e2e row — directly comparable)
    eval_rollout(et.params_t, "pred2gt_mm_pretrained")

    eloss = et.train(n_epochs=E2E_EPOCHS, eval_during_training=False)
    et.save_checkpoint(E2E_EPOCHS * 50)
    results["e2e"] = {"final_loss": float(eloss),
                      "wall_s": time.time() - t_start}
    log(f"e2e: {results['e2e']}")
    flush_results()

    # ABLATION row 2 + the rollout used for the image report
    traj = eval_rollout(et.params_t, "pred2gt_mm")

    # ------------------------------------------------- full-coverage renders
    # reference eval_e2e.py:102-120 renders EVERY test frame; stride > 1 is
    # an honest labeled subsample for tighter budgets
    frames = list(range(0, n_steps, RENDER_STRIDE))
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
        log(f"frame {t}: {rec}")
        if t % 10 == 0:
            results["image_metrics"] = metrics
            flush_results()
    results["image_metrics"] = metrics
    results["image_metrics_summary"] = {
        "frames_rendered": len(frames),
        "trained_frames": len(metrics["trained"]),
        "rollout_frames": len(metrics["rollout"]),
        "trained_psnr_mean": float(np.mean([m["psnr"] for m in metrics["trained"]])),
        "trained_ssim_mean": float(np.mean([m["ssim"] for m in metrics["trained"]])),
        "rollout_psnr_mean": float(np.mean([m["psnr"] for m in metrics["rollout"]])),
        "rollout_ssim_mean": float(np.mean([m["ssim"] for m in metrics["rollout"]])),
    }
    results["total_wall_s"] = time.time() - t_start
    flush_results()
    print(json.dumps(results["image_metrics_summary"]), flush=True)
    print("PROTOCOL RUN COMPLETE", flush=True)


if __name__ == "__main__":
    main()
