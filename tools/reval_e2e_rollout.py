"""Re-evaluate the protocol's post-e2e rollout from the saved checkpoint.

Why this exists: the round-5 protocol recorded `pred2gt_mm.rollout_overflow
= true` from the fused_cconv slab-capacity flag, which was VACUOUS — since
the chunked walk (commit 1866473) the kernel covers the TRUE slab lengths
whatever they are, so the trajectory (and therefore every committed
pred2gt number) was computed exactly; only the flag was a false alarm.
The flag is gone (ops/fused_cconv.py "NO CAPACITY CONDITION"); this tool
re-runs the same rollout + metric windows from the saved e2e checkpoint
and patches PROTOCOL_R5.json's `pred2gt_mm` row in place (noting the
re-eval) so the committed report carries no asterisk.

Run on the real chip: JAX_PLATFORMS=axon,cpu python tools/reval_e2e_rollout.py
"""

import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import full_protocol_run as fpr  # noqa: E402  (reuses cfg helpers/constants)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neurofluid_tpu.train.e2e import E2ETrainer  # noqa: E402
from neurofluid_tpu.utils.config import ConfigNode  # noqa: E402
from neurofluid_tpu.utils.metrics import FluidErrors  # noqa: E402


def main():
    root = fpr.ROOT
    wt_models = osp.join(root, "exps", "warmup", "models")
    tt_models = osp.join(root, "exps", "transition", "models")
    e2e_models = osp.join(root, "exps", "e2e", "models")
    proto_json = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                          "PROTOCOL_R5.json")

    cfg = ConfigNode(dict(
        expdir=osp.join(root, "exps"), expname="e2e_reval", resume_from="",
        TRAIN=dict(seed=10, epochs=0, precrop_iters=0,
                   save_interval=10**7, log_interval=100,
                   imgW=400, imgH=400, scale=1.0, grad_clip_value=1.0,
                   LR=dict(trans_lr=1e-5, renderer_lr=fpr.E2E_RENDERER_LR,
                           use_scheduler=True),
                   loss_weight=dict(boundary_loss=1.0),
                   fluid_neighbor_k=128, obstacle_neighbor_k=64,
                   grid_max_per_cell=64, conv_precision=fpr.CONV_PREC,
                   fused_slab_cap=fpr.FUSED_SLAB,
                   anchor=dict(enabled=fpr.ANCHOR, weight=1.0, rays=1024,
                               n_views=2),
                   pretrained_renderer=wt_models,
                   pretrained_transition_model=tt_models,
                   partial_load=False, search_backend=fpr.SEARCH_BACKEND),
        TEST=dict(imgW=400, imgH=400, scale=1.0, start_index=0, end_index=61),
        RENDERER=fpr.renderer_cfg(),
        **fpr.scene_cfg(),
    ))
    et = E2ETrainer(cfg)
    et.resume(e2e_models)
    print(f"resumed e2e checkpoint from {e2e_models} "
          f"(step {et.start_step - 1})", flush=True)

    d0 = et.test_dataset[0]
    n_steps = len(et.test_dataset)
    traj, over, caps = fpr.rollout_with_retry(
        et.transition, et.params_t,
        jnp.asarray(d0["particles_pos"]), jnp.asarray(d0["particles_vel"]),
        jnp.asarray(d0["box"]), jnp.asarray(d0["box_normals"]),
        n_steps, lambda m: print(m, flush=True),
    )
    fe = FluidErrors()
    dists = []
    for t in range(n_steps):
        gt = et.test_dataset[t]["particles_pos_1"]
        dists.append(fe.cal_errors(traj[t], gt, t + 1))
    row = fpr.reference_pred2gt_windows(dists)
    row["rollout_overflow"] = over
    row["caps_used"] = caps
    row["note"] = (
        "re-evaluated from the saved e2e checkpoint after removing the "
        "vacuous slab-capacity overflow flag (fused_cconv NO CAPACITY "
        "CONDITION); the original round-5 trajectory was computed with "
        "identical math — only its flag was a false alarm"
    )
    print(json.dumps(row, indent=1), flush=True)

    with open(proto_json) as f:
        proto = json.load(f)
    proto["pred2gt_mm"] = row
    with open(proto_json, "w") as f:
        json.dump(proto, f, indent=1)
    print(f"patched pred2gt_mm in {proto_json}", flush=True)


if __name__ == "__main__":
    main()
