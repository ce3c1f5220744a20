"""TPU quality pin: approx (PartialReduce, recall~0.95) vs exact sort selection.

Runs the warmup stage twice on the synthetic watercube-like scene — once with
`search_selection='approx'` (the fast default) and once with `'sort'` (the
exact pytorch3d-faithful mode) — and reports final loss + eval PSNR for both.
This is the genuine recall<1 comparison (CPU approx falls back to exact;
tests/test_selection_quality.py pins path equivalence there).

Usage: python tools/quality_pin_tpu.py [--iters 300]
       python tools/quality_pin_tpu.py --iters 1000 --img 400 \
           --n-samples 64 --n-importance 128 --pairs dense_approx list_sort
       (the PROTOCOL-SCALE pin, round-4 VERDICT item 9)
Record the output in BASELINE.md.
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(selection: str, mode: str, root: str, iters: int,
        img: int, n_samples: int, n_importance: int):
    from neurofluid_tpu.data.synthetic import generate_blender_scene
    from neurofluid_tpu.train.warmup import WarmupTrainer
    from neurofluid_tpu.utils.config import ConfigNode

    scene = os.path.join(root, "scene")
    n_side = 12 if img <= 128 else 24
    if not os.path.isdir(scene):
        generate_blender_scene(
            scene, n_frames=4, n_side=n_side, img_wh=(img, img),
            train_views=("view_1", "view_2", "view_3", "view_4"),
            test_views=("view_5",),
        )

    cfg = ConfigNode(dict(
        expdir=os.path.join(root, "exps"), expname=f"pin_{mode}_{selection}",
        resume_from="",
        TRAIN=dict(seed=10, N_iters=iters, precrop_iters=0, save_interval=10**6,
                   log_interval=50, imgW=img, imgH=img, scale=1.0,
                   LR=dict(lr=5e-4, use_scheduler=True, decay_epochs=10000),
                   pretrained_renderer="", partial_load=False),
        TEST=dict(imgW=img, imgH=img, scale=1.0, start_index=0, end_index=3),
        RENDERER=dict(
            ray=dict(ray_chunk=1024, N_importance=n_importance,
                     N_samples=n_samples),
            NN_search=dict(fix_radius=True, particle_radius=0.025,
                           search_radius_scale=9.0, N_neighbor=20,
                           backend="grid", selection=selection, mode=mode),
            encoding=dict(density=True, var=True, smoothed_pos=True,
                          smoothed_dir=True, exclude_ray=True,
                          same_smooth_factor=False),
            use_mask=True,
        ),
        data_type="splishsplash", near=9.0, far=13.0,
        gravity=[0.0, 0.0, -9.81],
        train=dict(start_index=0, end_index=3, path=scene,
                   views=dict(warmup=["view_1", "view_2", "view_3", "view_4"],
                              dynamic=["view_1"])),
        test=dict(start_index=0, end_index=3, path=scene, views=["view_5"]),
    ))
    tr = WarmupTrainer(cfg)
    loss = tr.train(n_iters=iters)
    res = tr.eval(iters - 1)
    psnr = res["view_5"]["psnr_1"]
    return float(loss), float(psnr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--root", default="/tmp/quality_pin")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--n-samples", type=int, default=32)
    ap.add_argument("--n-importance", type=int, default=32)
    ap.add_argument("--pairs", nargs="+",
                    default=["dense_approx", "list_approx", "list_sort"],
                    help="mode_selection pairs to run")
    args = ap.parse_args()
    if args.fresh:
        shutil.rmtree(args.root, ignore_errors=True)
    os.makedirs(args.root, exist_ok=True)

    out = {"config": {"iters": args.iters, "img": args.img,
                      "n_samples": args.n_samples,
                      "n_importance": args.n_importance}}
    # fast default (fused dense op) vs exact pytorch3d-faithful reference,
    # plus the approx-vs-sort pin within the list pipeline
    for key in args.pairs:
        mode, sel = key.split("_")
        loss, psnr = run(sel, mode, args.root, args.iters,
                         args.img, args.n_samples, args.n_importance)
        out[key] = {"final_loss": loss, "eval_psnr_fine": psnr}
        print(f"{key}: loss={loss:.6f} psnr={psnr:.2f}", flush=True)
    if "list_sort" in out:
        ref = out["list_sort"]["eval_psnr_fine"]
        for key in args.pairs:
            if key != "list_sort":
                out[f"psnr_delta_{key}_vs_exact"] = (
                    out[key]["eval_psnr_fine"] - ref
                )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
