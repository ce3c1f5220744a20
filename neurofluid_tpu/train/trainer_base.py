"""Shared trainer infrastructure.

Plays the role of the reference `BaseTrainer` (reference
trainer/basetrainer.py:17-341): experiment directory layout
(<expdir>/<expname>/{models,images,particles}), metric logging, seeding,
boundary-loss constants, pixel sampling with pre-crop, chunked full-image
rendering, and visualization dumps.

TPU differences: the training step itself is a single jitted function (built
by each stage trainer); the chunked render loop here exists only for
*full-image eval* memory control and reuses one compiled chunk function
(static chunk shape), instead of the reference's per-chunk Python loop inside
training (basetrainer.py:282-298).
"""

from __future__ import annotations

import os
import os.path as osp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from neurofluid_tpu.train import losses
from neurofluid_tpu.utils.logging import MetricsLogger, to8b


class TrainerBase:
    def __init__(self, cfg):
        # persistent compilation cache: trainer programs are large (the TPU
        # AOT service takes minutes on a cold e2e step) and identical across
        # stage restarts/resumes — every trainer should hit the cache, not
        # only bench/tools (round-3 VERDICT item 5)
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/nf_tpu_jax_cache"),
            )
        self.cfg = cfg
        self.exppath = osp.join(cfg.expdir, cfg.expname)
        self.imgpath = osp.join(self.exppath, "images")
        self.particlepath = osp.join(self.exppath, "particles")
        self.modelpath = osp.join(self.exppath, "models")
        for d in (self.modelpath, self.imgpath, self.particlepath):
            os.makedirs(d, exist_ok=True)
        self.logger = MetricsLogger(self.exppath)

        seed = int(cfg.TRAIN.seed)
        self.np_rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)

        self.box_bounds = losses.default_box_bounds()

    def next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------
    # search-health policy
    # ------------------------------------------------------------------

    def check_search_overflow(self, flag, step, context: str,
                              fatal: bool = True):
        """Enforce the neighbor-search overflow policy.

        `flag` is the (host-fetched) boolean emitted by the models' search
        diagnostics: a grid cell exceeded `grid_max_per_cell` (tail candidates
        dropped) or a neighborhood exceeded its fixed-K cap where the
        reference semantics are uncapped. Static shapes make silent
        auto-regrow impossible inside jit, so the policy is fail-loudly:
        raise (default) or warn when cfg TRAIN.on_search_overflow == 'warn'.

        `fatal=False` is for EVAL rollouts: a weakly-trained model may
        legitimately diverge during a long autoregressive rollout (the
        reference's uncapped search would roll such a state out happily,
        reference eval_e2e.py:58-76); the overflow is LOGGED and recorded —
        never silent — but evaluating a bad model must not kill a
        multi-hour protocol run whose metric will honestly report the
        divergence anyway. Returns True when overflow was present.
        """
        if not bool(np.asarray(flag)):
            return False
        msg = (
            f"neighbor-search overflow at step {step} ({context}): a cell "
            "grid bucket or fixed-K neighborhood exceeded its static cap, so "
            "near neighbors were dropped and the physics/features are "
            "corrupted. Increase grid_max_per_cell / fluid_neighbor_k (or "
            "the relevant cap) and restart."
        )
        policy = str(self.cfg.TRAIN.get("on_search_overflow", "raise"))
        if policy == "warn" or not fatal:
            print(f"WARNING: {msg}")
            self.logger.scalar(f"overflow/{context}", 1.0, step)
        else:
            raise RuntimeError(msg)
        return True

    def eval_chunk_size(self) -> int:
        """Ray-chunk size for full-image eval renders. The training chunk
        (RENDERER.ray.ray_chunk = 1024, mirroring the reference) is far too
        small to amortize dispatch; eval uses a larger chunk unless
        RENDERER.ray.eval_ray_chunk overrides it. 2048 is the largest chunk
        that reliably compiles at the reference working point: 8192 exceeds
        v5e HBM (the encodings' lane-padded minor-dim-3 intermediates) and
        4096 tripped a TPU LLO register-allocator RET_CHECK in the eval
        render program."""
        ray = self.cfg.RENDERER.ray
        return int(ray.get("eval_ray_chunk", max(int(ray.ray_chunk), 2048)))

    # ------------------------------------------------------------------
    # pixel sampling (reference basetrainer.py:171-193 + trainer loops)
    # ------------------------------------------------------------------

    def sample_pixel_indices(self, height, width, global_step, n_rays, precrop_iters):
        """Flat pixel indices; center crop for the first `precrop_iters` steps."""
        if global_step > precrop_iters:
            candidates = np.arange(height * width)
        else:
            dh = int(height // 2 * 0.5)
            dw = int(width // 2 * 0.5)
            rows = np.arange(height // 2 - dh, height // 2 + dh)
            cols = np.arange(width // 2 - dw, width // 2 + dw)
            candidates = (rows[:, None] * width + cols[None, :]).reshape(-1)
        sel = self.np_rng.choice(candidates.shape[0], size=n_rays, replace=False)
        return candidates[sel]

    # ------------------------------------------------------------------
    # chunked full-image rendering for eval
    # ------------------------------------------------------------------

    def make_chunk_renderer(self, model, params_label="renderer", chunk=1024,
                            method=None, use_scan=None):
        """Returns render_full(params, particles, ro, rays_flat) -> dict of
        stacked outputs.

        Two execution shapes:
        - `use_scan=True` (default for the plain forward): ONE jitted program
          that `lax.scan`s over fixed-`chunk` ray blocks and builds the
          particle search grid once. A 400x400 eval image is a single
          dispatch instead of 79 sequential blocking dispatches (each paying
          the per-dispatch latency of the remote-TPU path); the per-block
          shape stays `chunk`, below the 4096-ray LLO RET_CHECK threshold
          documented at `eval_chunk_size`.
        - `use_scan=False` (and method-renders, whose signatures don't take
          a prebuilt grid): the python-loop fallback, one jitted chunk at a
          time.
        """
        if use_scan is None:
            use_scan = method is None

        @jax.jit
        def render_chunk(params, particles, ro, rays):
            return model.apply(params, particles, ro, rays, method=method)

        @jax.jit
        def render_scanned(params, particles, ro, rays_chunks):
            grid = model._shared_grid(particles)

            def body(carry, rays):
                return carry, model.apply(
                    params, particles, ro, rays, method=method, grid=grid
                )

            _, outs = jax.lax.scan(body, None, rays_chunks)
            return outs

        def _trim(flat, k, n, n_chunks):
            # outputs are either per-ray (dim0 = n_chunks * chunk) or
            # per-sample (dim0 = n_chunks * chunk * S); trim the final
            # chunk's padding either way. Anything else is a bug in the
            # model's output contract — fail loudly, never pass through.
            total = n_chunks * chunk
            if flat.shape[0] % total != 0:
                raise ValueError(
                    f"render output '{k}' has leading dim {flat.shape[0]}, "
                    f"not a multiple of rays {total} — per-ray/per-sample "
                    "output contract violated"
                )
            factor = flat.shape[0] // total
            return flat[: n * factor]

        def render_full(params, particles, ro, rays_flat):
            n = rays_flat.shape[0]
            n_chunks = -(-n // chunk)
            pad_n = n_chunks * chunk - n
            # pad by REPEATING the last real ray (never zeros): a zero-
            # direction ray is degenerate — its fine-pass PDF normalization
            # can emit NaNs and it would trip the untrimmed per-chunk
            # diagnostics (e.g. overflow flags) on garbage geometry
            if use_scan:
                rays_np = np.asarray(rays_flat, np.float32)
                if pad_n:
                    rays_np = np.concatenate(
                        [rays_np, np.repeat(rays_np[-1:], pad_n, axis=0)]
                    )
                stacked = render_scanned(
                    params, particles, ro,
                    jnp.asarray(rays_np.reshape(n_chunks, chunk, 6)),
                )
                merged = {}
                for k, v in stacked.items():
                    v = np.asarray(v)
                    if v.ndim == 1:  # per-chunk scalar diagnostics
                        merged[k] = v
                        continue
                    flat = v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])
                    merged[k] = _trim(flat, k, n, n_chunks)
                return merged
            outs = []
            for i in range(n_chunks):
                part = np.asarray(rays_flat[i * chunk : (i + 1) * chunk])
                pad = chunk - part.shape[0]
                if pad:
                    part = np.concatenate(
                        [part, np.repeat(part[-1:], pad, axis=0)]
                    )
                out = render_chunk(params, particles, ro, jnp.asarray(part))
                outs.append(jax.tree_util.tree_map(np.asarray, out))
            merged = {}
            for k in outs[0]:
                if outs[0][k].ndim == 0:
                    # scalar diagnostics (e.g. the search overflow flag):
                    # one entry per chunk
                    merged[k] = np.stack([o[k] for o in outs])
                    continue
                cat = np.concatenate([o[k] for o in outs], axis=0)
                merged[k] = _trim(cat, k, n, n_chunks)
            return merged

        return render_full

    # ------------------------------------------------------------------
    # visualization (reference basetrainer.py:312-333)
    # ------------------------------------------------------------------

    def visualize_image(self, pred_rgbs, gt_rgbs, height, width, step, prefix,
                        mask=None):
        pred = np.asarray(pred_rgbs).reshape(height, width, 3)
        gt = np.asarray(gt_rgbs).reshape(height, width, 3)
        self.logger.image(f"{prefix}/pred_vs_gt", np.concatenate([gt, pred], 1), step)
        from PIL import Image

        Image.fromarray(to8b(gt)).save(
            osp.join(self.imgpath, f"{prefix}_{step:05d}.png")
        )
        Image.fromarray(to8b(pred)).save(
            osp.join(self.imgpath, f"{prefix}_{step:05d}_pred.png")
        )
        if mask is not None:
            m = np.asarray(mask).reshape(height, width)
            Image.fromarray(to8b(m)).save(
                osp.join(self.imgpath, f"{prefix}_{step:05d}_mask.png")
            )
