"""Import reference PyTorch checkpoints into this framework's param pytrees.

The reference releases `.pt` checkpoints saved as
{step, renderer_state_dict, transition_model_state_dict, optimizer_state_dict}
(reference trainer/trainer_e2e.py:152-158), warmup renderer checkpoints
{step, renderer_state_dict, optimizer_state_dict}
(reference trainer/trainer_renderer.py:68-72), and transition checkpoints
{step, model_state_dict, optimizer_state_dict}
(reference trainer/trainer_transmodel.py:216-220). The staged pipeline
warm-starts from them, so checkpoint-level parity requires a converter:

- NeRF MLP: torch `nn.Linear` weights (out, in) -> flax `Dense` kernels
  (in, out) = weight.T; torch Sequential(Linear, ReLU) names its Linear `.0`
  (reference models/nerf.py:60-81).
- ParticleNet: Open3D `ContinuousConv` stores a dense filter
  `kernel` of shape (k0, k1, k2, in_channels, filters) plus a `bias`
  (use_bias=True default) — both map 1:1 onto `ContinuousConvLayer`'s
  params; `nn.Linear` denses transpose as above; the `gravity` buffer is
  stripped exactly as the reference loader does
  (reference trainer/basetrainer.py:87-103).

Buffers and keys this framework holds as config (gravity) or does not have
(Open3D conv `offset` buffers, num_batches_tracked, ...) are skipped with a
report, never silently: `import_*` functions return (params, skipped).
"""

from __future__ import annotations

import numpy as np


def _to_numpy(t):
    if hasattr(t, "detach"):  # torch tensor without importing torch
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_file(path: str) -> dict:
    """torch.load a checkpoint file to CPU (torch is an import-time dep only
    of this entry point, not of the framework)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _set(tree: dict, path: tuple, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_nerf_state(state_dict: dict, prefix: str = "") -> tuple[dict, list]:
    """Torch NeRF state_dict (reference models/nerf.py:41-123) -> flax params.

    Handles the Sequential `.0` Linear naming for xyz_encoding_{i},
    dir_encoding and rgb, and the bare Linear names xyz_encoding_final and
    sigma. Keys not starting with `prefix` are ignored (caller splits
    coarse/fine); unrecognized prefixed keys are returned in `skipped`.
    """
    params: dict = {}
    skipped = []
    for key, value in state_dict.items():
        if prefix and not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        parts = name.split(".")
        # strip the Sequential index ("xyz_encoding_1.0.weight")
        parts = [p for p in parts if not p.isdigit()]
        if len(parts) != 2 or parts[1] not in ("weight", "bias"):
            skipped.append(key)
            continue
        layer, kind = parts
        v = _to_numpy(value).astype(np.float32)
        if kind == "weight":
            _set(params, (layer, "kernel"), v.T)
        else:
            _set(params, (layer, "bias"), v)
    return params, skipped


def import_renderer_state(state_dict: dict) -> tuple[dict, list]:
    """Reference RenderNet state_dict -> flax RenderNet params
    ({"nerf_coarse": ..., "nerf_fine": ...}; the embeddings are
    parameter-free, reference models/renderer.py:30-44)."""
    coarse, s1 = import_nerf_state(state_dict, prefix="nerf_coarse.")
    fine, s2 = import_nerf_state(state_dict, prefix="nerf_fine.")
    unclaimed = [
        k for k in state_dict
        if not (k.startswith("nerf_coarse.") or k.startswith("nerf_fine."))
    ]
    return {"nerf_coarse": coarse, "nerf_fine": fine}, s1 + s2 + unclaimed


def import_transition_state(state_dict: dict) -> tuple[dict, list]:
    """Reference ParticleNet state_dict (reference models/transmodel.py:41-71)
    -> flax ParticleNet params.

    conv{0_fluid,0_obstacle,1..3}.kernel/.bias map onto ContinuousConvLayer;
    dense{0_fluid,1..3}.weight/.bias transpose onto nn.Dense. The `gravity`
    buffer is stripped (reference trainer/basetrainer.py:99) — gravity is
    config here, not state. Open3D-internal buffers (e.g. `offset`) are
    skipped and reported.
    """
    params: dict = {}
    skipped = []
    for key, value in state_dict.items():
        if "gravity" in key:
            continue  # buffer -> config (reference basetrainer.py:99)
        parts = key.split(".")
        if len(parts) != 2:
            skipped.append(key)
            continue
        layer, kind = parts
        v = _to_numpy(value).astype(np.float32)
        if layer.startswith("conv"):
            if kind in ("kernel", "bias"):
                _set(params, (layer, kind), v)
            else:
                skipped.append(key)
        elif layer.startswith("dense"):
            if kind == "weight":
                _set(params, (layer, "kernel"), v.T)
            elif kind == "bias":
                _set(params, (layer, "bias"), v)
            else:
                skipped.append(key)
        else:
            skipped.append(key)
    return params, skipped


def import_checkpoint_file(path: str) -> dict:
    """Convert a reference `.pt` checkpoint into this framework's checkpoint
    state dict {"step", "renderer"?, "transition"?} (the orbax payload the
    trainers' `pretrained_*` loaders consume). Handles all three stage
    layouts; reports skipped keys on stdout."""
    ckpt = load_torch_file(path)
    state: dict = {"step": int(ckpt.get("step", 0))}
    all_skipped = []
    if "renderer_state_dict" in ckpt:
        params, skipped = import_renderer_state(ckpt["renderer_state_dict"])
        state["renderer"] = {"params": params}
        all_skipped += skipped
    tsd = ckpt.get("transition_model_state_dict", ckpt.get("model_state_dict"))
    if tsd is not None:
        params, skipped = import_transition_state(tsd)
        state["transition"] = {"params": params}
        all_skipped += skipped
    if all_skipped:
        print(f"import_torch_ckpt: skipped {len(all_skipped)} non-param keys: "
              f"{sorted(all_skipped)}")
    if len(state) == 1:
        raise ValueError(
            f"{path} contains no renderer_state_dict / "
            "transition_model_state_dict / model_state_dict"
        )
    return state


def assert_tree_shapes_match(imported: dict, target: dict, path=""):
    """Raise with the offending path if the imported tree is missing params
    or has mismatched shapes vs a freshly-initialized target tree."""
    for k, v in target.items():
        p = f"{path}/{k}"
        if k not in imported:
            raise ValueError(f"imported checkpoint missing {p}")
        if isinstance(v, dict):
            assert_tree_shapes_match(imported[k], v, p)
        else:
            got = np.shape(imported[k])
            want = np.shape(v)
            if got != want:
                raise ValueError(f"shape mismatch at {p}: {got} vs {want}")
    extra = set(imported) - set(target)
    if extra:
        raise ValueError(f"imported checkpoint has extra keys at {path}: {extra}")
