"""Checkpoint save/restore with the reference's staged-transfer semantics.

The reference saves torch state dicts {step, renderer_state_dict,
transition_model_state_dict, optimizer_state_dict} every save_interval
(reference trainer/trainer_e2e.py:152-158, trainer_renderer.py:68-72,
trainer_transmodel.py:216-220), and supports cross-stage transfer:
- loading a transition model while stripping the `gravity` buffer
  (reference trainer/basetrainer.py:87-103) — in this framework gravity is
  config, not a parameter, so nothing needs stripping,
- partial renderer load of only `sigma` / `xyz_encoding` parameters
  (reference trainer/basetrainer.py:106-122).

Implementation: orbax-checkpoint PyTree save/restore (the TPU-native
checkpointing stack), with step-numbered directories mirroring the
reference's `<exp>/models/<step>.pt` naming.
"""

from __future__ import annotations

import os
import os.path as osp
import re

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: dict) -> str:
    """Save a pytree `state` under <directory>/<step>."""
    os.makedirs(directory, exist_ok=True)
    path = osp.join(osp.abspath(directory), str(step))
    state = jax.tree_util.tree_map(np.asarray, state)
    _checkpointer().save(path, state, force=True)
    return path


def latest_step(directory: str) -> int | None:
    if not osp.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if re.fullmatch(r"\d+", d)]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: int | None = None, target=None):
    """Restore a pytree. `target` (same structure) restores array types/dtypes
    exactly; without it, raw numpy arrays are returned."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = osp.join(osp.abspath(directory), str(step))
    restored = _checkpointer().restore(path, item=target)
    return restored, step


# ---------------------------------------------------------------------------
# staged-transfer helpers
# ---------------------------------------------------------------------------


def _flatten(params, prefix=()):
    if isinstance(params, dict):
        for k, v in params.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, params


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def merge_renderer_params(target_params, loaded_params, partial_load: bool = False):
    """Overlay loaded renderer params onto `target_params`.

    With `partial_load`, only parameters whose path mentions `sigma` or
    `xyz_encoding` are transferred (reference basetrainer.py:114-121) — the
    warm-started geometry trunk, leaving color heads fresh.
    """
    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, target_params))
    for path, value in _flatten(loaded_params):
        joined = "/".join(path)
        if partial_load and not ("sigma" in joined or "xyz_encoding" in joined):
            continue
        try:
            _set_path(out, path, value)
        except (KeyError, TypeError):
            # tolerate extra keys in the checkpoint, as the reference's
            # state_dict.update does
            continue
    return out
