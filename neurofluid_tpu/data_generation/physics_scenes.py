"""Ground-truth physics scene generation (SPlisHSPlasH driver).

TPU-agnostic offline tooling mirroring the reference's scene generator
(reference data_generation/create_physics_scenes.py): build randomized DFSPH
scene descriptions, run the external `DynamicBoundarySimulator` C++ binary,
and convert its .bgeo outputs into the per-frame fluid_XXXX.npz + box.npz
layout the datasets consume.

The simulator binaries are external C++ tools (as in the reference,
data_generation/splishsplash_config.py); when they are absent this module
still provides scene-description building, box sampling, and bgeo->npz
conversion (via the pure-python bgeo reader), and
`neurofluid_tpu.data.synthetic` provides a dependency-free fallback
generator.
"""

from __future__ import annotations

import glob
import json
import os
import os.path as osp
import subprocess

import numpy as np

from neurofluid_tpu.data_generation import bgeo

# physical parameters mirrored from the reference scene description
# (reference create_physics_scenes.py:35-59)
PARTICLE_RADIUS = 0.025
DEFAULT_SCENE = {
    "Configuration": {
        "pause": False,
        "stopAt": 1.2,
        "particleRadius": PARTICLE_RADIUS,
        "numberOfStepsPerRenderUpdate": 1,
        "density0": 1000,
        "simulationMethod": 4,  # DFSPH
        "gravitation": [0, -9.81, 0],
        "cflMethod": 0,
        "cflFactor": 1,
        "cflMaxTimeStepSize": 0.005,
        "maxIterations": 100,
        "maxError": 0.01,
        "maxIterationsV": 100,
        "maxErrorV": 0.1,
        "stiffness": 50000,
        "exponent": 7,
        "velocityUpdateMethod": 0,
        "enableDivergenceSolver": True,
        "enablePartioExport": True,
        "enableRigidBodyExport": True,
        "particleFPS": 50.0,
        "partioAttributes": "density;velocity",
    },
    "Simulation": {
        "timeStepSize": 0.001,
        "viscosity": 0.08,
        "viscosityMethod": 3,
        "boundaryHandlingMethod": 2,
    },
}


def simulator_binaries():
    """Locate the external SPlisHSPlasH binaries via env vars or PATH
    (role of reference data_generation/splishsplash_config.py)."""
    import shutil

    sim = os.environ.get("SPLISHSPLASH_SIMULATOR") or shutil.which(
        "DynamicBoundarySimulator"
    )
    vol = os.environ.get("SPLISHSPLASH_VOLUME_SAMPLING") or shutil.which(
        "VolumeSampling"
    )
    return sim, vol


def sample_box_surface(lower, upper, spacing: float):
    """Boundary particles covering all 6 faces of an axis-aligned box with
    inward normals (role of the Poisson-disk surface sampling in reference
    create_physics_scenes.py:170-180)."""
    lower = np.asarray(lower, np.float32)
    upper = np.asarray(upper, np.float32)
    pts, nrm = [], []
    for axis in range(3):
        u_ax, v_ax = [a for a in range(3) if a != axis]
        us = np.arange(lower[u_ax], upper[u_ax] + 1e-6, spacing, dtype=np.float32)
        vs = np.arange(lower[v_ax], upper[v_ax] + 1e-6, spacing, dtype=np.float32)
        uu, vv = np.meshgrid(us, vs, indexing="ij")
        for side, coord, sign in ((0, lower[axis], 1.0), (1, upper[axis], -1.0)):
            face = np.zeros((uu.size, 3), np.float32)
            face[:, axis] = coord
            face[:, u_ax] = uu.reshape(-1)
            face[:, v_ax] = vv.reshape(-1)
            normal = np.zeros(3, np.float32)
            normal[axis] = sign
            pts.append(face)
            nrm.append(np.tile(normal, (uu.size, 1)))
    pts = np.concatenate(pts)
    nrm = np.concatenate(nrm).astype(np.float32)
    # deduplicate edge/corner points
    _, idx = np.unique(np.round(pts / (spacing * 0.5)).astype(np.int64), axis=0,
                       return_index=True)
    return pts[np.sort(idx)], nrm[np.sort(idx)]


def sample_fluid_block(lower, upper, spacing: float, jitter: float = 0.0,
                       seed: int = 10):
    """Fill a box volume with fluid particles on a regular lattice (simple
    stand-in for the VolumeSampling binary for box-shaped fluids)."""
    rng = np.random.default_rng(seed)
    axes = [np.arange(l + spacing / 2, u, spacing, dtype=np.float32)
            for l, u in zip(lower, upper)]
    g = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([a.reshape(-1) for a in g], -1)
    if jitter:
        pts = pts + rng.normal(scale=jitter, size=pts.shape).astype(np.float32)
    return pts


def build_scene_description(fluid_blocks, box_lower, box_upper, stop_at=1.2,
                            seed: int = 10) -> dict:
    """Assemble a SPlisHSPlasH scene.json dict (reference :35-59 semantics)."""
    scene = json.loads(json.dumps(DEFAULT_SCENE))
    scene["Configuration"]["stopAt"] = stop_at
    scene["RigidBodies"] = [
        {
            "geometryFile": "box.obj",
            "translation": [0, 0, 0],
            "rotationAxis": [0, 1, 0],
            "rotationAngle": 0,
            "scale": list(np.asarray(box_upper) - np.asarray(box_lower)),
            "color": [0.1, 0.4, 0.6, 1.0],
            "isDynamic": False,
            "isWall": True,
            "mapInvert": True,
            "mapThickness": 0.0,
            "mapResolution": [30, 30, 30],
        }
    ]
    scene["FluidModels"] = [
        {
            "particleFile": f"fluid_{i}.bgeo",
            "translation": [0, 0, 0],
            "rotationAxis": [0, 1, 0],
            "rotationAngle": 0,
            "scale": [1, 1, 1],
        }
        for i in range(len(fluid_blocks))
    ]
    return scene


def run_simulator(scene_dir: str, timeout: int = 3600) -> bool:
    """Run DynamicBoundarySimulator on scene_dir/scene.json if available."""
    sim, _ = simulator_binaries()
    if sim is None:
        return False
    subprocess.run(
        [sim, osp.join(scene_dir, "scene.json"), "--no-gui",
         "--output-dir", osp.join(scene_dir, "sim_output")],
        check=True, timeout=timeout,
    )
    return True


def convert_bgeo_sequence(bgeo_dir: str, out_dir: str) -> int:
    """partio .bgeo frames -> fluid_XXXX.npz {pos, vel}, sorted by particle id
    for temporal correspondence (reference physics_data_helper.py:28-59)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(glob.glob(osp.join(bgeo_dir, "*.bgeo")))
    for i, path in enumerate(paths):
        pos, attrs = bgeo.read_bgeo(path)
        vel = np.asarray(attrs.get("velocity", np.zeros_like(pos)), np.float32)
        if "id" in attrs:
            order = np.argsort(np.asarray(attrs["id"]).reshape(-1))
            pos, vel = pos[order], vel[order]
        np.savez(osp.join(out_dir, f"fluid_{i:04d}.npz"), pos=pos, vel=vel)
    return len(paths)


def generate_scene(out_dir: str, box_lower=(-1, -1, -1), box_upper=(1, 1, 2.4552),
                   fluid_lower=(-0.25, -0.25, 0.4), fluid_upper=(0.25, 0.25, 0.9),
                   seed: int = 10, n_frames: int = 60) -> str:
    """Create scene description + box particles; run the real simulator when
    installed, else fall back to the synthetic ballistic simulator."""
    os.makedirs(out_dir, exist_ok=True)
    box, box_normals = sample_box_surface(box_lower, box_upper, spacing=0.05)
    np.savez(osp.join(out_dir, "box.npz"), box=box, box_normals=box_normals)

    fluid = sample_fluid_block(fluid_lower, fluid_upper, spacing=2 * PARTICLE_RADIUS,
                               seed=seed)
    scene = build_scene_description([fluid], box_lower, box_upper)
    with open(osp.join(out_dir, "scene.json"), "w") as f:
        json.dump(scene, f, indent=2)
    bgeo.write_bgeo(osp.join(out_dir, "fluid_0.bgeo"), fluid,
                    {"velocity": np.zeros_like(fluid),
                     "id": np.arange(len(fluid), dtype=np.int32)})

    if run_simulator(out_dir):
        convert_bgeo_sequence(osp.join(out_dir, "sim_output", "partio"),
                              osp.join(out_dir, "output"))
    else:
        from neurofluid_tpu.data import synthetic

        positions, velocities = synthetic.simulate(
            fluid, np.zeros_like(fluid), n_frames, seed=seed
        )
        os.makedirs(osp.join(out_dir, "output"), exist_ok=True)
        for i in range(n_frames):
            np.savez(osp.join(out_dir, "output", f"fluid_{i:04d}.npz"),
                     pos=positions[i], vel=velocities[i])
    return out_dir
