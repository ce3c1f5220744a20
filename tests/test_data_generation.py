"""Data-generation subsystem tests: bgeo round-trip, scene driver, meshing."""

import json
import os.path as osp

import numpy as np
import pytest

from neurofluid_tpu.data_generation import bgeo, physics_scenes, surface_meshes


class TestBgeo:
    def test_roundtrip_positions_and_attributes(self, tmp_path, rng):
        pos = rng.normal(size=(100, 3)).astype(np.float32)
        vel = rng.normal(size=(100, 3)).astype(np.float32)
        ids = np.arange(100, dtype=np.int32)[::-1].copy()
        path = str(tmp_path / "p.bgeo")
        bgeo.write_bgeo(path, pos, {"velocity": vel, "id": ids})
        rpos, attrs = bgeo.read_bgeo(path)
        np.testing.assert_allclose(rpos, pos, rtol=1e-6)
        np.testing.assert_allclose(attrs["velocity"], vel, rtol=1e-6)
        np.testing.assert_array_equal(attrs["id"], ids)

    def test_no_attributes(self, tmp_path, rng):
        pos = rng.normal(size=(7, 3)).astype(np.float32)
        path = str(tmp_path / "p.bgeo")
        bgeo.write_bgeo(path, pos)
        rpos, attrs = bgeo.read_bgeo(path)
        np.testing.assert_allclose(rpos, pos, rtol=1e-6)
        assert attrs == {}

    def test_rejects_bad_magic(self, tmp_path):
        path = str(tmp_path / "bad.bgeo")
        with open(path, "wb") as f:
            f.write(b"NOPE1234")
        with pytest.raises(ValueError):
            bgeo.read_bgeo(path)

    def test_big_endian_layout(self, tmp_path):
        """Header ints must be big-endian (classic bgeo contract)."""
        pos = np.zeros((3, 3), np.float32)
        path = str(tmp_path / "p.bgeo")
        bgeo.write_bgeo(path, pos)
        raw = open(path, "rb").read()
        assert raw[:4] == b"Bgeo"
        n_points = int.from_bytes(raw[9:13], "big")
        assert n_points == 3


class TestPhysicsScenes:
    def test_box_surface_sampling(self):
        box, nrm = physics_scenes.sample_box_surface((-1, -1, -1), (1, 1, 1), 0.25)
        assert box.shape == nrm.shape
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-6)
        # every point on the box surface
        on_face = np.isclose(np.abs(box), 1.0, atol=1e-5).any(axis=-1)
        assert on_face.all()
        # inward normals
        assert np.all(((box + 0.1 * nrm) >= -1 - 1e-5) & ((box + 0.1 * nrm) <= 1 + 1e-5))

    def test_fluid_block_spacing(self):
        pts = physics_scenes.sample_fluid_block((0, 0, 0), (0.5, 0.5, 0.5), 0.05)
        assert len(pts) == 1000
        assert pts.min() >= 0 and pts.max() <= 0.5

    def test_scene_description_contract(self):
        fluid = physics_scenes.sample_fluid_block((0, 0, 0), (0.2, 0.2, 0.2), 0.05)
        scene = physics_scenes.build_scene_description([fluid], (-1, -1, -1), (1, 1, 1))
        cfg = scene["Configuration"]
        # the physical contract of the reference (create_physics_scenes.py:35-59)
        assert cfg["particleRadius"] == 0.025
        assert cfg["simulationMethod"] == 4
        assert cfg["density0"] == 1000
        assert cfg["particleFPS"] == 50.0
        assert scene["Simulation"]["viscosity"] == 0.08
        assert scene["Simulation"]["boundaryHandlingMethod"] == 2
        assert len(scene["FluidModels"]) == 1

    def test_generate_scene_fallback(self, tmp_path):
        """Without the C++ simulator installed, the synthetic fallback writes
        the full raw layout."""
        out = physics_scenes.generate_scene(
            str(tmp_path / "scene"),
            fluid_lower=(-0.1, -0.1, 0.4), fluid_upper=(0.1, 0.1, 0.6),
            n_frames=5,
        )
        assert osp.exists(osp.join(out, "scene.json"))
        assert osp.exists(osp.join(out, "box.npz"))
        frames = sorted(
            osp.basename(p)
            for p in __import__("glob").glob(osp.join(out, "output", "*.npz"))
        )
        assert frames == [f"fluid_{i:04d}.npz" for i in range(5)]
        scene = json.load(open(osp.join(out, "scene.json")))
        assert scene["Configuration"]["particleRadius"] == 0.025

    def test_convert_bgeo_sequence_sorts_by_id(self, tmp_path, rng):
        pos = rng.normal(size=(10, 3)).astype(np.float32)
        vel = rng.normal(size=(10, 3)).astype(np.float32)
        perm = rng.permutation(10).astype(np.int32)
        bdir = tmp_path / "bgeo"
        bdir.mkdir()
        bgeo.write_bgeo(
            str(bdir / "f_0.bgeo"), pos[perm], {"velocity": vel[perm], "id": perm}
        )
        n = physics_scenes.convert_bgeo_sequence(str(bdir), str(tmp_path / "out"))
        assert n == 1
        data = np.load(str(tmp_path / "out" / "fluid_0000.npz"))
        np.testing.assert_allclose(data["pos"], pos, rtol=1e-6)
        np.testing.assert_allclose(data["vel"], vel, rtol=1e-6)


class TestSurfaceMeshes:
    def test_density_grid_mass_conservation(self, rng):
        pts = rng.uniform(0, 0.3, size=(50, 3)).astype(np.float32)
        grid, origin = surface_meshes.particle_density_grid(
            pts, voxel_size=0.05, kernel_radius=0.1
        )
        assert grid.sum() > 0
        # density peaks near particles
        idx = np.floor((pts[0] - origin) / 0.05).astype(int)
        assert grid[tuple(idx)] > 0

    def test_mesh_frame_writes_ply(self, tmp_path, rng):
        # a dense blob produces a surface
        pts = rng.uniform(0, 0.2, size=(200, 3)).astype(np.float32)
        out = surface_meshes.mesh_particle_frame(
            pts, str(tmp_path / "m.ply"), voxel_size=0.04, kernel_radius=0.08
        )
        head = open(out).read(200)
        assert head.startswith("ply")
        assert "element vertex" in head
