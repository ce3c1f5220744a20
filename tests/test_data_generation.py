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


class TestRandomizedScenes:
    """Randomized scene generation parity (reference
    create_physics_scenes.py:156-254, 270-400)."""

    def test_rasterize_and_placement_respect_free_space(self, rng):
        pts = physics_scenes.sample_fluid_block((0, 0, 0), (0.3, 0.3, 0.3), 0.05)
        amin, voxel, occ = physics_scenes.rasterize_points(pts, 0.06, 0.025)
        assert occ.any()
        # a shape larger than the free space cannot be placed
        free = np.zeros((4, 4, 4), bool)
        free[1:3, 1:3, 1:3] = True
        big = (np.zeros(3, np.int32), 0.06, np.ones((5, 5, 5), bool))
        g = np.random.default_rng(0)
        assert physics_scenes.find_valid_fluid_start_position(
            g, (np.zeros(3, np.int32), 0.06, free.copy()), big
        ) is None
        # a 2x2x2 shape fits exactly in the free 2x2x2 interior
        small = (np.zeros(3, np.int32), 0.06, np.ones((2, 2, 2), bool))
        f = free.copy()
        off = physics_scenes.find_valid_fluid_start_position(
            g, (np.zeros(3, np.int32), 0.06, f), small
        )
        assert off is not None
        np.testing.assert_allclose(off, np.array([1, 1, 1]) * 0.06)
        assert not f[1:3, 1:3, 1:3].any()  # free space consumed

    def test_rotation_matrix_is_orthonormal(self):
        g = np.random.default_rng(3)
        for s in (0.0, 0.5, 1.0):
            R = physics_scenes.random_rotation_matrix(g, s)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)

    def test_random_scenes_distinct_valid_and_consumable(self, tmp_path):
        from neurofluid_tpu.data.particles import ParticleDataset

        infos = []
        for seed in (1, 2, 3):
            out = osp.join(tmp_path, f"sim_{seed:04d}")
            info = physics_scenes.create_random_scene(
                out, seed=seed, n_frames=5, export_zst=False
            )
            infos.append(info)
            scene = json.load(open(osp.join(out, "scene.json")))
            assert len(scene["FluidModels"]) == len(info["objects"]) >= 1
            pos0 = np.concatenate([o["positions"] for o in info["objects"]])
            # all particles inside the container
            assert pos0.min() >= -1.0 - 1e-6 and pos0[:, 1].min() >= -1e-6
            assert pos0.max() <= 2.0 + 1e-6
            # objects do not interpenetrate: min pairwise distance across
            # objects at least one particle spacing apart-ish
            if len(info["objects"]) > 1:
                a = info["objects"][0]["positions"]
                b = info["objects"][1]["positions"]
                d2 = ((a[:, None, :] - b[None, :200, :]) ** 2).sum(-1)
                assert d2.min() > (0.04) ** 2
            # start velocities randomized within the reference bounds
            v = info["objects"][0]["velocities"][0]
            assert abs(v[0]) <= 2.0 and abs(v[2]) <= 2.0 and abs(v[1]) <= 0.5
        # scenes differ (shape / count / placement)
        n = {i["n_particles"] for i in infos}
        assert len(n) > 1
        # the windowed particle dataset consumes the raw layout
        ds = ParticleDataset(
            str(tmp_path), data_type="raw", start=0, end=4, window=3,
        )
        sample = ds[0]
        assert sample["particles_pos_0"].shape[-1] == 3
        assert len(ds) >= 1

    def test_msgpack_zst_roundtrip(self, tmp_path):
        pytest.importorskip("zstandard")
        pytest.importorskip("msgpack")
        frames = [
            {"frame_id": np.int64(0), "pos": np.ones((5, 3), np.float32),
             "box": np.zeros((2, 3), np.float32)},
            {"frame_id": np.int64(1), "pos": np.full((5, 3), 2.0, np.float32)},
        ]
        path = osp.join(tmp_path, "x.msgpack.zst")
        assert physics_scenes.write_compressed_msgpack(frames, path, level=3)
        back = physics_scenes.read_compressed_msgpack(path)
        assert len(back) == 2
        np.testing.assert_allclose(back[0][b"pos"], 1.0)
        np.testing.assert_allclose(back[1][b"pos"], 2.0)
        assert back[0][b"pos"].dtype == np.float32
