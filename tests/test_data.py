"""Data pipeline tests on generated synthetic scenes."""

import os.path as osp

import numpy as np
import pytest

from neurofluid_tpu.data import BlenderDataset, ParticleDataset, io, synthetic


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    meta = synthetic.generate_blender_scene(
        root, n_frames=5, n_side=4, img_wh=(40, 40),
        train_views=("view_1", "view_2"), test_views=("view_5",),
    )
    return root, meta


@pytest.fixture(scope="module")
def raw_dataset_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("raw"))
    synthetic.generate_raw_dataset(root, n_sims=2, n_frames=6, n_side=3)
    return root


class TestSynthetic:
    def test_simulation_stays_in_box(self):
        pos0, vel0 = synthetic.make_fluid_blob(n_side=4)
        p, v = synthetic.simulate(pos0, vel0, 20)
        assert p.shape == (20, 64, 3)
        lo = synthetic.BOX_MIN + synthetic.PARTICLE_RADIUS - 1e-5
        hi = synthetic.BOX_MAX - synthetic.PARTICLE_RADIUS + 1e-5
        assert np.all(p >= lo) and np.all(p <= hi)
        # gravity pulls the blob down over time
        assert p[-1, :, 2].mean() < p[0, :, 2].mean()

    def test_pbf_simulation_fluid_like(self):
        """PBF stepper (the DFSPH stand-in): stable, box-contained, and
        incompressible — nearest-neighbor spacing stays near the rest
        spacing instead of compressing to a point (the ballistic fallback's
        failure mode under gravity)."""
        from scipy.spatial import cKDTree

        pos0, vel0 = synthetic.make_fluid_blob(
            n_side=6, center=(0.2, 0.0, 0.0), seed=10
        )
        p, v = synthetic.simulate_pbf(pos0, vel0, 12)
        assert p.shape == (12, 216, 3)
        assert np.isfinite(p).all() and np.isfinite(v).all()
        lo = synthetic.BOX_MIN + synthetic.PARTICLE_RADIUS - 1e-5
        hi = synthetic.BOX_MAX - synthetic.PARTICLE_RADIUS + 1e-5
        assert np.all(p >= lo) and np.all(p <= hi)
        assert p[-1, :, 2].mean() < p[0, :, 2].mean()  # gravity acts
        # no particle clumping or blow-up at any frame
        for f in (5, 11):
            d, _ = cKDTree(p[f]).query(p[f], k=2)
            assert np.median(d[:, 1]) > 0.03  # rest spacing is 0.05
            assert np.median(d[:, 1]) < 0.10
        assert np.abs(v).max() < 20.0
        # deterministic
        p2, _ = synthetic.simulate_pbf(pos0, vel0, 12)
        np.testing.assert_array_equal(p, p2)

    def test_box_normals_point_inward(self):
        box, nrm = synthetic.make_box()
        assert box.shape == nrm.shape
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-6)
        # stepping along the normal moves into the box interior
        inside = box + 0.05 * nrm
        assert np.all(inside[:, 0] >= synthetic.BOX_MIN[0] - 1e-5)
        assert np.all(inside[:, 2] >= synthetic.BOX_MIN[2] - 1e-5)

    def test_rendered_image_contains_fluid(self, blender_scene):
        root, meta = blender_scene
        from PIL import Image

        img = np.asarray(Image.open(osp.join(root, "view_1", "train", "r_0.png")))
        assert img.shape == (40, 40, 4)
        assert img[..., 3].max() > 100  # something visible was splatted


class TestBlenderDataset:
    def test_shapes_and_keys(self, blender_scene):
        root, meta = blender_scene
        ds = BlenderDataset(
            root, img_wh=(40, 40), start_index=0, end_index=5,
            view_names=("view_1", "view_2"), split="train",
        )
        assert len(ds) == 4
        d = ds[0]
        assert d["rgb"].shape == (2, 1600, 3)
        assert d["rays"].shape == (2, 1600, 6)
        assert d["cw"].shape == (2, 3, 4)
        assert d["particles_pos"].shape == meta["positions"][0].shape
        assert d["box"].shape == meta["box"].shape
        # frame t+1 keys present and shifted
        np.testing.assert_allclose(d["particles_pos_1"], meta["positions"][1])
        # rgb in [0, 1], white background blend
        assert d["rgb"].min() >= 0 and d["rgb"].max() <= 1

    def test_rays_normalized_and_origin(self, blender_scene):
        root, meta = blender_scene
        ds = BlenderDataset(
            root, img_wh=(40, 40), start_index=0, end_index=5,
            view_names=("view_1",), split="train",
        )
        rays = ds[0]["rays"][0]
        np.testing.assert_allclose(
            np.linalg.norm(rays[:, 3:], axis=-1), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            rays[:, :3], np.broadcast_to(ds[0]["cw"][0][:, 3], (rays.shape[0], 3)),
            atol=1e-6,
        )

    def test_test_split(self, blender_scene):
        root, meta = blender_scene
        ds = BlenderDataset(
            root, img_wh=(40, 40), start_index=0, end_index=5,
            view_names=("view_5",), split="test",
        )
        assert len(ds) == 4


class TestParticleDataset:
    def test_raw_layout_window3(self, raw_dataset_dir):
        ds = ParticleDataset(raw_dataset_dir, data_type="raw", start=0, end=6,
                             random_rot=False, window=3)
        # 2 sims * (6 - 3) samples ('raw' drops the final window, ref :112)
        assert len(ds) == 6
        d = ds[0]
        for w in range(3):
            assert d[f"particles_pos_{w}"].shape == (27, 3)
            assert d[f"particles_vel_{w}"].shape == (27, 3)
        assert d["box"].shape == d["box_normals"].shape

    def test_rotation_augmentation_preserves_lengths(self, raw_dataset_dir):
        ds = ParticleDataset(raw_dataset_dir, data_type="raw", start=0, end=6,
                             random_rot=True, window=3)
        d0 = ds.items[0]
        d = ds[0]
        np.testing.assert_allclose(
            np.linalg.norm(d["particles_pos_0"], axis=-1),
            np.linalg.norm(d0["particles_pos_0"], axis=-1),
            rtol=1e-5,
        )
        # z column rotated about z axis: z component unchanged
        np.testing.assert_allclose(
            d["particles_pos_0"][:, 2], d0["particles_pos_0"][:, 2], atol=1e-6
        )

    def test_blender_layout(self, blender_scene):
        root, meta = blender_scene
        # blender layout expects view_0; our generator names views view_1..;
        # use blender_all which globs every view dir
        ds = ParticleDataset(root, data_type="blender_all", start=0, end=5,
                             random_rot=False, window=3)
        assert len(ds) > 0
        d = ds[0]
        np.testing.assert_allclose(d["particles_pos_0"], meta["positions"][0])

    def test_sequence_lengths_split_view_duplicates(self, blender_scene,
                                                    raw_dataset_dir):
        # blender_all repeats the same frames once per view dir; an
        # autoregressive consumer must be able to stop at ONE sequence
        root, _ = blender_scene
        ds = ParticleDataset(root, data_type="blender_all", start=0, end=5,
                             random_rot=False, window=3)
        assert sum(ds.sequence_lengths) == len(ds)
        assert len(set(ds.sequence_lengths)) == 1  # equal-length view copies
        assert len(ds.sequence_lengths) > 1
        raw = ParticleDataset(raw_dataset_dir, data_type="raw", start=0, end=6,
                              random_rot=False, window=3)
        assert raw.sequence_lengths == [3, 3]


class TestIO:
    def test_obj_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(17, 3)).astype(np.float32)
        path = str(tmp_path / "cloud.obj")
        with open(path, "w") as fp:
            io.write_obj_pointcloud(pts, fp, color=[255, 0, 0])
        back = io.read_obj_pointcloud(path)
        np.testing.assert_allclose(back, pts, atol=0.005)  # %.2f quantization

    def test_box_npz_roundtrip(self, tmp_path, rng):
        box = rng.normal(size=(10, 3)).astype(np.float32)
        nrm = rng.normal(size=(10, 3)).astype(np.float32)
        path = str(tmp_path / "box.npz")
        io.write_box_npz(path, box, nrm)
        b, n = io.read_box(path)
        np.testing.assert_allclose(b, box)
        np.testing.assert_allclose(n, nrm)

    def test_read_blender_pkl_particles(self, tmp_path, rng):
        import pickle

        pos = rng.normal(size=(5, 3)).astype(np.float32)
        vel = rng.normal(size=(5, 3)).astype(np.float32)
        path = str(tmp_path / "p.pkl")
        with open(path, "wb") as fp:
            pickle.dump({"location": pos, "velocity": vel}, fp)
        p, v = io.read_particles(path, "blender")
        np.testing.assert_allclose(p, pos)
        np.testing.assert_allclose(v, vel)
