"""CLI utilities + small ops additions."""

import numpy as np
import jax.numpy as jnp

from neurofluid_tpu.ops import ray_ops
from neurofluid_tpu.train import losses


def test_point_to_ray_distance_closed_form():
    # ray along +z through origin; point at (3, 4, 10) -> distance 5
    rays_o = jnp.zeros((1, 3))
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    d = ray_ops.point_to_ray_distance(jnp.asarray([[3.0, 4.0, 10.0]]), rays_o, rays_d)
    np.testing.assert_allclose(float(d[0, 0]), 5.0, rtol=1e-6)


def test_assign_particles_to_rays(rng):
    rays = jnp.asarray(
        [[0, 0, 0, 0, 0, 1.0], [5, 0, 0, 0, 0, 1.0]], jnp.float32
    )
    pts = jnp.asarray([[0.1, 0.0, 3.0], [5.2, 0.1, -2.0]])
    idx = np.asarray(ray_ops.assign_particles_to_rays(pts, rays))
    np.testing.assert_array_equal(idx, [0, 1])


def test_ema_update_matches_reference_formula():
    teacher = {"w": jnp.ones(3)}
    student = {"w": jnp.zeros(3)}
    # step 0: factor = min(1 - 1/1, 0.99) = 0 -> teacher = student
    out = losses.ema_update(teacher, student, 0)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)
    # large step: factor = 0.99
    out = losses.ema_update(teacher, student, 10_000)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.99, rtol=1e-6)


def test_convert_particles_cli(tmp_path, rng):
    import numpy as np
    from neurofluid_tpu.cli import convert_particles
    from neurofluid_tpu.data import io as data_io

    src = tmp_path / "src"
    src.mkdir()
    pos = rng.normal(size=(9, 3)).astype(np.float32)
    np.savez(str(src / "5.npz"), pos=pos, vel=np.zeros_like(pos))
    dst = tmp_path / "dst"
    convert_particles.main(
        ["--data_path", str(src), "--dst_path", str(dst), "--record_type", "obj"]
    )
    back = data_io.read_obj_pointcloud(str(dst / "5.obj"))
    np.testing.assert_allclose(back, pos, atol=0.005)


def test_evaluate_images_cli(tmp_path, rng):
    from PIL import Image

    from neurofluid_tpu.cli import evaluate_images

    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir(), gt.mkdir()
    for i in range(4):
        img = (rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(str(gt / f"{i:05d}.png"))
        noisy = np.clip(img.astype(int) + 10, 0, 255).astype(np.uint8)
        Image.fromarray(noisy).save(str(pred / f"{i:05d}.png"))
    res = evaluate_images.evaluate_dirs(str(pred), str(gt), rollout=2)
    s = res["summary"]
    assert s["frames"] == 4
    assert 20 < s["trained_psnr"] < 40
    assert "rollout_psnr" in s and "trained_ssim" in s
