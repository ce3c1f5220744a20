"""Torch-checkpoint importer tests: reference `.pt` state dicts -> flax params.

The NeRF case is validated NUMERICALLY: a synthetic torch state_dict is run
through an independent numpy implementation of the reference MLP contract
(reference models/nerf.py:41-123) and must match the flax NeRF evaluated on
the imported params. The ParticleNet case validates the structural mapping
(names, transposes, conv kernel layout, gravity-strip) against a freshly
initialized model tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from neurofluid_tpu.models import NeRF, ParticleNet
from neurofluid_tpu.train import checkpoint as ckpt
from neurofluid_tpu.utils import torch_import


def _rand_linear(rng, out_ch, in_ch):
    return (
        torch.tensor(rng.normal(size=(out_ch, in_ch)).astype(np.float32) * 0.2),
        torch.tensor(rng.normal(size=(out_ch,)).astype(np.float32) * 0.1),
    )


def _torch_nerf_state_dict(rng, prefix="", D=8, W=256, in_xyz=63, in_dir=27,
                           skips=(4,)):
    sd = {}
    for i in range(D):
        cin = in_xyz if i == 0 else (W + in_xyz if i in skips else W)
        w, b = _rand_linear(rng, W, cin)
        sd[f"{prefix}xyz_encoding_{i + 1}.0.weight"] = w
        sd[f"{prefix}xyz_encoding_{i + 1}.0.bias"] = b
    for name, (o, c) in {
        "xyz_encoding_final": (W, W),
        "sigma": (1, W),
    }.items():
        w, b = _rand_linear(rng, o, c)
        sd[f"{prefix}{name}.weight"] = w
        sd[f"{prefix}{name}.bias"] = b
    w, b = _rand_linear(rng, W // 2, W + in_dir)
    sd[f"{prefix}dir_encoding.0.weight"] = w
    sd[f"{prefix}dir_encoding.0.bias"] = b
    w, b = _rand_linear(rng, 3, W // 2)
    sd[f"{prefix}rgb.0.weight"] = w
    sd[f"{prefix}rgb.0.bias"] = b
    return sd


def _numpy_nerf_forward(sd, x, prefix="", D=8, in_xyz=63, skips=(4,)):
    """Independent numpy evaluation of the reference NeRF contract."""
    def lin(name, h):
        w = sd[f"{prefix}{name}.weight"].numpy()
        b = sd[f"{prefix}{name}.bias"].numpy()
        return h @ w.T + b

    xyz, dirs = x[:, :in_xyz], x[:, in_xyz:]
    h = xyz
    for i in range(D):
        if i in skips:
            h = np.concatenate([xyz, h], -1)
        h = np.maximum(lin(f"xyz_encoding_{i + 1}.0", h), 0.0)
    sigma = lin("sigma", h)
    feat = lin("xyz_encoding_final", h)
    d = np.maximum(lin("dir_encoding.0", np.concatenate([feat, dirs], -1)), 0.0)
    rgb = 1.0 / (1.0 + np.exp(-lin("rgb.0", d)))
    return np.concatenate([rgb, sigma], -1)


class TestNeRFImport:
    def test_numerical_match(self, rng):
        sd = _torch_nerf_state_dict(rng, D=4, W=32, in_xyz=15, in_dir=9, skips=(2,))
        params, skipped = torch_import.import_nerf_state(sd)
        assert skipped == []
        model = NeRF(depth=4, width=32, in_channels_xyz=15, in_channels_dir=9,
                     skips=(2,))
        x = rng.normal(size=(6, 24)).astype(np.float32)
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        want = _numpy_nerf_forward(sd, x, D=4, in_xyz=15, skips=(2,))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_renderer_split_and_shapes(self, rng):
        sd = {}
        sd.update(_torch_nerf_state_dict(rng, prefix="nerf_coarse.",
                                         D=2, W=16, in_xyz=15, in_dir=9, skips=(1,)))
        sd.update(_torch_nerf_state_dict(rng, prefix="nerf_fine.",
                                         D=2, W=16, in_xyz=15, in_dir=9, skips=(1,)))
        params, skipped = torch_import.import_renderer_state(sd)
        assert skipped == []
        assert set(params) == {"nerf_coarse", "nerf_fine"}
        assert params["nerf_coarse"]["xyz_encoding_1"]["kernel"].shape == (15, 16)

    def test_partial_load_semantics(self, rng):
        """sigma/xyz_encoding-only transfer (reference basetrainer.py:114-121)
        composes with the existing merge helper."""
        sd = _torch_nerf_state_dict(rng, D=2, W=16, in_xyz=15, in_dir=9, skips=(1,))
        loaded, _ = torch_import.import_nerf_state(sd)
        model = NeRF(depth=2, width=16, in_channels_xyz=15, in_channels_dir=9,
                     skips=(1,))
        fresh = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 24)))["params"]
        merged = ckpt.merge_renderer_params(fresh, loaded, partial_load=True)
        np.testing.assert_allclose(
            merged["sigma"]["kernel"], loaded["sigma"]["kernel"])
        np.testing.assert_allclose(
            merged["xyz_encoding_1"]["kernel"], loaded["xyz_encoding_1"]["kernel"])
        # rgb head stays fresh
        np.testing.assert_allclose(
            merged["rgb"]["kernel"], fresh["rgb"]["kernel"])


def _torch_particle_net_state_dict(rng):
    sd = {"gravity": torch.tensor([0.0, -9.81, 0.0])}
    layer_channels = [32, 64, 64, 3]

    def conv(name, cin, cout):
        sd[f"{name}.kernel"] = torch.tensor(
            rng.normal(size=(4, 4, 4, cin, cout)).astype(np.float32) * 0.05)
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(size=(cout,)).astype(np.float32) * 0.01)

    def dense(name, cin, cout):
        w, b = _rand_linear(rng, cout, cin)
        sd[f"{name}.weight"] = w
        sd[f"{name}.bias"] = b

    conv("conv0_fluid", 4, 32)
    conv("conv0_obstacle", 3, 32)
    dense("dense0_fluid", 4, 32)
    for i in range(1, 4):
        cin = layer_channels[i - 1] * (3 if i == 1 else 1)
        conv(f"conv{i}", cin, layer_channels[i])
        dense(f"dense{i}", cin, layer_channels[i])
    return sd


class TestParticleNetImport:
    def test_structure_matches_init(self, rng):
        sd = _torch_particle_net_state_dict(rng)
        params, skipped = torch_import.import_transition_state(sd)
        assert skipped == []
        assert "gravity" not in params  # buffer stripped (basetrainer.py:99)

        net = ParticleNet(search_backend="brute")
        pos = jnp.asarray(rng.uniform(-0.3, 0.3, size=(30, 3)).astype(np.float32))
        vel = jnp.zeros_like(pos)
        box = jnp.asarray(rng.uniform(-0.5, 0.5, size=(10, 3)).astype(np.float32))
        nrm = jnp.zeros_like(box)
        target = net.init(jax.random.PRNGKey(0), pos, vel, box, nrm)["params"]
        torch_import.assert_tree_shapes_match(params, target)

        # dense transpose: flax kernel[in, out] == torch weight[out, in].T
        np.testing.assert_allclose(
            params["dense1"]["kernel"],
            sd["dense1.weight"].numpy().T,
        )
        # the model runs on the imported params
        p1, v1, _ = net.apply({"params": params}, pos, vel, box, nrm)
        assert np.all(np.isfinite(np.asarray(p1)))

    def test_conv_bias_is_applied(self, rng):
        """Zero kernels + unit conv0 biases shift the correction by a known
        constant through the tail dense chain — pins that imported conv
        biases actually reach the output."""
        sd = _torch_particle_net_state_dict(rng)
        params, _ = torch_import.import_transition_state(sd)
        params = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
        params["conv0_fluid"]["bias"] = np.ones(32, np.float32)

        net = ParticleNet(search_backend="brute", gravity=(0.0, 0.0, 0.0))
        pos = jnp.asarray(rng.uniform(-0.3, 0.3, size=(20, 3)).astype(np.float32))
        vel = jnp.zeros_like(pos)
        box = jnp.asarray(rng.uniform(-0.5, 0.5, size=(8, 3)).astype(np.float32))
        nrm = jnp.zeros_like(box)
        p_bias, _, _ = net.apply({"params": params}, pos, vel, box, nrm)
        params["conv0_fluid"]["bias"] = np.zeros(32, np.float32)
        p_zero, _, _ = net.apply({"params": params}, pos, vel, box, nrm)
        # all other weights are zero, so output equals integrated position
        np.testing.assert_allclose(np.asarray(p_zero), np.asarray(pos), atol=1e-7)
        # with only downstream zeros the bias cannot reach the output...
        np.testing.assert_allclose(np.asarray(p_bias), np.asarray(pos), atol=1e-7)
        # ...but with an identity-ish dense3 it must:
        params["conv0_fluid"]["bias"] = np.ones(32, np.float32)
        params["dense3"]["kernel"] = np.ones((64, 3), np.float32) * 0.0
        params["dense1"]["kernel"] = np.zeros((96, 64), np.float32)
        params["dense1"]["kernel"][32:64, 0] = 1.0  # fluid-conv slice -> ch0
        params["dense3"]["kernel"][0, 0] = 1.0
        p2, _, _ = net.apply({"params": params}, pos, vel, box, nrm)
        delta = np.asarray(p2 - pos)
        # relu(concat[obstacle(0), fluid_bias(1 x32ch), dense(0)]) -> dense1
        # sums the 32 fluid channels into ch0 (=32) -> relu -> dense3 -> the
        # 1/128 correction scale: x-shift of 32/128 = 0.25
        np.testing.assert_allclose(delta[:, 0], 32.0 / 128.0, atol=1e-5)
        np.testing.assert_allclose(delta[:, 1:], 0.0, atol=1e-7)


class TestCheckpointFileRoundtrip:
    def test_e2e_pt_to_orbax(self, rng, tmp_path):
        pt = {
            "step": 1234,
            "renderer_state_dict": {
                **_torch_nerf_state_dict(rng, prefix="nerf_coarse.", D=2, W=16,
                                         in_xyz=15, in_dir=9, skips=(1,)),
                **_torch_nerf_state_dict(rng, prefix="nerf_fine.", D=2, W=16,
                                         in_xyz=15, in_dir=9, skips=(1,)),
            },
            "transition_model_state_dict": _torch_particle_net_state_dict(rng),
            "optimizer_state_dict": {"state": {}, "param_groups": []},
        }
        f = str(tmp_path / "1234.pt")
        torch.save(pt, f)

        state = torch_import.import_checkpoint_file(f)
        assert state["step"] == 1234
        out = str(tmp_path / "models")
        ckpt.save_checkpoint(out, 1234, state)
        restored, step = ckpt.restore_checkpoint(out)
        assert step == 1234
        assert "nerf_coarse" in restored["renderer"]["params"]
        assert "conv0_fluid" in restored["transition"]["params"]

    def test_transmodel_pt_layout(self, rng, tmp_path):
        pt = {"step": 9, "model_state_dict": _torch_particle_net_state_dict(rng),
              "optimizer_state_dict": {}}
        f = str(tmp_path / "9.pt")
        torch.save(pt, f)
        state = torch_import.import_checkpoint_file(f)
        assert "transition" in state and "renderer" not in state

    def test_cli(self, rng, tmp_path):
        from neurofluid_tpu.cli import import_torch_ckpt as cli

        pt = {"step": 5, "model_state_dict": _torch_particle_net_state_dict(rng)}
        f = str(tmp_path / "5.pt")
        torch.save(pt, f)
        out = str(tmp_path / "models")
        cli.main(["--ckpt", f, "--out", out])
        restored, step = ckpt.restore_checkpoint(out)
        assert step == 5 and "transition" in restored
