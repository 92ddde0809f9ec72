"""Reference-checkpoint name mapping + overlay tests (synthetic npz)."""

import numpy as np
import pytest

import jax

from articulated_pose_tpu.models.ancsh import ANCSHModel
from articulated_pose_tpu.models.pointnet2 import BackboneSpec
from articulated_pose_tpu.utils import tf_ckpt

TINY = BackboneSpec(
    sa_npoints=(16, 8), sa_radii=(0.25, 0.5), sa_nsamples=(8, 8),
    sa_mlps=((8, 16), (16, 32)), global_mlp=(32, 64),
    fp_mlps=((32,), (32,), (16, 16)), head_width=16,
)


class TestNameMapping:
    @pytest.mark.parametrize("tf_name,flax_path,is_stat", [
        ("SPFN/est_net/layer1/conv0/weights",
         ("backbone", "sa1", "mlp", "conv0", "dense", "kernel"), False),
        ("SPFN/est_net/layer3/conv2/bn/gamma",
         ("backbone", "sa_global", "mlp", "conv2", "bn", "scale"), False),
        ("SPFN/est_net/fa_layer2/conv_0/bn/moving_mean",
         ("backbone", "fp2", "mlp", "conv0", "bn", "mean"), True),
        ("SPFN/est_net/fc1/biases",
         ("backbone", "fc1", "dense", "bias"), False),
        ("SPFN/nocs_net/fc2_1/weights",
         ("fc2_1", "dense", "kernel"), False),
        ("SPFN/joint_net/fc4_3/weights",
         ("joint_net", "fc4_3", "dense", "kernel"), False),
        ("SPFN/joint_net/fc3_0/bn/beta",
         ("joint_net", "fc3_0", "bn", "bias"), False),
    ])
    def test_mapping(self, tf_name, flax_path, is_stat):
        got = tf_ckpt.map_var_name(tf_name)
        assert got is not None, tf_name
        assert got == (flax_path, is_stat)

    def test_unknown_returns_none(self):
        assert tf_ckpt.map_var_name("beta1_power") is None
        assert tf_ckpt.map_var_name("SPFN/other/fcX/weights") is None

    def test_kernel_conversion(self):
        a = np.zeros((1, 1, 3, 8))
        assert tf_ckpt._convert_kernel(a).shape == (3, 8)
        b = np.zeros((1, 5, 7))
        assert tf_ckpt._convert_kernel(b).shape == (5, 7)


class TestOverlay:
    def test_load_reference_weights(self, tmp_path):
        model = ANCSHModel(n_max_parts=3, mixed=True, pred_joint=True,
                           backbone_spec=TINY)
        P = np.random.RandomState(0).rand(1, 64, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), P)
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables["batch_stats"])

        # synthesize an npz with one conv kernel + one bn stat in TF naming
        k_shape = np.asarray(params["backbone"]["sa1"]["mlp"]["conv0"]
                             ["dense"]["kernel"]).shape
        mean_shape = np.asarray(stats["backbone"]["sa1"]["mlp"]["conv0"]
                                ["bn"]["mean"]).shape
        w = np.full((1, 1) + k_shape, 0.123, np.float32)
        m = np.full(mean_shape, 7.0, np.float32)
        npz = str(tmp_path / "ckpt.npz")
        np.savez(npz, **{
            "SPFN/est_net/layer1/conv0/weights": w,
            "SPFN/est_net/layer1/conv0/bn/moving_mean": m,
            "SPFN/est_net/layer1/conv0/weights/Adam": w,  # skipped
            "some/unknown/var": np.zeros(3),              # unmapped
        })
        new_p, new_s, report = tf_ckpt.load_reference_weights(npz, params, stats)
        np.testing.assert_allclose(
            new_p["backbone"]["sa1"]["mlp"]["conv0"]["dense"]["kernel"], 0.123)
        np.testing.assert_allclose(
            new_s["backbone"]["sa1"]["mlp"]["conv0"]["bn"]["mean"], 7.0)
        assert len(report["mapped"]) == 2
        assert "some/unknown/var" in report["unmapped"]
        # untouched leaves stay identical
        np.testing.assert_array_equal(
            new_p["fc2_0"]["dense"]["kernel"],
            params["fc2_0"]["dense"]["kernel"])
