"""CLI surface smoke tests (subprocess, tiny sizes, CPU)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)


def test_demo_smoke(tmp_path):
    """Ungated fast tier: main.py is exercised on every default run
    (train 2 steps at --backbone tiny — full topology, trimmed widths;
    the full-width train→eval→serve round-trips live in TestCLI under
    RUN_SLOW)."""
    r = run_cli("demo", "--synthetic", "--max_steps", "2",
                "--batch_size", "2", "--num_points", "128",
                "--synthetic_frames", "4", "--backbone", "tiny",
                "--work_dir", str(tmp_path / "work"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final:" in r.stdout
    final = json.loads(r.stdout.split("final:")[1].strip())
    assert "total_loss" in final


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="CLI subprocess tests recompile the full model "
                           "(~9 min); set RUN_SLOW=1 to include")
class TestCLI:
    def test_demo_then_eval(self, tmp_path):
        work = str(tmp_path / "work")
        r = run_cli("demo", "--synthetic", "--max_steps", "4",
                    "--batch_size", "4", "--num_points", "128",
                    "--synthetic_frames", "12", "--work_dir", work)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "final:" in r.stdout
        final = json.loads(r.stdout.split("final:")[1].strip())
        assert "total_loss" in final

        r2 = run_cli("eval", "--synthetic", "--synthetic_frames", "8",
                     "--batch_size", "4", "--num_points", "128",
                     "--work_dir", work)
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "restored checkpoint step 4" in r2.stdout
        assert "overall:" in r2.stdout
        assert os.path.exists(os.path.join(work, "eval_all.json"))

    def test_serve_from_checkpoint(self, tmp_path):
        """serve: clouds in, poses out — single-device and SPMD mesh."""
        import numpy as np

        work = str(tmp_path / "work")
        r = run_cli("demo", "--synthetic", "--max_steps", "2",
                    "--batch_size", "4", "--num_points", "128",
                    "--synthetic_frames", "8", "--work_dir", work)
        assert r.returncode == 0, r.stderr[-2000:]
        clouds = np.random.RandomState(0).rand(6, 128, 3).astype(np.float32)
        inp = str(tmp_path / "clouds.npy")
        np.save(inp, clouds)
        out = str(tmp_path / "poses.npz")
        r2 = run_cli("serve", "--batch_size", "4", "--num_points", "128",
                     "--work_dir", work, "--input", inp, "--output", out)
        assert r2.returncode == 0, r2.stderr[-2000:]
        got = np.load(out)
        assert got["R"].shape == (6, 3, 3, 3)
        assert np.isfinite(got["R"]).all()
        # SPMD: 4-device virtual mesh through the same CLI
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4")
        r3 = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"), "serve",
             "--batch_size", "4", "--num_points", "128",
             "--work_dir", work, "--input", inp, "--output", out,
             "--mesh", "data=4"],
            capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
        assert r3.returncode == 0, r3.stderr[-2000:]
        assert "mesh=data=4" in r3.stdout
        got = np.load(out)
        assert got["R"].shape == (6, 3, 3, 3)
        assert np.isfinite(got["R"]).all()

    def test_bad_category_message(self):
        r = run_cli("eval", "--item", "nonexistent", "--synthetic",
                    timeout=120)
        assert r.returncode != 0
        assert "unknown category" in (r.stderr + r.stdout)

    def test_eval_from_hdf5_data_root(self, tmp_path):
        """HDF5-path pose+eval incl. the joint-parameter protocol and the
        NAOCS baseline mode (VERDICT r1 items 4 & 7)."""
        from articulated_pose_tpu.data.synthetic import SyntheticArticulated

        root = str(tmp_path / "data")
        gen = SyntheticArticulated(n_parts=3, points_per_part=150, seed=0)
        gen.export_hdf5(root, "eyeglasses", n_instances=2,
                        frames_per_instance=6, test_fraction=0.34)
        for extra in ([], ["--nocs", "NAOCS", "--baseline_only"]):
            r = run_cli("eval", "--item", "eyeglasses", "--data_root", root,
                        "--batch_size", "4", "--num_points", "128",
                        "--work_dir", str(tmp_path / "work"), *extra)
            assert r.returncode == 0, r.stderr[-2000:]
            assert "overall:" in r.stdout
        assert os.path.exists(os.path.join(str(tmp_path / "work"),
                                           "eval_all.json"))

    def test_eval_bmvc15_laptop(self, tmp_path):
        """BMVC15 real-data path: metric input, per-sample normalization,
        denormalized pose eval (VERDICT r1 item 8)."""
        from articulated_pose_tpu.data.synthetic import SyntheticArticulated

        root = str(tmp_path / "data")
        gen = SyntheticArticulated(n_parts=2, points_per_part=150, seed=0,
                                   joint_types=["revolute"])
        gen.export_hdf5(root, "Laptop", frames_per_instance=6,
                        test_fraction=0.5, instance_names=("0001", "0006"))
        r = run_cli("eval", "--item", "Laptop", "--data_root", root,
                    "--domain", "unseen", "--batch_size", "2",
                    "--num_points", "128", "--full_test",
                    "--work_dir", str(tmp_path / "work"))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "overall:" in r.stdout

    def test_train_from_hdf5_data_root(self, tmp_path):
        """Full real-data path: export reference-layout h5 -> CLI train."""
        from articulated_pose_tpu.data.synthetic import SyntheticArticulated

        root = str(tmp_path / "data")
        gen = SyntheticArticulated(n_parts=3, points_per_part=150, seed=0)
        gen.export_hdf5(root, "eyeglasses", n_instances=2,
                        frames_per_instance=6, test_fraction=0.34)
        r = run_cli("train", "--item", "eyeglasses", "--data_root", root,
                    "--max_steps", "3", "--batch_size", "4",
                    "--num_points", "128",
                    "--work_dir", str(tmp_path / "work"))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "final:" in r.stdout

    def test_from_pred_round_trip(self, tmp_path):
        """Offline protocol: `test` writes h5 -> `eval --from_pred`
        reproduces the live-path eval JSON (fit side bit-identical: same
        preds, same batching, same PRNG; GT side differs only by
        compute_gt_poses' Umeyama refit of the exact synthetic labels).
        Also exercises --baseline_pred with the dir paired to itself,
        which must be a no-op (identical W/nocs override)."""
        work = str(tmp_path / "work")
        r = run_cli("demo", "--synthetic", "--max_steps", "4",
                    "--batch_size", "4", "--num_points", "128",
                    "--synthetic_frames", "8", "--work_dir", work)
        assert r.returncode == 0, r.stderr[-2000:]
        r = run_cli("test", "--synthetic", "--synthetic_frames", "8",
                    "--batch_size", "4", "--num_points", "128",
                    "--work_dir", work)
        assert r.returncode == 0, r.stderr[-2000:]
        pred_dir = os.path.join(work, "test_pred")
        assert len([n for n in os.listdir(pred_dir)
                    if n.endswith(".h5")]) == 8

        r = run_cli("eval", "--synthetic", "--synthetic_frames", "8",
                    "--batch_size", "4", "--num_points", "128",
                    "--work_dir", work)
        assert r.returncode == 0, r.stderr[-2000:]
        live = json.load(open(os.path.join(work, "eval_all.json")))

        r = run_cli("eval", "--from_pred", pred_dir, "--batch_size", "4",
                    "--num_points", "128")
        assert r.returncode == 0, r.stderr[-2000:]
        off_path = os.path.join(pred_dir, "eval_from_pred_all.json")
        off = json.load(open(off_path))
        assert off["n_frames"] == live["n_frames"]
        for lp, op in zip(live["per_part"], off["per_part"]):
            # identical fits, GT poses refit from exact labels -> tight
            assert abs(lp["rot_err_deg_mean"] - op["rot_err_deg_mean"]) < 0.5
            assert abs(lp["trans_err_mean"] - op["trans_err_mean"]) < 0.02
        assert abs(live["overall"]["seg_miou"]
                   - off["overall"]["seg_miou"]) < 1e-6

        # self-paired baseline: overriding W/nocs with themselves is a
        # no-op -> byte-identical report
        os.remove(off_path)
        r = run_cli("eval", "--from_pred", pred_dir,
                    "--baseline_pred", pred_dir,
                    "--batch_size", "4", "--num_points", "128")
        assert r.returncode == 0, r.stderr[-2000:]
        paired = json.load(open(off_path))
        assert paired == off

    def test_joint_baseline_train_eval(self, tmp_path):
        """--model joint_baseline: the reference's third experiment family
        (lib/architecture.py:163-192) drivable end to end."""
        wd = str(tmp_path / "jb")
        r = run_cli("demo", "--model", "joint_baseline", "--synthetic",
                    "--max_steps", "4", "--batch_size", "4",
                    "--num_points", "128", "--synthetic_frames", "8",
                    "--work_dir", wd)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "joint_axis_err_deg" in r.stdout
        r2 = run_cli("eval", "--model", "joint_baseline", "--synthetic",
                     "--synthetic_frames", "8", "--batch_size", "4",
                     "--num_points", "128", "--work_dir", wd)
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "resumed_step\": 4" in r2.stdout
        assert os.path.exists(os.path.join(wd, "joint_baseline_eval.json"))
