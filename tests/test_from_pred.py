"""Offline prediction-h5 pose/eval path (main.py --from_pred).

The decoupled protocol of the reference: the pose stage reads back
per-frame prediction .h5 instead of sharing a process with the network
(reference: evaluation/pose_multi_process.py + parallel_ancsh_pose.py
:225-247), including the ANCSH-h5 + NPCS-baseline-h5 USE_BASELINE
pairing.  The CLI round-trip (test writes h5 -> --from_pred reproduces
the live eval JSON) lives in tests/test_cli.py under RUN_SLOW.
"""

import os

import numpy as np
import pytest

import main as cli
from articulated_pose_tpu.utils.prediction_io import save_batch_predictions

K, N = 3, 64


def _write_pred_dir(path, n_frames, seed, with_joint=True):
    rs = np.random.RandomState(seed)
    pred = {
        "W": rs.rand(n_frames, N, K).astype(np.float32),
        "nocs_per_point": rs.rand(n_frames, N, 3 * K).astype(np.float32),
        "confi_per_point": rs.rand(n_frames, N, 1).astype(np.float32),
    }
    if with_joint:
        pred.update({
            "gocs_per_point": rs.rand(n_frames, N, 3).astype(np.float32),
            "heatmap_per_point": rs.rand(n_frames, N, 1).astype(np.float32),
            "unitvec_per_point": rs.rand(n_frames, N, 3).astype(np.float32),
            "joint_axis_per_point": rs.rand(n_frames, N, 3).astype(np.float32),
            "index_per_point": rs.rand(n_frames, N, K).astype(np.float32),
        })
    batch = {
        "P": rs.rand(n_frames, N, 3).astype(np.float32),
        "cls_gt": rs.randint(0, K, (n_frames, N)).astype(np.float32),
        "nocs_gt": rs.rand(n_frames, N, 3).astype(np.float32),
        "nocs_gt_g": rs.rand(n_frames, N, 3).astype(np.float32),
        "joint_cls_gt": rs.randint(0, K, (n_frames, N)).astype(np.float32),
    }
    names = [f"frame_{i}" for i in range(n_frames)]
    save_batch_predictions(pred, batch, names, str(path))
    return pred, batch


def test_iter_saved_predictions_batches(tmp_path):
    pred, batch = _write_pred_dir(tmp_path / "a", 5, seed=0)
    got = list(cli.iter_saved_predictions(str(tmp_path / "a"), 2))
    assert [g[0]["W"].shape[0] for g in got] == [2, 2, 1]
    # sorted basename order == write order for single-digit frames
    all_W = np.concatenate([g[0]["W"] for g in got])
    np.testing.assert_array_equal(all_W, pred["W"])
    all_P = np.concatenate([g[1]["P"] for g in got])
    np.testing.assert_array_equal(all_P, batch["P"])
    # gt keys survive the round trip
    for k in ("cls_gt", "nocs_gt", "nocs_gt_g", "joint_cls_gt"):
        assert k in got[0][1]


def test_baseline_pairing_semantics(tmp_path):
    """USE_BASELINE: seg + part NOCS from the baseline h5, joint heads
    and the target cloud from the ANCSH h5
    (parallel_ancsh_pose.py:225-247)."""
    pa, ba = _write_pred_dir(tmp_path / "ancsh", 3, seed=0)
    pb, bb = _write_pred_dir(tmp_path / "npcs", 3, seed=1, with_joint=False)
    got = list(cli.iter_saved_predictions(
        str(tmp_path / "ancsh"), 3, baseline_dir=str(tmp_path / "npcs")))
    pred, batch = got[0]
    np.testing.assert_array_equal(pred["W"], pb["W"])                  # fb
    np.testing.assert_array_equal(pred["nocs_per_point"],
                                  pb["nocs_per_point"])                # fb
    np.testing.assert_array_equal(pred["joint_axis_per_point"],
                                  pa["joint_axis_per_point"])          # f
    np.testing.assert_array_equal(batch["P"], ba["P"])                 # f

def test_wrong_n_max_parts_errors(tmp_path):
    _write_pred_dir(tmp_path / "a", 2, seed=0)
    with pytest.raises(SystemExit, match="n_max_parts"):
        list(cli.iter_saved_predictions(str(tmp_path / "a"), 2,
                                        n_max_parts=K + 1))


def test_missing_baseline_file_errors(tmp_path):
    _write_pred_dir(tmp_path / "a", 2, seed=0)
    _write_pred_dir(tmp_path / "b", 1, seed=1)  # one frame short
    with pytest.raises(SystemExit, match="baseline_pred"):
        list(cli.iter_saved_predictions(str(tmp_path / "a"), 2,
                                        baseline_dir=str(tmp_path / "b")))


def test_empty_dir_errors(tmp_path):
    os.makedirs(tmp_path / "empty", exist_ok=True)
    with pytest.raises(SystemExit, match="no .h5"):
        list(cli.iter_saved_predictions(str(tmp_path / "empty"), 2))
