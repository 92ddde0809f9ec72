"""Profile `main.py eval` at dataset scale (round-2 verdict item 7).

Generates an N-frame synthetic HDF5 fixture, runs the eval CLI
in-process under cProfile, and prints frames/sec plus the top host-side
hotspots, so per-frame Python work that would make a 5k-frame reference
split take hours shows up with a name on it.

Usage: JAX_PLATFORMS=cpu python scripts/profile_eval_scale.py --frames 512
"""
import argparse
import cProfile
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512,
                    help="total frames (test split gets ~all via demo mode)")
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    from articulated_pose_tpu.data.synthetic import SyntheticArticulated

    root = args.root or tempfile.mkdtemp(prefix="eval_scale_")
    gen = SyntheticArticulated(n_parts=3, points_per_part=300, seed=0)
    t0 = time.perf_counter()
    # all frames into ONE test instance so the test split holds them all
    gen.export_hdf5(root, "eyeglasses", n_instances=1,
                    frames_per_instance=args.frames, test_fraction=1.0)
    print(f"fixture: {args.frames} frames in {time.perf_counter()-t0:.1f}s "
          f"at {root}")

    import main as cli

    argv = ["eval", "--item", "eyeglasses", "--data_root", root,
            "--num_points", str(args.num_points),
            "--batch_size", str(args.batch_size),
            "--work_dir", os.path.join(root, "work"), "--full_test"]
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.runcall(cli.main, argv)
    wall = time.perf_counter() - t0
    print(f"\neval wall: {wall:.1f}s -> {args.frames / wall:.1f} frames/sec")
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative")
    print("\n== top cumulative ==")
    stats.print_stats(r"articulated_pose_tpu|main\.py", 25)


if __name__ == "__main__":
    main()
