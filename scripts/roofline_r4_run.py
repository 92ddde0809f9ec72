"""One-process round-4 roofline session: chip limits + stage table +
pose ablation, all in the SAME process so the numbers are comparable
(the axon tunnel drifts ~1.2x between processes; ratios are only
trustworthy within one — docs/perf_round3.md).

Sequences, in-process (sys.argv-injected main() calls):
  1. scripts/probe_chip_limits.py   — HBM stream/gather, VPU fma, sort
  2. scripts/profile_stages.py      — forward/fps/ballq/three_nn/pose
  3. scripts/ab_pose_r4.py          — pose-fit knob ablation at the
                                      bench configuration (+ the CHEAP
                                      candidate-defaults arm)

Feeds docs/roofline_r4.md.  Run on the chip:
  python scripts/roofline_r4_run.py
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)


def run(mod_name, argv):
    import importlib
    mod = importlib.import_module(mod_name)
    print(f"\n===== {mod_name} {' '.join(argv)} =====", flush=True)
    t0 = time.time()
    sys.argv = [mod_name] + argv
    mod.main()
    print(f"===== {mod_name} done in {time.time()-t0:.0f}s =====", flush=True)


def main():
    run("probe_chip_limits", [])
    run("profile_stages", [])
    run("ab_pose_r4", [])


if __name__ == "__main__":
    main()
