"""Rebuild docs/e2e_sweep_summary.json from the five per-category
reports (the inline builder in run_category_sweep.sh, standalone — for
reruns of a single category after a tunnel stall).

  python scripts/rebuild_sweep_summary.py [--docs docs]
"""
import argparse
import json
import os

CATEGORIES = ["eyeglasses", "laptop", "oven", "washing_machine", "drawer"]
KEEP = ("rot_err_deg_mean", "trans_err_mean", "acc_5deg5cm", "miou_mean",
        "joint_axis_err_deg", "joint_line_dist")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="docs")
    args = ap.parse_args()

    out = {}
    for cat in CATEGORIES:
        path = os.path.join(args.docs, f"e2e_{cat}_report.json")
        d = json.load(open(path))
        o = d["overall"]
        keep = {k: o[k] for k in KEEP if k in o}
        keep["seg_acc"] = d.get("seg_acc")
        keep["seed"] = d.get("seed")
        keep["train_steps"] = d.get("train_steps")
        out[cat] = keep
    dst = os.path.join(args.docs, "e2e_sweep_summary.json")
    with open(dst, "w") as f:
        f.write("{\n")
        f.write(",\n".join(f' "{c}": {json.dumps(v)}'
                           for c, v in out.items()))
        f.write("\n}\n")
    print("wrote", dst)


if __name__ == "__main__":
    main()
