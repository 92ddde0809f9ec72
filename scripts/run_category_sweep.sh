#!/usr/bin/env bash
# Orchestrated 5-category end-to-end sweep (BASELINE.json configs 4-5):
# generate -> train -> pose-fit -> eval for every reference category
# (registry.py DATASETS mirrors global_info.py:14-181), one report each.
#
#   bash scripts/run_category_sweep.sh [STEPS] [OUTDIR]
#
# Each category trains the flagship ANCSH recipe on the procedural
# generator seeded per category (distinct object instances), fits poses
# with the production RANSAC+LM stage, and writes
# OUTDIR/e2e_<category>_report.json.  ~6 min/category on the dev chip
# at 8000 steps (scan-fused on-device data gen).
set -euo pipefail

STEPS="${1:-8000}"
OUTDIR="${2:-docs}"
HERE="$(cd "$(dirname "$0")/.." && pwd)"
cd "$HERE"

# category  seed  steps (n_parts/joint_types come from the registry).
# The 3-part categories (eyeglasses, drawer) train 3x longer: the round-4
# README table showed 3-part rot err 4.60 deg at 8k vs 1.52 deg at 24k —
# 8k under-trains them while the 2-part categories are converged.
SWEEP=(
  "eyeglasses      1  $((3 * STEPS))"
  "laptop          2  $STEPS"
  "oven            42 $STEPS"
  "washing_machine 43 $STEPS"
  "drawer          3  $((3 * STEPS))"
)

SUMMARY="$OUTDIR/e2e_sweep_summary.json"
echo "{" > "$SUMMARY.tmp"
first=1
for row in "${SWEEP[@]}"; do
  read -r cat seed steps <<< "$row"
  work="/tmp/e2e_sweep_$cat"
  echo "=== $cat (seed $seed, $steps steps) ==="
  # --resume: a fresh $work is unaffected; a rerun after a tunnel stall
  # picks up from the last mid-train snapshot instead of restarting
  python scripts/train_synthetic_e2e.py \
    --category "$cat" --seed "$seed" --steps "$steps" \
    --work "$work" --resume
  cp "$work/report.json" "$OUTDIR/e2e_${cat}_report.json"
  [ $first -eq 0 ] && echo "," >> "$SUMMARY.tmp"
  first=0
  printf ' "%s": ' "$cat" >> "$SUMMARY.tmp"
  python - "$work/report.json" >> "$SUMMARY.tmp" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
o = d["overall"]
keep = {k: o[k] for k in ("rot_err_deg_mean", "trans_err_mean",
                          "acc_5deg5cm", "miou_mean") if k in o}
for k in ("joint_axis_err_deg", "joint_line_dist"):
    if k in o:
        keep[k] = o[k]
keep["seg_acc"] = d.get("seg_acc")
keep["seed"] = d.get("seed")
keep["train_steps"] = d.get("train_steps")
print(json.dumps(keep), end="")
EOF
done
echo "" >> "$SUMMARY.tmp"
echo "}" >> "$SUMMARY.tmp"
mv "$SUMMARY.tmp" "$SUMMARY"
echo "sweep complete -> $SUMMARY"
