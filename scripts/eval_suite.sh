#!/usr/bin/env bash
# Full evaluation orchestration (the reference's evaluation.sh:1-13
# equivalent): prediction dump -> GT poses + per-part/NAOCS pose fits ->
# pose-error / mIoU / joint-parameter reports, seen + unseen domains.
set -euo pipefail
ITEM="${1:-eyeglasses}"
DATA_ROOT="${2:-}"
EXTRA=()
if [ -z "$DATA_ROOT" ]; then EXTRA+=(--synthetic); else EXTRA+=(--data_root "$DATA_ROOT"); fi

python main.py test "${EXTRA[@]}" --item="$ITEM" --nocs_type=ancsh --domain=unseen
for domain in seen unseen; do
  python main.py eval "${EXTRA[@]}" --item="$ITEM" --domain=$domain
  python main.py eval "${EXTRA[@]}" --item="$ITEM" --domain=$domain --nocs NAOCS --baseline_only
done
