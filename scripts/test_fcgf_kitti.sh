#!/bin/bash
set -e
cd "$(dirname "$0")/.."
python -m scripts.test_fcgf \
  --save_dir "${SAVE_DIR:?set SAVE_DIR}" \
  --kitti_root "${KITTI_ROOT:-./data/kitti}" \
  --LoKITTI "${LOKITTI:-true}" "$@"
