#!/bin/bash
set -e
cd "$(dirname "$0")/.."
python -m scripts.test_apr \
  --save_dir "${SAVE_DIR:?set SAVE_DIR}" \
  --kitti_root "${NUSC_ROOT:-./data/nuscenes}" \
  --dataset PairComplementNuscenesDataset \
  --LoNUSCENES "${LONUSCENES:-true}" "$@"
