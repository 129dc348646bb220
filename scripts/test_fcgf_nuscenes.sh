#!/bin/bash
# FCGF eval on nuScenes distant pairs
# (reference FCGF_APR/scripts/test_fcgf_nuscenes.sh: 5-20 m pairs; set
#  LONUSCENES=true for the 994 fixed LoNuScenes pairs)
set -e
cd "$(dirname "$0")/.."
python -m scripts.test_fcgf \
  --save_dir "${SAVE_DIR:?set SAVE_DIR}" \
  --kitti_root "${NUSC_ROOT:-./data/nuscenes}" \
  --dataset PairComplementNuscenesDataset \
  --pair_min_dist 5 --pair_max_dist 20 \
  --LoNUSCENES "${LONUSCENES:-false}" "$@"
