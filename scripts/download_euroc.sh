#!/usr/bin/env bash
# Download EuRoC MAV sequences (ETH ASL mirror) into data/EuRoC/.
# Usage: scripts/download_euroc.sh [SEQUENCE ...]
# Default: MH_01_easy. Known sequences:
#   MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult
#   V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium
#   V2_03_difficult
set -euo pipefail

BASE_URL="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
OUT_DIR="$(dirname "$0")/../data/EuRoC"
mkdir -p "$OUT_DIR"

declare -A ROOM=(
  [MH_01_easy]=machine_hall [MH_02_easy]=machine_hall
  [MH_03_medium]=machine_hall [MH_04_difficult]=machine_hall
  [MH_05_difficult]=machine_hall
  [V1_01_easy]=vicon_room1 [V1_02_medium]=vicon_room1
  [V1_03_difficult]=vicon_room1
  [V2_01_easy]=vicon_room2 [V2_02_medium]=vicon_room2
  [V2_03_difficult]=vicon_room2
)

SEQS=("${@:-MH_01_easy}")
for seq in "${SEQS[@]}"; do
  room="${ROOM[$seq]:-}"
  if [[ -z "$room" ]]; then
    echo "unknown sequence: $seq" >&2
    exit 1
  fi
  dest="$OUT_DIR/$seq"
  if [[ -d "$dest/mav0" ]]; then
    echo "$seq already present, skipping"
    continue
  fi
  echo "downloading $seq ..."
  mkdir -p "$dest"
  url="$BASE_URL/$room/$seq/$seq.zip"
  curl -L --fail -o "$dest/$seq.zip" "$url"
  (cd "$dest" && unzip -q "$seq.zip" && rm "$seq.zip")
  echo "done: $dest"
done
