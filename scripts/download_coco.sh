#!/bin/bash
# Download COCO 2017 into $1 (default ~/data/coco).
# Equivalent of the reference's datasets/scripts/COCO2017.sh.
set -euo pipefail
ROOT="${1:-$HOME/data/coco}"
mkdir -p "$ROOT"
cd "$ROOT"

for f in \
    "http://images.cocodataset.org/zips/train2017.zip" \
    "http://images.cocodataset.org/zips/val2017.zip" \
    "http://images.cocodataset.org/annotations/annotations_trainval2017.zip"; do
  name=$(basename "$f")
  [ -f "$name" ] || curl -LO "$f"
  unzip -qn "$name"
done
echo "COCO ready under $ROOT"
