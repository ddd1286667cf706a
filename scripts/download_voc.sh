#!/bin/bash
# Download PASCAL VOC 2007+2012 into $1 (default ~/data).
# Equivalent of the reference's datasets/scripts/VOC2007.sh + VOC2012.sh.
set -euo pipefail
ROOT="${1:-$HOME/data}"
mkdir -p "$ROOT"
cd "$ROOT"

base="http://host.robots.ox.ac.uk/pascal/VOC"
for f in \
    "$base/voc2007/VOCtrainval_06-Nov-2007.tar" \
    "$base/voc2007/VOCtest_06-Nov-2007.tar" \
    "$base/voc2012/VOCtrainval_11-May-2012.tar"; do
  name=$(basename "$f")
  [ -f "$name" ] || curl -LO "$f"
  tar -xf "$name"
done
echo "VOC ready under $ROOT/VOCdevkit"
