#!/usr/bin/env bash
# One-command dataset parity check (BASELINE.md: TPU-build ATE within 2%
# of the reference's on the public bags).  Requires: docker, the reference
# tree, and a dataset bag on disk.  Zero-egress rigs can't run this; it is
# the prepared recipe for the day the bags + network are available.
#
#   tools/parity/run_parity.sh <dataset: leg_fusion|diter|nclt|hilti> <bag>
set -euo pipefail
DATASET=${1:?dataset name}
BAG=$(realpath "${2:?bag path}")
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
REF=${REFERENCE_DIR:-/root/reference}
OUT=$(mktemp -d)

# 1) Golden TUM from the containerized C++ node.
cp -r "$REF" "$HERE/reference"
trap 'rm -rf "$HERE/reference"' EXIT
docker build -t legkilo-parity "$HERE"
docker run --rm -v "$BAG":/data/in.bag:ro -v "$OUT":/out legkilo-parity \
    "/ws/src/Leg-KILO/legkilo/config/$DATASET.yaml" /data/in.bag
GOLDEN=$(ls "$OUT"/*.txt | head -1)
echo "golden trajectory: $GOLDEN"

# 2) TPU-build replay of the same bag with the same (verbatim) config.
cd "$REPO"
python -m legkilo_tpu run \
    --config_file "$REF/legkilo/config/$DATASET.yaml" \
    --bag "$BAG" --traj_out "$OUT/tpu.tum"

# 3) ATE of ours against the golden run (and optionally dataset GT).
python -m legkilo_tpu eval --est "$OUT/tpu.tum" --gt "$GOLDEN"
