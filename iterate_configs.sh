#!/bin/bash
# Train every YAML config in a directory sequentially
# (analog of multimodal_compare/iterate_configs.sh).
# Usage: ./iterate_configs.sh <config_dir> [extra main.py flags...]
set -e
DIR="$1"
shift || true
for cfg in "$DIR"/*.yml; do
    echo "=== Training $cfg ==="
    python main.py --cfg "$cfg" "$@"
done
