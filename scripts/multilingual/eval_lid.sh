#!/usr/bin/env bash
# Run language-identification eval over every experiment folder under $1
# (reference scripts/multilingual/eval_lid.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
path=${1:?usage: eval_lid.sh <experiments_folder>}
python3 evaluate.py --folder "$path" --lid --lid_advanced
