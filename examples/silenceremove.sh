#!/usr/bin/env bash
# Cut silence out of a media file using vadc_tpu + ffmpeg.
# Equivalent of the reference's silenceremove.bat pipeline:
#   detect speech segments -> build an aselect filterscript -> re-encode.
#
# For wav or raw PCM input no ffmpeg is needed at all — use the native
# one-step tool instead:  python -m vadc_tpu.cli.cut noisy.wav clean.wav
#
# Usage: ./silenceremove.sh input.mp3 output.mp3
set -euo pipefail

in="$1"
out="$2"
script="$(mktemp --suffix=.txt)"
trap 'rm -f "$script"' EXIT

python -m vadc_tpu.cli.main "$in" | python -m vadc_tpu.cli.filter_script > "$script"
ffmpeg -hide_banner -i "$in" -af "$(cat "$script")" "$out"
