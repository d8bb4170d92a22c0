#!/bin/bash
# Run the full test suite (incl. the slow mesh-scene goldens) on the real
# TPU chip and record the summary in the repo, so TPU parity — which the
# CPU suite does not imply (the hardware-PRNG stream differs from the CPU
# fallback, core/rng.py) — is committed evidence, not assertion.
#
# Usage: tools/run_tpu_tests.sh [round-tag]   (writes TPU_TESTLOG_<tag>.md)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-manual}"
OUT="TPU_TESTLOG_${TAG}.md"
{
  echo "# TPU test run — $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo
  echo "\`CRT_TEST_TPU=1 CRT_SLOW=1 python -m pytest tests/ -q\` on $(python - <<'EOF'
import jax
print(jax.devices()[0].platform, jax.devices()[0].device_kind)
EOF
)"
  echo
  echo '```'
  CRT_TEST_TPU=1 CRT_SLOW=1 timeout 5400 python -m pytest tests/ -q -x 2>&1 | tail -25
  echo '```'
} > "$OUT"
tail -5 "$OUT"
