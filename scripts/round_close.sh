#!/bin/bash
# Round-close proof warmup (VERDICT r4 items 1d + 2): after the LAST
# kernel-touching commit, run the full bench + the multichip dryrun so the
# in-repo .jax_cache is warm for the driver's own runs. Verify the bench
# prints a nonzero headline before ending the round.
set -x
cd "$(dirname "$0")/.."
time python bench.py --budget_s 14400 --cap_scale 12 2>bench_close.stderr | tail -1 | tee bench_close.json
python - << 'PY'
import json
d = json.load(open("bench_close.json"))
assert d["value"] > 0, f"headline is zero: {d}"
print("headline OK:", d["value"], d["unit"], "vs_baseline", d["vs_baseline"])
PY
time JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
