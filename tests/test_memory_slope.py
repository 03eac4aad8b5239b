"""Machine-check of the constant-memory claim: compiled peak TEMP memory is
~flat in flow depth (slope < 5 MB/flow) for EVERY memory_efficient family.

The reference's whole point is activation memory constant in the number of
flows (``/root/reference/README.md:50-57``: 4951 MB at 12 flows where naive
autograd did not fit), and its trick covers every family that sets
``memory_efficient`` (``model/efficient_modules.py:99-279``).  ``bench.py``
emits the full flows series at the flagship configs every round; this test
regression-proofs the property per family at a smaller config so a slope
regression fails CI, not just the bench report.

XLA's CPU buffer assignment reports temp=0, so the compile-only measurement
needs the TPU backend; the test probes for it in a killable subprocess and
skips (never fails) when the chip is absent or held by another process.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import jax
jax.devices()
print("ok")
"""

_MEASURE = """
import json, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tools!r})
from memory_check import peak_temp_bytes, total_flows
from constant_memory_waveglow_tpu.ops import set_default_precision
set_default_precision("highest")
arch = {arch!r}
out = {{}}
# this backend reports temp_size_in_bytes == 0 (the test then skips
# rather than measures) once a graph's footprint crosses ~70 MB — probed
# empirically: ch64 flows 3/4/5 report ~6 MB, flows 6/7 report 0, ch128
# reports 0 everywhere — so the series stays below that; melglow uses a
# narrow channel count so its O(channels^2*radix) predictor params (and
# the params-sized stacked gradients any training step carries) stay far
# below the activation slope under test.  The flagship-scale series in
# bench.py reports real temps (multi-GB graphs are unaffected).
chans = 16 if arch == "melglow" else 64
for flows in (3, 5):
    temp, total = peak_temp_bytes(flows=flows, channels=chans, depth=4,
                                  batch=4, segment=8192,
                                  memory_efficient=True, arch=arch)
    out[total_flows(arch, flows)] = temp
print("RESULT " + json.dumps(out))
"""


def _run(code, timeout):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    return subprocess.run([sys.executable, "-c", code], timeout=timeout,
                          capture_output=True, text=True, env=env)


@pytest.mark.parametrize("arch", ["waveglow", "melglow", "mr_waveglow",
                                  "waveglow_rm"])
def test_peak_temp_flat_in_flow_depth(arch):
    try:
        r = _run(_PROBE, timeout=120)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend init timed out (chip absent or busy)")
    if r.returncode != 0 or "ok" not in r.stdout:
        pytest.skip(f"no usable TPU backend: {r.stderr[-200:]}")

    try:
        r = _run(_MEASURE.format(repo=REPO, tools=os.path.join(REPO, "tools"),
                                 arch=arch),
                 timeout=1800)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU compile timed out (chip busy)")
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")][-1]
    temps = {int(k): v for k, v in json.loads(line[7:]).items()}
    if any(v in (None, 0) for v in temps.values()):
        pytest.skip(f"backend reports no temp sizes: {temps}")
    flows = sorted(temps)
    slope_mb = (temps[flows[-1]] - temps[flows[0]]) / (
        flows[-1] - flows[0]) / 2**20
    assert slope_mb < 5.0, (temps, slope_mb)
