"""The bench image gate's metric tiers (bench.py::diff_metrics).

The gate separates expected backend speckle from miscompiles; these
tests pin the three calibrated regimes with synthetic frame pairs:

* scattered subpixel-leaf winner flips (config 7's measured profile:
  ~1% of pixels, diffs up to 0.62) must pass the CELL tier,
* a contiguous regional miscompile (the 748-px / 0.48 class from the
  repo's own bug history) must fail it,
* a uniform small bias passes cells but is caught by the pixel-count
  guard main() applies in cell mode.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")
import bench  # noqa: E402


def _metrics(a, b):
    import jax.numpy as jnp
    npix, nbig, maxd, ncell, maxc = bench.diff_metrics(
        jnp.asarray(a), jnp.asarray(b))
    return (int(npix), int(nbig), float(maxd), int(ncell), float(maxc))


@pytest.fixture(scope="module")
def base():
    return np.random.default_rng(0).uniform(
        0.0, 1.0, (270, 480, 3)).astype(np.float32)


def test_scattered_flips_pass_cell_tier(base):
    rng = np.random.default_rng(1)
    b = base.copy()
    idx = rng.choice(270 * 480, 985, replace=False)
    ys, xs = idx // 480, idx % 480
    b[ys, xs] = np.clip(
        base[ys, xs] + rng.uniform(-0.62, 0.62, (985, 3)).astype(np.float32),
        0.0, 1.0)
    npix, nbig, _, ncell, maxc = _metrics(base, b)
    assert npix >= 900          # the pixel tiers DO fire on this profile
    assert nbig > 16            # (that is why they cannot gate config 7)
    assert ncell <= 8           # ...but the cell tier does not
    assert maxc < 0.05


def test_regional_miscompile_fails_cell_tier(base):
    b = base.copy()
    b[100:120, 200:238] = np.clip(base[100:120, 200:238] + 0.48, 0.0, 1.0)
    _, _, _, ncell, maxc = _metrics(base, b)
    assert ncell > 8
    assert maxc > 0.05


def test_uniform_bias_caught_by_pixel_guard(base):
    b = np.clip(base + 0.04, 0.0, 1.0)
    npix, _, _, ncell, _ = _metrics(base, b)
    assert ncell <= 8                       # cells admit it...
    assert npix > (270 * 480) // 10         # ...the 10% pixel guard does not


def test_visit_gate_catches_injection(monkeypatch):
    """The walk-drift gate (VERDICT r4 item 7): a +10% visit injection
    on a keyed-in config MUST trip; within-tolerance noise must not."""
    monkeypatch.setitem(bench.EXPECTED_VISITS, 99, 20000)
    assert bench.visit_gate(99, 20000) is None
    assert bench.visit_gate(99, int(20000 * 1.04)) is None   # noise band
    assert bench.visit_gate(99, int(20000 * 1.10)) is not None
    assert bench.visit_gate(99, int(20000 * 0.90)) is not None
    assert bench.visit_gate(98, 10**9) is None   # un-keyed config: no gate


def test_identical_frames_are_clean(base):
    npix, nbig, maxd, ncell, maxc = _metrics(base, base)
    assert (npix, nbig, ncell) == (0, 0, 0)
    assert maxd == 0.0 and maxc == 0.0
