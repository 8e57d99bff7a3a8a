"""On-chip test tier (VERDICT r3 item 6): the production path.

``tests/`` hard-forces the virtual 8-device CPU mesh with x64 — the
right default for logic tests, but it cannot catch the r3 class of
bugs: f32 precision drift, Mosaic/Pallas lane-layout mistakes, compiled
(non-interpret) kernel behavior. This tier runs a SMALL suite on the
real TPU chip with the production dtype policy (f32 device math, f64
inference scalars, compiled Pallas kernels).

One-command run (requires a TPU backend; skips itself otherwise):

    python -m pytest tests_tpu -q

First run compiles ~6 XLA/Mosaic programs (~40-130 s each through a
tunneled chip); the persistent compile cache (utils.config.setup) makes
subsequent runs fast.
"""

import pytest


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session", autouse=True)
def tpu_session():
    from gppe_tpu.utils import config as cfg
    cfg.setup()
    if not cfg.is_tpu():
        pytest.skip("tests_tpu requires a TPU backend (axon/tpu)",
                    allow_module_level=False)
