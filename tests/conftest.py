"""Test harness config: force CPU with 8 fake devices for sharding tests.

Must run before the first ``import jax`` anywhere in the test session.
The session may come up with ``JAX_PLATFORMS=axon`` (a real TPU chip);
tests always run on the fake CPU mesh for determinism and for the
8-device sharding suite.  Set ``LDA_TESTS_KEEP_PLATFORM=1`` to opt out.
"""

import os

if not os.environ.get("LDA_TESTS_KEEP_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # Some environments ship a jax plugin that re-appends its own platform to
    # jax_platforms at import time, overriding the env var — pin it back.
    import jax

    jax.config.update("jax_platforms", "cpu")
