"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (SURVEY.md §4 'Implication for the rebuild').

Note: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and the
plugin wins over os.environ mutation, so the override must go through
jax.config before any backend is initialized.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: tiny-model compiles dominate test wall-clock.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "mesh: compile-heavy multi-device/train tests; quick pass = "
        "pytest -m 'not mesh' (full suite is compile-bound on 1-core hosts)",
    )
    config.addinivalue_line(
        "markers",
        "heavy: the few largest single-program compiles (full sampler /"
        " I3D / two-model injection); a cold sub-10-min tier on a 1-core"
        " host = pytest -m 'not mesh and not heavy'",
    )
