"""Process-wide sampler compiler options (utils/compile_options.py).

The sweep tool (tools/sweep_compiler_options.py) proves flags out on the
real chip; these tests cover the plumbing only: get/set semantics and that
the default (unset) path leaves the pipelines on plain jax.jit behavior.
"""

import jax
import jax.numpy as jnp

from ctrlv_tpu.utils.compile_options import (
    get_compiler_options,
    set_compiler_options,
)


def test_get_set_roundtrip():
    assert get_compiler_options() is None  # default: XLA defaults
    try:
        set_compiler_options({"xla_tpu_scoped_vmem_limit_kib": "65536"})
        got = get_compiler_options()
        assert got == {"xla_tpu_scoped_vmem_limit_kib": "65536"}
        got["extra"] = "x"  # returned dict is a copy
        assert get_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "65536"
        }
        set_compiler_options({})
        assert get_compiler_options() is None
        set_compiler_options(None)
        assert get_compiler_options() is None
    finally:
        set_compiler_options(None)


def test_jit_accepts_none_options():
    # The pipelines pass compiler_options=get_compiler_options() straight to
    # jax.jit; None must mean "exactly the default jit path".
    fn = jax.jit(lambda x: x * 2, compiler_options=get_compiler_options())
    assert fn(jnp.ones((4,))).sum() == 8.0
