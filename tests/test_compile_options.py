"""Process-wide sampler compiler options (utils/compile_options.py).

The sweep tool (tools/sweep_compiler_options.py) proves flags out on the
real chip; these tests cover the plumbing only: get/set/reset semantics,
the TPU-default gating on backend AND measured device kind, and that the
default (unset) path leaves the pipelines on plain jax.jit behavior.
"""

import jax
import jax.numpy as jnp
import pytest

from ctrlv_tpu.utils import compile_options as co
from ctrlv_tpu.utils.compile_options import (
    get_compiler_options,
    reset_compiler_options,
    set_compiler_options,
)


@pytest.fixture(autouse=True)
def _restore_defaults():
    yield
    reset_compiler_options()


def _expected_default():
    # Backend-aware: on the v5e chip the measured default applies; on the
    # CPU conftest backend (and any unmeasured TPU generation) it's None.
    if jax.default_backend() == "tpu" and any(
        k in jax.devices()[0].device_kind.lower() for k in co._MEASURED_DEVICE_KINDS
    ):
        return dict(co._TPU_DEFAULTS)
    return None


def test_get_set_roundtrip():
    assert get_compiler_options() == _expected_default()
    set_compiler_options({"xla_tpu_scoped_vmem_limit_kib": "65536"})
    got = get_compiler_options()
    assert got == {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    got["extra"] = "x"  # returned dict is a copy
    assert get_compiler_options() == {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    set_compiler_options({})
    assert get_compiler_options() is None
    set_compiler_options(None)
    assert get_compiler_options() is None


def test_explicit_none_latches_until_reset(monkeypatch):
    # set(None) pins XLA defaults even where the measured default applies...
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(co, "_device_kind", lambda: "tpu v5 lite")
    set_compiler_options(None)
    assert get_compiler_options() is None
    # ...and reset restores the automatic measured default.
    reset_compiler_options()
    assert get_compiler_options() == co._TPU_DEFAULTS


def test_tpu_default_gated_on_device_kind(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(co, "_device_kind", lambda: "tpu v5 lite")
    assert get_compiler_options() == co._TPU_DEFAULTS
    # Unmeasured TPU generations keep XLA defaults (the knob is sensitive:
    # 64/96 MiB regressed on v5e; other chips have different VMEM sizes).
    monkeypatch.setattr(co, "_device_kind", lambda: "tpu v4")
    assert get_compiler_options() is None
    monkeypatch.setattr(co, "_device_kind", lambda: "tpu v6 lite")
    assert get_compiler_options() is None  # v6e unmeasured too


def test_cpu_backend_has_no_default(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert get_compiler_options() is None


def test_jit_accepts_none_options(monkeypatch):
    # The pipelines pass compiler_options=get_compiler_options() straight to
    # jax.jit; None must mean "exactly the default jit path".
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    fn = jax.jit(lambda x: x * 2, compiler_options=get_compiler_options())
    assert fn(jnp.ones((4,))).sum() == 8.0
