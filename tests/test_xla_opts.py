"""tpu_compiler_options: env / explicit-arg precedence and backend gating.

The scoped-VMEM budget is a libtpu flag that must travel via
jax.jit(compiler_options=...) (XLA_FLAGS aborts client flag parsing on
unknown flags — measured).  These tests pin the selection logic; the
backend gate is exercised by monkeypatching jax.default_backend since CI
has no TPU.
"""

import jax
import pytest

from mulut_tpu.utils.xla_opts import (
    enable_compilation_cache,
    tpu_compiler_options,
)


def test_none_on_cpu_backend(monkeypatch):
    monkeypatch.setenv("MULUT_SCOPED_VMEM_KIB", "65536")
    # conftest forces the CPU platform — the option must NOT leak to a
    # backend that would reject it at compile time
    assert jax.default_backend() == "cpu"
    assert tpu_compiler_options() is None


def test_explicit_arg_wins_over_env(monkeypatch):
    monkeypatch.setenv("MULUT_SCOPED_VMEM_KIB", "1234")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    opts = tpu_compiler_options(scoped_vmem_kib=65536)
    assert opts == {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def test_env_fallback_and_extra(monkeypatch):
    monkeypatch.delenv("MULUT_SCOPED_VMEM_KIB", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert tpu_compiler_options() is None
    monkeypatch.setenv("MULUT_SCOPED_VMEM_KIB", "98304")
    opts = tpu_compiler_options({"other": "1"})
    assert opts == {"other": "1",
                    "xla_tpu_scoped_vmem_limit_kib": "98304"}


def test_enable_compilation_cache(tmp_path, monkeypatch):
    # kill switch
    monkeypatch.setenv("MULUT_COMPILE_CACHE", "0")
    assert enable_compilation_cache(str(tmp_path)) is False
    # explicit path wins when the env var is unset
    monkeypatch.delenv("MULUT_COMPILE_CACHE")
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert enable_compilation_cache(str(tmp_path)) is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        # env var overrides the argument
        monkeypatch.setenv("MULUT_COMPILE_CACHE", str(tmp_path / "env"))
        assert enable_compilation_cache(str(tmp_path)) is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "env")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
