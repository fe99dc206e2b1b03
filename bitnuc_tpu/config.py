"""Backend configuration.

The reference selects SIMD vs scalar back-ends at runtime per call
(src/utils/packing/mod.rs:81-110) and offers a `nosimd` compile-time escape
hatch (Cargo.toml:13-14). The TPU analog is a trace-time choice between the
pure-XLA lowering (always correct, runs on any JAX backend) and Pallas kernels
(the throughput path on real TPUs). Both produce bit-identical outputs;
parity is enforced directly by tests rather than by a CI matrix.
"""

from __future__ import annotations

import contextlib
import os

_VALID = ("auto", "xla", "pallas")
_backend = os.environ.get("BITNUC_BACKEND", "auto")
if _backend not in _VALID:
    raise ValueError(f"BITNUC_BACKEND must be one of {_VALID}, got {_backend!r}")


def get_backend() -> str:
    return _backend


def set_backend(name: str) -> None:
    global _backend
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}, got {name!r}")
    _backend = name


@contextlib.contextmanager
def backend(name: str):
    """Temporarily select a backend: with bitnuc_tpu.config.backend('xla'): ..."""
    old = get_backend()
    set_backend(name)
    try:
        yield
    finally:
        set_backend(old)


def use_pallas() -> bool:
    """True when kernels should lower via Pallas for the current backend.

    'auto' resolves to Pallas on TPU, XLA elsewhere (mirrors the reference's
    runtime CPU-feature dispatch, src/utils/packing/mod.rs:83-93).
    """
    b = get_backend()
    if b == "pallas":
        return True
    if b == "xla":
        return False
    import jax

    try:
        # only TPU has the Mosaic kernels; any other backend (CPU, GPU)
        # takes the always-correct XLA lowering under 'auto'
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_interpret() -> bool:
    """True when Pallas kernels must run in interpret mode (off-TPU)."""
    import jax

    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def host_cpu_tag() -> str:
    """Fingerprint of the host CPU feature set, for compile-cache dirs.

    This container migrates across physical hosts, and XLA:CPU's AOT
    loader accepts cached executables compiled on a DIFFERENT machine with
    only a warning — then computes wrong results (observed: scatter-add
    double counting, flaky as cache hits raced recompiles). Keying cache
    directories by the CPU flags makes a migration start a fresh cache
    instead of loading poisoned binaries.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    return hashlib.sha1(line).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(path: str = "/tmp/bitnuc_jax_cache") -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Compiles in this environment go through a remote service that is slow
    and occasionally hangs; caching every executable makes repeat runs
    (benchmarks, driver entry checks) independent of it. The directory is
    suffixed with host_cpu_tag() so host migrations can't serve stale
    XLA:CPU AOT binaries built for another machine's features.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", f"{path}_{host_cpu_tag()}")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
