"""Persistent XLA compilation cache for the CLIs.

Every CLI invocation otherwise pays a fresh 1-4 minute compile of the model
graph (verify finding). One call at driver startup makes repeat invocations
near-instant. Cache location: $TPUREG_CACHE_DIR or ~/.cache/tpureg-xla,
suffixed with a host-CPU fingerprint: XLA:CPU AOT results embed the compile
machine's feature set but the cache key does NOT include it, so entries
written on one host silently load on another with mismatched features and
produce subtly different numerics (observed: a parity golden drifting to
1.5e-4 after a VM migration, with cpu_aot_loader warning "machine type used
for XLA:CPU compilation doesn't match"). Keying the directory by the host's
CPU flags makes a migrated VM start a fresh cache instead.
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["enable_compilation_cache", "host_cpu_key"]


def host_cpu_key() -> str:
    """Short fingerprint of the host CPU's identity + feature flags.

    The feature-flags line alone is NOT enough: LLVM derives machine
    features (e.g. +prefer-no-scatter/+prefer-no-gather scheduling
    preferences) from the CPU *model*, so two hosts with identical cpuinfo
    flags can still produce AOT entries the other refuses cleanly — or
    worse, loads with drifted numerics. Hash the vendor/family/model/
    stepping/model-name lines plus flags.
    """
    keys = ("vendor_id", "cpu family", "model", "stepping", "model name",
            "flags")
    try:
        parts = {}
        with open("/proc/cpuinfo") as f:
            for line in f:
                name = line.split(":", 1)[0].strip()
                if name in keys and name not in parts:
                    parts[name] = line.strip()
        if parts:
            blob = "\n".join(parts[k] for k in keys if k in parts)
            return hashlib.sha1(blob.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:  # already configured (e.g. by the test conftest) — keep it
        return current
    path = path or os.environ.get(
        "TPUREG_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "tpureg-xla"),
    )
    path = os.path.join(path, host_cpu_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
