"""Persistent XLA compile-cache helpers.

The repo directory persists across rounds but the HOST MACHINE may change
(different CPU features). XLA:CPU caches AOT results specialized to the
compiling machine's ISA (AVX512/AMX feature set); loading them on a different
host fails noisily and can SIGILL. Key the cache directory by a fingerprint
of the platform + CPU flags so each machine gets its own namespace.
"""
from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    bits = [platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    bits.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def enable_compile_cache(root: str = "/root/repo/.jax_cache") -> str:
    """Point jax at a machine-specific persistent compile cache dir."""
    import jax

    path = os.path.join(root, machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
