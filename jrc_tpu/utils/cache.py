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
        import jaxlib

        bits.append(jaxlib.__version__)
    except Exception:
        pass
    # The flags line alone is NOT enough: two hosts with identical cpuinfo
    # flags can still make LLVM infer different target features (model-
    # dependent tuning like prefer-no-scatter), and AOT results then fail to
    # load / risk SIGILL. Key on the model line and every flag/bug line.
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "model name", "microcode", "bugs")):
                    bits.append(line.strip())
                if line.strip() == "" and len(bits) > 3:
                    break  # first core only
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def default_cache_root() -> str:
    """Cache root: ``JRC_JAX_CACHE`` env override, else ``.jax_cache`` next
    to the package's repo checkout (portable — no hardcoded machine path)."""
    env = os.environ.get("JRC_JAX_CACHE")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo, ".jax_cache")


def enable_compile_cache(root: str | None = None) -> str:
    """Point jax at a machine-specific persistent compile cache dir."""
    import jax

    path = os.path.join(root or default_cache_root(), machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
