"""Persistent XLA compilation cache wiring.

The reference pays no compile cost (torch eager, CUDA kernels are
prebuilt); our XLA programs compile for minutes — the SAM vit_h encoder
alone is ~380 s on a multi-core host and >18 min on a 1-CPU terminal.
JAX's persistent compilation cache amortizes that across processes: the
first compile of a (program, compile-options, backend) triple writes a
serialized executable under ``jax_compilation_cache_dir``; later runs —
including fresh processes, e.g. every driver bench invocation — load it
in seconds.  Verified working through the axon remote-compile path
(entries appear and hit; round 4 measurement).

Enabled automatically on ``import protosam_tpu``.  Knobs:

* ``PTPU_COMPILE_CACHE`` — cache directory (default
  ``~/.cache/protosam_tpu/xla_cache``).
* ``PTPU_NO_COMPILE_CACHE=1`` — disable entirely.
"""

import os

_enabled = False


def enable_compile_cache() -> str | None:
    """Idempotently enable the persistent compile cache.

    Returns the cache directory, or None when disabled/unavailable.
    Entries are keyed by program + compile options + backend, so CPU-mesh
    test runs and TPU runs coexist in one directory.
    """
    global _enabled
    if os.environ.get("PTPU_NO_COMPILE_CACHE") == "1":
        return None
    cache_dir = os.environ.get(
        "PTPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "protosam_tpu",
                     "xla_cache"))
    if _enabled:
        return cache_dir
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # only slow compiles are worth the disk round-trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
        return cache_dir
    except Exception:
        return None
