"""Honor JAX platform env vars even when the plugin ignores them.

The axon TPU plugin pre-reads/ignores ``JAX_PLATFORMS`` and (depending on
version) ``JAX_PLATFORM_NAME``, so exporting them is not enough to keep a
process off a broken or wedged TPU tunnel — backend init can then block
for tens of minutes with no exception to catch. ``jax.config.update``
reliably forces the platform as long as it runs before the first backend
use; entry scripts call :func:`apply_platform_env` first thing.
"""

import os


def apply_platform_env() -> str | None:
    """If JAX_PLATFORM_NAME / JAX_PLATFORMS is set, pin jax to it via
    jax.config (must run before any jax backend use). Returns the platform
    applied, or None if the env leaves the default selection alone."""
    plat = os.environ.get("JAX_PLATFORM_NAME") or os.environ.get(
        "JAX_PLATFORMS"
    )
    if not plat:
        return None
    import jax

    jax.config.update("jax_platforms", plat)
    return plat
