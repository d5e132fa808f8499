"""Backend selection override.

Some environments force a platform programmatically (e.g. an ``axon`` TPU
plugin registered from ``sitecustomize``), which outranks the
``JAX_PLATFORMS`` env var. ``MRGCN_PLATFORM=cpu`` (or ``tpu``/``axon``)
re-asserts the choice through ``jax.config`` before the first backend use.
Call :func:`apply_platform_override` before any jax computation.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def apply_platform_override() -> None:
    platform = os.environ.get("MRGCN_PLATFORM")
    if not platform:
        return
    import jax
    jax.config.update("jax_platforms", platform)
    logger.info("Platform override: %s", platform)
