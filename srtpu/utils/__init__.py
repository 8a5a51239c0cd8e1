"""Utility subpackage: logging, image ops, runtime helpers."""

import logging
import os

_logger = logging.getLogger(__name__)


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (first compiles of the
    train/eval programs take 20-60s on TPU; cached reruns are instant).
    Disable with SRTPU_NO_COMPILE_CACHE=1."""
    if os.environ.get('SRTPU_NO_COMPILE_CACHE') == '1':
        return
    import jax
    cache_dir = path or os.environ.get(
        'SRTPU_COMPILE_CACHE', os.path.expanduser('~/.cache/srtpu/xla'))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
        _logger.debug('compilation cache at %s', cache_dir)
    except Exception:  # cache is an optimization, never fatal
        _logger.debug('could not enable compilation cache', exc_info=True)
