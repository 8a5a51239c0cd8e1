"""Test configuration: force CPU platform with 8 virtual devices.

This is the fake-backend substitute for a real TPU pod (SURVEY.md §4):
sharding/collective tests run on an 8-device host mesh, everything else runs
single-device CPU. Must run before jax is imported anywhere.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
# NOTE: SRTPU_CS_OFF_TPU=1 (interpret-mode CS kernels on CPU) is NOT set
# globally: the zoo now defaults use_pallas='cs' and interpret-mode
# kernels are ~100x slower than the XLA fallback, so only the dedicated
# kernel test modules opt in (see the `cs_kernels_interpret` autouse
# fixtures in test_ops_cs/test_bn_cs/test_ddbpn_cs/test_parallel/
# test_convert_layout). Everything else exercises the off-TPU XLA
# fallback — the same path CPU users get in production. Clear any
# inherited value (the pre-round-4 suite exported it globally) so a
# stale shell export can't drag the whole fast lane through interpret
# kernels.
os.environ.pop('SRTPU_CS_OFF_TPU', None)
# hermetic suite: the on-disk decoded-image cache (srtpu/data/sources.py)
# must not write into ~/.cache from tests; cache-specific tests opt in
# with a tmp dir via monkeypatch
os.environ['SRTPU_DECODE_CACHE'] = '0'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and forces
# JAX_PLATFORMS=axon; the env var alone is merged to "axon,cpu", which still
# routes every op through the TPU tunnel. jax.config wins over both.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
