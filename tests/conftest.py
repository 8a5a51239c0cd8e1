"""Test configuration: force CPU platform with 8 virtual devices.

This is the fake-backend substitute for a real TPU pod (SURVEY.md §4):
sharding/collective tests run on an 8-device host mesh, everything else runs
single-device CPU. Must run before jax is imported anywhere.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
# exercise the CS Pallas kernels in interpret mode (product code keeps
# them TPU-only; CPU users get the XLA fallback instead)
os.environ['SRTPU_CS_OFF_TPU'] = '1'
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
