"""Test configuration: force JAX onto the host CPU with 8 virtual devices so
sharding/pjit paths are exercised without TPU hardware.

Note: on axon-tunneled TPU machines a sitecustomize module registers the
'axon' backend and calls jax.config.update('jax_platforms', 'axon,cpu') at
interpreter start, which overrides the JAX_PLATFORMS environment variable —
so the env var alone is not enough; the config must be re-updated after jax
imports."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'           # for child processes
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
# Children (in-process CLI runs fork no JAX, but keep it consistent):
# an empty pool-IPs var makes the axon sitecustomize skip registration.
os.environ['PALLAS_AXON_POOL_IPS'] = ''

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
