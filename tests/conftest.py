"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4 implication e).
Must run before jax is imported anywhere.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
# persistent XLA compile cache: repeat suite runs skip most compiles
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/edgedict_tpu_xla_cpu'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '2')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

# the axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon; the env var
# alone is then too late — force the platform through the config API too.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu'
assert jax.device_count() == 8, jax.devices()
