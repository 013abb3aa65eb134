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
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
# tests compile hundreds of tiny graphs on (often) a single host core —
# codegen quality is irrelevant at these shapes, compile latency is the
# suite's wall clock.  -O0 + no expensive LLVM passes cuts ~30% off the
# cold-cache suite (numerics unchanged: optimization level ≠ fast-math).
if '--xla_backend_optimization_level' not in flags:
    flags += (' --xla_backend_optimization_level=0'
              ' --xla_llvm_disable_expensive_passes=true')
os.environ['XLA_FLAGS'] = flags
os.environ.setdefault('JAX_ENABLE_X64', '0')

# the axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon; the env
# vars above are then too late — force the platform AND the persistent
# compile cache through the config API too (without the latter, every suite
# run recompiles everything: ~12 min cold vs ~4 min cached on this 1-vCPU
# box).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.1)
assert jax.devices()[0].platform == 'cpu'
assert jax.device_count() == 8, jax.devices()

# build the native C++ libraries once per machine if any is missing —
# a fresh checkout otherwise fails the tests that exercise them (e.g.
# test_preprocess's native-FLAC fallback) before anyone runs `make`.
_NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
if os.path.isfile(os.path.join(_NATIVE, 'Makefile')):
    import glob as _glob
    _srcs = _glob.glob(os.path.join(_NATIVE, '*.cpp'))
    _missing = [s for s in _srcs if not os.path.isfile(
        os.path.join(_NATIVE, 'lib' + os.path.basename(s)[:-4] + '.so'))]
    if _missing:
        import subprocess as _sp
        _sp.run(['make', '-C', _NATIVE, '-j4'], check=False,
                stdout=_sp.DEVNULL, stderr=_sp.DEVNULL)
