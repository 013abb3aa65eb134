"""Utility namespace: metrics, text normalization, native bindings.

(Convenience re-exports; the implementations live in the sibling modules.)
"""

import contextlib

import numpy as _np

from edgedict_tpu.metrics import cer, compute_measures, wer  # noqa: F401


@contextlib.contextmanager
def numpy_seed(seed, *extra):
    """Scoped numpy RNG seeding (the fairseq helper the reference carries
    at rnnt/data_utils.py:113-128) — makes host-side data randomness
    reproducible without clobbering global state."""
    if seed is None:
        yield
        return
    for e in extra:
        seed = (seed * 16777619) ^ int(e)
    state = _np.random.get_state()
    _np.random.seed(seed & 0x7fffffff)
    try:
        yield
    finally:
        _np.random.set_state(state)
from edgedict_tpu.text import (  # noqa: F401
    collapse_whitespace, english_cleaners, normalize_numbers,
    number_to_words, ordinal_to_words)
from edgedict_tpu import native  # noqa: F401
