"""Utility namespace: metrics, text normalization, native bindings.

(Convenience re-exports; the implementations live in the sibling modules.)
"""

from edgedict_tpu.metrics import cer, wer  # noqa: F401
from edgedict_tpu.text import (  # noqa: F401
    collapse_whitespace, english_cleaners, normalize_numbers,
    number_to_words, ordinal_to_words)
from edgedict_tpu import native  # noqa: F401
