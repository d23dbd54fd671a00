"""Shared malformed-input guard for the pure-Python codecs.

The validation tier's contract is that an undecodable payload raises
``ValueError`` (or ``NotImplementedError`` for a named unsupported
feature) and becomes a violation row — never a raw internal exception
(``zlib.error`` from a truncated IDAT, ``IndexError`` from a short
header, ``StopIteration`` from an exhausted Huffman stream) that would
kill the whole Arrow batch with an unrelated traceback.  The per-round
corruption fuzz (tests/test_codec_fuzz.py) holds every decoder to it.
"""
from __future__ import annotations

import functools
import struct
import zlib

#: exception types that mean "the input bytes are malformed", not "bug"
_MALFORMED = (IndexError, KeyError, StopIteration, struct.error,
              OverflowError, UnicodeDecodeError, EOFError, zlib.error,
              MemoryError)


def malformed_input_guard(codec: str):
    """Decorator: translate internal malformed-input failures to ValueError."""
    def wrap(fn):
        @functools.wraps(fn)
        def guarded(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except _MALFORMED as ex:
                raise ValueError(
                    f"corrupt {codec} payload: "
                    f"{type(ex).__name__}: {ex}") from ex
        return guarded
    return wrap
