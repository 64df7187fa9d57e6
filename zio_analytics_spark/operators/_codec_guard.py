"""Corrupt-payload guard for the pure-Python codec tier.

Every decoder in operators/multimodal.py and operators/jpeg.py documents
the same contract: corrupt or unsupported payloads raise ``ValueError``,
which the quarantine lanes (multimodal.decode_quarantine, the streaming
decode entry) catch and route to an error row instead of killing the task.

Byte-walking parsers, however, can surface corruption as ``struct.error``
(an offset read past the buffer — e.g. a flipped TIFF IFD entry count
sends the tag loop out of range) or ``IndexError`` (direct indexing past
``len(b)``) before any explicit bounds check fires. The round-9 ADVICE
finding verified three such escapes; a single flipped byte would then fail
the task ×4 retries and kill the stage — exactly what the quarantine
contract promises cannot happen.

:func:`corrupt_guard` converts those two corruption signatures to the
documented ``ValueError`` AT THE DECODER SEAM, so every caller (batch
quarantine, streaming quarantine, pixel stats, the catalog oracles' meta
walks) inherits the fix. Genuine logic bugs (TypeError, KeyError,
AttributeError, …) still propagate loudly — the guard narrows exactly to
the exceptions that out-of-range reads of attacker-shaped bytes produce.
"""

from __future__ import annotations

import functools
import struct

__all__ = ["corrupt_guard"]


def corrupt_guard(fn):
    """Decorator: re-raise struct.error/IndexError as the documented
    ``ValueError`` corrupt-payload signal (chained, so triage sees the
    original frame).

    Narrowing (round-10 ADVICE): the reclassification only applies when
    the call actually carried a bytes-like payload in its positional
    args — the signature every guarded decoder shares. An IndexError
    raised by a decoder invoked WITHOUT payload bytes (a genuine logic
    bug in non-parse code) propagates loudly instead of being silently
    routed to quarantine."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, IndexError) as e:
            if not any(
                isinstance(a, (bytes, bytearray, memoryview)) for a in args
            ):
                raise
            raise ValueError(
                f"corrupt payload ({fn.__name__}): {type(e).__name__}: {e}"
            ) from e

    return wrapped
