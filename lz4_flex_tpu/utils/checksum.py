"""xxHash32 selection: native C++ fast path with pure-Python fallback."""

from __future__ import annotations

try:
    from .. import native as _native

    _HAVE_NATIVE = _native.available()
except Exception:  # pragma: no cover
    _native = None
    _HAVE_NATIVE = False

from ..spec.xxhash32 import XxHash32 as _PyXxHash32
from ..spec.xxhash32 import xxh32 as _py_xxh32

if _HAVE_NATIVE:
    xxh32 = _native.xxh32
    XxHash32 = _native.NativeXxHash32
else:  # pragma: no cover
    xxh32 = _py_xxh32
    XxHash32 = _PyXxHash32
