"""Native (C++) runtime components, loaded via ctypes.

Build with `make -C panagram_tpu/native`; everything degrades gracefully to
pure-Python implementations when the shared library is absent.
"""

from . import bgzf_native  # noqa: F401
