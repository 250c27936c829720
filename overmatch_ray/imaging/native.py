"""On-demand compiled fast path for the JPEG entropy layer.

Builds ``_native.c`` (same directory) with the system C compiler into a
per-source-hash cached shared object under ``/tmp/overmatch_native/`` and
exposes it via ctypes. Strictly optional: if no compiler exists, the build
fails, or ``OVERMATCH_NO_NATIVE=1`` is set, ``LIB`` is ``None`` and callers
use the numpy reference implementations in ``codec.py`` — which produce
bit-identical outputs (the C kernels are integer-exact reimplementations of
the same algorithms; parity is property-tested in
``tests/test_native_parity.py``).

Multi-node story: each node compiles once on first import (atomic rename
publishes the .so; concurrent workers race benignly — both compiles produce
the same file). Ray actor pools inherit the cached build for free.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "_native.c")
_CACHE_DIR = os.path.join(tempfile.gettempdir(), "overmatch_native")


def _build() -> "ctypes.CDLL | None":
    if os.environ.get("OVERMATCH_NO_NATIVE"):
        return None
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so = os.path.join(_CACHE_DIR, f"_native-{tag}.so")
        if not os.path.exists(so):
            os.makedirs(_CACHE_DIR, exist_ok=True)
            tmp = so + f".build-{os.getpid()}"
            cc = os.environ.get("CC", "cc")
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-std=c99", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)  # atomic publish; losers overwrite same bytes
        lib = ctypes.CDLL(so)
    except Exception:
        return None
    c = ctypes
    lib.om_entropy_decode.restype = c.c_long
    lib.om_entropy_decode.argtypes = [
        c.c_void_p,  # bits
        c.c_void_p,  # seg_start int64[nseg+1]
        c.c_int,     # nseg
        c.c_long,    # mcus
        c.c_long,    # ri
        c.c_int,     # ncomp
        c.c_void_p,  # comp_dc int64[ncomp]
        c.c_void_p,  # comp_ac int64[ncomp]
        c.c_void_p,  # sym int16[ntab*65536]
        c.c_void_p,  # len uint8[ntab*65536]
        c.c_void_p,  # out int32[mcus*ncomp*64]
    ]
    lib.om_pack_codes.restype = c.c_long
    lib.om_pack_codes.argtypes = [
        c.c_void_p,  # codes int64[nsym]
        c.c_void_p,  # lens uint8[nsym]
        c.c_void_p,  # segs int32[nsym]
        c.c_long,    # nsym
        c.c_int,     # nseg
        c.c_void_p,  # trailer uint16[nseg]
        c.c_void_p,  # seg_end int64[nseg]
        c.c_void_p,  # out uint8[...]
    ]
    lib.om_lcs_pairs.restype = None
    lib.om_lcs_pairs.argtypes = [
        c.c_void_p,  # codes uint32[total]
        c.c_void_p,  # a_off int64[n]
        c.c_void_p,  # b_off int64[n]
        c.c_void_p,  # la int64[n]
        c.c_void_p,  # lb int64[n]
        c.c_long,    # n
        c.c_void_p,  # out int64[n]
    ]
    return lib


LIB = _build()
