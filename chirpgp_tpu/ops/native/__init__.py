"""Native (C++) ops: lazy build + load of the shared library.

The library is compiled once with g++ into this directory and cached;
rebuilds happen only when the source is newer than the binary.
"""

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_nls.cpp")
_LIB = os.path.join(_DIR, "libfast_nls.so")


def build_fast_nls(force: bool = False) -> str:
    """Compile the fast-NLS library if needed; returns the .so path."""
    if force or not os.path.exists(_LIB) \
            or os.path.getmtime(_SRC) > os.path.getmtime(_LIB):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load_fast_nls() -> ctypes.CDLL:
    """Load (building if necessary) and type the fast-NLS library with the
    reference ctypes contract (``tetralith/jobs/fastf0nls.py:27-41``)."""
    lib = ctypes.cdll.LoadLibrary(build_fast_nls())
    c_void_p, c_double, c_int = ctypes.c_void_p, ctypes.c_double, ctypes.c_int
    lib.single_pitch_new.argtypes = [c_int, c_int, c_int, c_void_p]
    lib.single_pitch_new.restype = c_void_p
    lib.single_pitch_est.argtypes = [c_void_p, c_void_p, c_double, c_double]
    lib.single_pitch_est.restype = c_double
    lib.single_pitch_est_fast.argtypes = [c_void_p, c_void_p, c_double,
                                          c_double]
    lib.single_pitch_est_fast.restype = c_double
    lib.single_pitch_model_order.argtypes = [c_void_p]
    lib.single_pitch_model_order.restype = c_int
    lib.single_pitch_del.argtypes = [c_void_p]
    lib.single_pitch_del.restype = None
    return lib
