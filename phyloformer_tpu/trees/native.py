"""ctypes bindings to the native C++ tree toolkit (``native/``).

Provides the FastME-equivalent tree builder (BME/NJ + balanced NNI/SPR) and
phylocompare-equivalent tree metrics.  The shared library is built on demand
with ``make -C native`` (g++ is part of the environment); see
``native/src/pftree.{h,cc}``.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent.parent
_NATIVE_DIR = _REPO / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libpftree.so"

_lib = None


class NativeUnavailable(RuntimeError):
    pass


def build_native(force: bool = False) -> pathlib.Path:
    """Compile the native library; returns its path.

    Always invokes ``make`` (incremental: a no-op when sources are
    unchanged, a rebuild when they changed — an exists-check here once let
    stale binaries mask source edits), under an exclusive file lock so
    concurrent first-use callers (server handler threads, fastme-dir
    workers, multi-host pf-infer processes on a shared filesystem) cannot
    race two compilers onto the same output files."""
    del force  # kept for API compatibility; make is always invoked
    build_dir = _NATIVE_DIR / "build"
    try:
        build_dir.mkdir(parents=True, exist_ok=True)
        import fcntl

        with open(build_dir / ".build.lock", "w") as lock_fh:
            fcntl.flock(lock_fh, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                text=True,
                timeout=300,
            )
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired, OSError) as err:
        if _LIB_PATH.exists():  # e.g. read-only install with a prebuilt lib
            return _LIB_PATH
        detail = getattr(err, "stderr", "") or str(err)
        raise NativeUnavailable(f"could not build native toolkit: {detail}") from err
    return _LIB_PATH


def get_lib():
    global _lib
    if _lib is None:
        path = build_native()
        lib = ctypes.CDLL(str(path))
        lib.pftree_build.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.pftree_build.restype = ctypes.c_int
        lib.pftree_compare.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.pftree_compare.restype = ctypes.c_int
        lib.pftree_pauplin_length.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.pftree_pauplin_length.restype = ctypes.c_double
        _lib = lib
    return _lib


def build_tree_from_phylip(
    phylip_text: str, method: str = "bme", nni: bool = True, spr: bool = True
) -> str:
    """Distance matrix (PHYLIP text) -> newick tree string."""
    lib = get_lib()
    buf = ctypes.create_string_buffer(1 << 20)
    rc = lib.pftree_build(
        phylip_text.encode(), method.encode(), int(nni), int(spr), buf, len(buf)
    )
    if rc != 0:
        raise RuntimeError(f"pftree_build failed ({rc}): {buf.value.decode(errors='replace')}")
    return buf.value.decode()


def build_tree(
    matrix: np.ndarray,
    ids: Sequence[str],
    method: str = "bme",
    nni: bool = True,
    spr: bool = True,
) -> str:
    from ..data.phylip import matrix_to_phylip

    return build_tree_from_phylip(matrix_to_phylip(matrix, ids), method, nni, spr)


@dataclass
class TreeComparison:
    rf: float
    norm_rf: float
    weighted_rf: float
    kf: float  # phylocompare kf_score convention (internal bipartitions)
    n_common: int


def compare_newick(
    nwk_a: str, nwk_b: str, include_external: bool = False
) -> TreeComparison:
    lib = get_lib()
    out = (ctypes.c_double * 5)()
    rc = lib.pftree_compare(nwk_a.encode(), nwk_b.encode(), int(include_external), out)
    if rc != 0:
        raise RuntimeError("pftree_compare failed (leaf sets differ or parse error)")
    return TreeComparison(
        rf=out[0], norm_rf=out[1], weighted_rf=out[2], kf=out[3], n_common=int(out[4])
    )


def pauplin_length(phylip_text: str, nwk: str) -> float:
    lib = get_lib()
    return float(lib.pftree_pauplin_length(phylip_text.encode(), nwk.encode()))
