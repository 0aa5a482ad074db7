"""ctypes bindings for the native C++ rasterizer (native/rasterizer.cpp).

Builds on demand with `make -C native` (g++ only, no external deps).
Used by the offline preprocessing tool; semantics are cross-validated
against the on-device XLA rasterizer in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def load_native(build: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so_path = os.path.join(_native_dir(), "libctrlv_native.so")
    if not os.path.exists(so_path):
        if not build:
            return None
        try:
            subprocess.run(
                ["make", "-C", _native_dir()], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(so_path)
    f32 = ctypes.POINTER(ctypes.c_float)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.rasterize_frame_native.argtypes = [
        f32, ctypes.c_int, ctypes.c_int, f32, f32, u8, f32, f32,
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ]
    lib.rasterize_trajectory_native.argtypes = [
        f32, ctypes.c_int, ctypes.c_int, f32, u8, f32, f32,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
    ]
    lib.rasterize_frame_3dstyle_native.argtypes = [
        f32, ctypes.c_int, ctypes.c_int, f32, u8, f32, f32,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float,
    ]
    _LIB = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rasterize_frame_native(
    corners: np.ndarray,  # (N, 8, 2)
    bbox2d: np.ndarray,  # (N, 4)
    valid: np.ndarray,  # (N,) bool
    type_color: np.ndarray,  # (N, 3)
    track_color: np.ndarray,  # (N, 3)
    height: int,
    width: int,
    background: Optional[np.ndarray] = None,
    plot_2d_bbox: bool = True,
    alpha_2dbbox: float = 0.75,
) -> np.ndarray:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable (g++/make missing?)")
    img = (
        np.ascontiguousarray(background, np.float32).copy()
        if background is not None
        else np.zeros((height, width, 3), np.float32)
    )
    n = corners.shape[0]
    lib.rasterize_frame_native(
        _fptr(img), height, width,
        _fptr(np.ascontiguousarray(corners, np.float32)),
        _fptr(np.ascontiguousarray(bbox2d, np.float32)),
        np.ascontiguousarray(valid, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        _fptr(np.ascontiguousarray(type_color, np.float32)),
        _fptr(np.ascontiguousarray(track_color, np.float32)),
        n, int(plot_2d_bbox), float(alpha_2dbbox),
    )
    return img


def rasterize_frame_3dstyle_native(
    corners: np.ndarray,  # (N, 8, 2) canvas coords
    valid: np.ndarray,  # (N,) bool
    outline_color: np.ndarray,  # (N, 3)
    fill_color: np.ndarray,  # (N, 3)
    height: int,
    width: int,
    show_3d: bool = False,
    show_2d: bool = True,
    alpha: float = 0.75,
    background: Optional[np.ndarray] = None,
    hw2: Optional[float] = None,
    hw1: Optional[float] = None,
) -> np.ndarray:
    """nuScenes my_render_3d_style frame via the C++ rasterizer.

    Semantics documented at ops/rasterize.py::rasterize_frame_3dstyle_np
    (bit-matched in tests/test_nuscenes_render_parity.py)."""
    from ..ops.rasterize import _HW_3DSTYLE_1, _HW_3DSTYLE_2

    lib = load_native()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable (g++/make missing?)")
    img = (
        np.ascontiguousarray(background, np.float32).copy()
        if background is not None
        else np.zeros((height, width, 3), np.float32)
    )
    lib.rasterize_frame_3dstyle_native(
        _fptr(img), height, width,
        _fptr(np.ascontiguousarray(corners, np.float32)),
        np.ascontiguousarray(valid, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        _fptr(np.ascontiguousarray(outline_color, np.float32)),
        _fptr(np.ascontiguousarray(fill_color, np.float32)),
        corners.shape[0], int(show_3d), int(show_2d), float(alpha),
        float(_HW_3DSTYLE_2 if hw2 is None else hw2),
        float(_HW_3DSTYLE_1 if hw1 is None else hw1),
    )
    return img


def rasterize_trajectory_native(
    centers: np.ndarray,
    valid: np.ndarray,
    type_color: np.ndarray,
    track_color: np.ndarray,
    height: int,
    width: int,
    outer_radius: float = 20.0,
    inner_radius: float = 10.0,
) -> np.ndarray:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable")
    img = np.zeros((height, width, 3), np.float32)
    lib.rasterize_trajectory_native(
        _fptr(img), height, width,
        _fptr(np.ascontiguousarray(centers, np.float32)),
        np.ascontiguousarray(valid, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        _fptr(np.ascontiguousarray(type_color, np.float32)),
        _fptr(np.ascontiguousarray(track_color, np.float32)),
        centers.shape[0], float(outer_radius), float(inner_radius),
    )
    return img
