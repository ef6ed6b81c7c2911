"""Host-side native render path (ctypes bindings for native/warp.cpp).

Same algorithm and semantics as render.stabilize, executed as a
multithreaded C++ kernel on the host.  Used when pulling rendered pixels
off the device is more expensive than pulling the tiny displacement fields
(see api.MeshFlowStabilizer render routing).
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from meshflow_tpu.config import MeshFlowConfig
from meshflow_tpu.io.native import load_library


def available() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "mf_render")


def _bind(lib):
    if getattr(lib, "_mf_render_bound", False):
        return
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.mf_render.argtypes = [
        u8p, f32p, f32p,
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long,
        u8p, u8p, i32p,
    ]
    lib.mf_crop_resize.argtypes = [
        u8p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        u8p,
    ]
    if hasattr(lib, "mf_crop_edges"):
        lib.mf_crop_edges.argtypes = [
            f32p, f32p,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long,
            i32p,
        ]
        lib.mf_render_cropped.argtypes = [
            u8p, f32p, f32p,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long,
            u8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            u8p,
        ]
    lib._mf_render_bound = True


def streaming_available() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "mf_render_cropped")


def crop_edges_host(
    unstab_disp: np.ndarray,
    stab_disp: np.ndarray,
    frame_height: int,
    frame_width: int,
    config: MeshFlowConfig,
) -> np.ndarray:
    """Global crop rect [left, top, right, bottom] from displacement fields
    alone (identical arithmetic to mf_render's per-frame edge scan)."""
    lib = load_library()
    _bind(lib)
    du = np.ascontiguousarray(unstab_disp, np.float32)
    ds = np.ascontiguousarray(stab_disp, np.float32)
    f = du.shape[0]
    edges = np.empty((f, 4), np.int32)
    lib.mf_crop_edges(
        du.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f, frame_height, frame_width,
        config.mesh_row_count, config.mesh_col_count,
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return np.array(
        [edges[:, 0].max(), edges[:, 1].max(), edges[:, 2].min(), edges[:, 3].min()],
        np.int32,
    )


def render_cropped_host(
    frames: np.ndarray,
    unstab_disp: np.ndarray,
    stab_disp: np.ndarray,
    crop: np.ndarray,
    config: MeshFlowConfig,
) -> np.ndarray:
    """Fused warp + crop + stretch for a chunk under a known global crop.

    Byte-identical to render_stabilized_host followed by crop_frames_host
    (stage-1 uint8 rounding preserved), at ~crop-area cost."""
    lib = load_library()
    _bind(lib)
    frames = np.ascontiguousarray(frames, np.uint8)
    du = np.ascontiguousarray(unstab_disp, np.float32)
    ds = np.ascontiguousarray(stab_disp, np.float32)
    f, h, w = frames.shape[:3]
    out = np.empty_like(frames)
    border = np.asarray(config.color_outside_image_area_bgr, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mf_render_cropped(
        frames.ctypes.data_as(u8p),
        du.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f, h, w, config.mesh_row_count, config.mesh_col_count,
        border.ctypes.data_as(u8p),
        int(crop[0]), int(crop[1]), int(crop[2]), int(crop[3]),
        out.ctypes.data_as(u8p),
    )
    return out


def render_stabilized_host(
    frames: np.ndarray,
    unstab_disp: np.ndarray,
    stab_disp: np.ndarray,
    config: MeshFlowConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """(F, H, W, 3) uint8 + displacement fields -> (stabilized, crop).

    crop is [left, top, right, bottom] (the intersection over frames,
    /root/reference/meshflowstabilizer.py:1102-1106).
    """
    lib = load_library()
    _bind(lib)
    frames = np.ascontiguousarray(frames, np.uint8)
    du = np.ascontiguousarray(unstab_disp, np.float32)
    ds = np.ascontiguousarray(stab_disp, np.float32)
    f, h, w = frames.shape[:3]
    out = np.empty_like(frames)
    edges = np.empty((f, 4), np.int32)
    border = np.asarray(config.color_outside_image_area_bgr, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mf_render(
        frames.ctypes.data_as(u8p),
        du.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f, h, w, config.mesh_row_count, config.mesh_col_count,
        border.ctypes.data_as(u8p),
        out.ctypes.data_as(u8p),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    crop = np.array(
        [edges[:, 0].max(), edges[:, 1].max(), edges[:, 2].min(), edges[:, 3].min()],
        np.int32,
    )
    return out, crop


def crop_frames_host(
    stabilized: np.ndarray, crop: np.ndarray
) -> np.ndarray:
    """Crop+stretch back to full resolution (cv2.resize semantics)."""
    lib = load_library()
    _bind(lib)
    stabilized = np.ascontiguousarray(stabilized, np.uint8)
    f, h, w = stabilized.shape[:3]
    out = np.empty_like(stabilized)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mf_crop_resize(
        stabilized.ctypes.data_as(u8p), f, h, w,
        int(crop[0]), int(crop[1]), int(crop[2]), int(crop[3]),
        out.ctypes.data_as(u8p),
    )
    return out
