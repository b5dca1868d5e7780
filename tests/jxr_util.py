"""ctypes surface of the in-repo JPEG XR codec (native/jxr.cpp).

The codec backs CZI JPEG-XR subblocks (the compression Zeiss ZEN emits by
default; the reference reads it through OpenSlide+jxrlib, reference
src/stamp/preprocessing/__init__.py:43-56).  The encoder here exists to
build fixtures: no third-party JPEG XR implementation is available in this
zero-egress image, so round-trip + sanitizer fuzzing are the executable
evidence (see native/jxr.cpp's header for the full caveat).
"""

import ctypes

import numpy as np


def load_jxr():
    """The native library with the jxr_* symbols configured, or None."""
    from stamp_tpu.preprocessing.wsi import _load_native

    lib = _load_native()
    if lib is None or not hasattr(lib, "wsi_jxr_encode"):
        return None
    lib.wsi_jxr_encode.restype = ctypes.c_int64
    lib.wsi_jxr_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.wsi_jxr_decode.restype = ctypes.c_int32
    lib.wsi_jxr_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.wsi_jxr_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.wsi_jxr_selftest.restype = ctypes.c_int32
    return lib


def _last_error(lib) -> str:
    lib.wsi_last_error.restype = ctypes.c_char_p
    return (lib.wsi_last_error() or b"").decode()


def jxr_encode(
    img: np.ndarray,
    *,
    internal_clr: int = 3,
    bands: int = 0,
    overlap: int = 1,
    qp: int = 0,
    trim: int = 0,
) -> bytes:
    """Encode RGB8 (h,w,3 u8), Gray8 (h,w u8) or Gray16 (h,w u16)."""
    lib = load_jxr()
    assert lib is not None, "native reader not built"
    arr = np.ascontiguousarray(img)
    if arr.ndim == 3 and arr.dtype == np.uint8:
        kind = 0
    elif arr.ndim == 2 and arr.dtype == np.uint8:
        kind = 1
    elif arr.ndim == 2 and arr.dtype == np.uint16:
        kind = 2
    else:
        raise ValueError(f"unsupported input {arr.dtype}/{arr.shape}")
    h, w = arr.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.wsi_jxr_encode(
        arr.ctypes.data_as(ctypes.c_void_p),
        w,
        h,
        kind,
        internal_clr,
        bands,
        overlap,
        qp,
        trim,
        ctypes.byref(out),
    )
    assert n > 0, f"jxr encode failed: {_last_error(lib)}"
    data = ctypes.string_at(out, n)
    lib.wsi_jxr_free(out)
    return data


def jxr_decode(data: bytes) -> np.ndarray:
    """Decode a .jxr payload to packed RGB8 (h, w, 3)."""
    lib = load_jxr()
    assert lib is not None, "native reader not built"
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.wsi_jxr_decode(data, len(data), ctypes.byref(out), ctypes.byref(w),
                            ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"jxr decode failed: {_last_error(lib)}")
    buf = ctypes.string_at(out, w.value * h.value * 3)
    lib.wsi_jxr_free(out)
    return np.frombuffer(buf, np.uint8).reshape(h.value, w.value, 3)


def jxr_decode_error(data: bytes) -> str:
    """The named error a payload fails with ('' if it decodes)."""
    lib = load_jxr()
    assert lib is not None, "native reader not built"
    try:
        jxr_decode(data)
        return ""
    except ValueError as e:
        return str(e)
