"""Self-contained media codecs for the multimodal operators.

The multimodal kernels (``operators/multimodal.py``) need to decode real
bytes inside Arrow-batched ``mapInPandas`` stages. Heavyweight codec
libraries (Pillow, ffmpeg, soundfile) are optional at runtime, so this
module provides:

* a pure-stdlib **PNG** codec (``zlib`` inflate + numpy unfiltering) for
  8-bit gray / RGB / RGBA non-interlaced images — the exact subset a
  deterministic training-data fixture needs, really decoded pixel by pixel;
* a **WAV** codec over the stdlib ``wave`` module (16-bit PCM);
* a trivial length-prefixed frame container (**SPKV**) standing in for a
  video: a magic header followed by ``[u32 length][png bytes]`` frames —
  which lets the frame-sampling operator exercise real per-frame decode
  without ffmpeg;
* ``decode_image`` dispatch that prefers Pillow when importable (arbitrary
  formats) and falls back to the builtin PNG path.

Everything here is driver-free: codecs are called per Arrow batch on
executors; no function touches SparkContext.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
SPKV_MAGIC = b"SPKV"

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE_BY_CHANNELS = {1: 0, 3: 2, 4: 6}


def _chunk(kind: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + kind
        + payload
        + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode uint8 pixels (H×W gray, H×W×3 RGB, or H×W×4 RGBA) as PNG.

    Rows use filter type 0 (None); simplicity over ratio — fixtures and
    round-trip tests don't need adaptive filtering.
    """
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE_BY_CHANNELS:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w, ch = arr.shape
    color_type = _COLOR_TYPE_BY_CHANNELS[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced gray/RGB/RGBA PNG to uint8 pixels
    (H×W for gray, H×W×C otherwise). Full filter support (types 0-4)."""
    if not buf.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    idat = bytearray()
    width = height = channels = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        kind = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if kind == b"IHDR":
            width, height, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS_BY_COLOR_TYPE:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color_type={color_type}, "
                    f"interlace={interlace}); install Pillow for general formats"
                )
            channels = _CHANNELS_BY_COLOR_TYPE[color_type]
        elif kind == b"IDAT":
            idat += payload
        elif kind == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + width * channels
    if len(raw) != height * stride:
        raise ValueError("corrupt PNG (payload size mismatch)")
    rows = raw.reshape(height, stride)
    bpp = channels
    out = np.empty((height, width * channels), dtype=np.uint8)
    zero_row = np.zeros(width * channels, dtype=np.uint8)
    for y in range(height):
        ftype = rows[y, 0]
        cur = rows[y, 1:].copy()
        prev = out[y - 1] if y else zero_row
        if ftype == 0:
            recon = cur
        elif ftype == 1:  # Sub
            recon = cur
            for x in range(bpp, len(recon)):
                recon[x] = (int(recon[x]) + int(recon[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            recon = (cur.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            recon = cur
            for x in range(len(recon)):
                left = int(recon[x - bpp]) if x >= bpp else 0
                recon[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            recon = cur
            for x in range(len(recon)):
                left = int(recon[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                up_left = int(prev[x - bpp]) if x >= bpp else 0
                p = left + up - up_left
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - up_left)
                pred = left if pa <= pb and pa <= pc else up if pb <= pc else up_left
                recon[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
    pixels = out.reshape(height, width, channels)
    return pixels[:, :, 0] if channels == 1 else pixels


def decode_image(buf: bytes) -> np.ndarray:
    """Decode any image: Pillow when available (all formats), else the
    builtin PNG path. Returns uint8 H×W (gray) or H×W×C."""
    try:  # pragma: no cover - Pillow not in this environment
        from PIL import Image

        with Image.open(io.BytesIO(buf)) as im:
            return np.asarray(im)
    except ImportError:
        return decode_png(buf)


def luma(pixels: np.ndarray) -> np.ndarray:
    """Rec.601 luma as float64: gray passes through, RGB(A) is weighted."""
    if pixels.ndim == 2:
        return pixels.astype(np.float64)
    rgb = pixels[:, :, :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy fancy indexing (no libraries)."""
    h, w = pixels.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return pixels[np.ix_(ys, xs)]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """16-bit mono PCM WAV from an int16 sample array (stdlib ``wave``)."""
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples [n] or [n, ch], sample_rate) from WAV bytes."""
    import wave

    with wave.open(io.BytesIO(buf), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported without soundfile")
        sr = wf.getframerate()
        n = wf.getnframes()
        data = np.frombuffer(wf.readframes(n), dtype="<i2")
        ch = wf.getnchannels()
    return (data.reshape(-1, ch) if ch > 1 else data), sr


def encode_frames(frames: list[bytes]) -> bytes:
    """Pack encoded frames into the SPKV container:
    magic + u32 count + per-frame [u32 length][bytes]."""
    out = bytearray(SPKV_MAGIC)
    out += struct.pack(">I", len(frames))
    for f in frames:
        out += struct.pack(">I", len(f))
        out += f
    return bytes(out)


def iter_frames(buf: bytes):
    """Yield (frame_idx, frame_bytes) from an SPKV container."""
    if not buf.startswith(SPKV_MAGIC):
        raise ValueError("not an SPKV frame container")
    (count,) = struct.unpack(">I", buf[4:8])
    pos = 8
    for i in range(count):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        pos += 4
        yield i, buf[pos : pos + length]
        pos += length
