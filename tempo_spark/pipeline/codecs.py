"""Pure-stdlib media codecs backing the real (non-fake) multimodal paths.

No external codec libraries exist in this environment, but several formats
are simple enough to parse with ``struct`` + ``numpy`` alone:

- **PPM/PGM** (netpbm P5/P6 binary): full pixel decode + encode.
- **BMP** (BITMAPINFOHEADER, uncompressed 24/32-bit BI_RGB): full pixel
  decode (bottom-up and top-down) + 24-bit encode.
- **WAV** (RIFF, PCM int8/int16/int32 and IEEE float32): full sample decode
  + PCM16 encode, duration/RMS features.
- **AVI** (RIFF, uncompressed BI_RGB 24-bit DIB frames): full frame decode
  + encode — the same chunk walk as WAV for the container, the same raster
  math as BMP for each frame. Compressed streams (MJPG/cinepak/…) need
  real codec libs and raise.
- **PNG / GIF / JPEG**: header-only dimension+channel sniffing (pixel
  decode needs zlib-filter/huffman machinery out of scope here —
  ``pixels`` comes back None and callers treat these as metadata-only).

These run INSIDE Arrow-batched ``mapInPandas`` kernels
(:mod:`tempo_spark.pipeline.multimodal`) — per-row Python is the only
option for byte-level media parsing, and the batch boundary is where Spark
hands us the rows anyway.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class DecodedImage:
    format: str
    width: int
    height: int
    n_channels: int
    #: row-major top-down interleaved samples (uint8), None when the format
    #: is sniffed header-only (png/gif/jpeg)
    pixels: Optional[bytes]


# --------------------------------------------------------------------- netpbm


def _pnm_tokens(b: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from a netpbm header,
    honoring ``#`` comments; returns (values, offset-after-last-token)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        vals.append(int(b[i:j]))
        i = j
    return vals, i


def decode_ppm(b: bytes) -> DecodedImage:
    """P6 (RGB) / P5 (gray) binary netpbm, maxval ≤ 255."""
    magic = b[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm image: {magic!r}")
    channels = 3 if magic == b"P6" else 1
    (w, h, maxval), off = _pnm_tokens(b, 3, 2)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    off += 1  # exactly one whitespace byte separates header from raster
    need = w * h * channels
    raster = b[off : off + need]
    if len(raster) < need:
        raise ValueError("truncated netpbm raster")
    return DecodedImage("ppm" if channels == 3 else "pgm", w, h, channels, raster)


def encode_ppm(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    if channels not in (1, 3):
        raise ValueError("netpbm supports 1 (P5) or 3 (P6) channels")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode("ascii") + pixels


# ----------------------------------------------------------------------- BMP


def decode_bmp(b: bytes) -> DecodedImage:
    """Uncompressed BI_RGB BMP with a BITMAPINFOHEADER (24/32 bpp).
    Returns RGB samples top-down regardless of the file's row order."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = stride * h
    raster = np.frombuffer(b, dtype=np.uint8, count=need, offset=data_off)
    rows = raster.reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if not top_down:
        rows = rows[::-1]
    rgb = rows[:, :, 2::-1]  # BGR(A) storage → RGB
    return DecodedImage("bmp", w, h, 3, np.ascontiguousarray(rgb).tobytes())


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit bottom-up BI_RGB BMP from top-down RGB samples."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x3")
    stride = (width * 3 + 3) & ~3
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    bgr = img[::-1, :, ::-1]  # bottom-up, RGB→BGR
    padded = np.zeros((height, stride), dtype=np.uint8)
    padded[:, : width * 3] = bgr.reshape(height, width * 3)
    raster = padded.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + info + raster


# ------------------------------------------------------------ header sniffers


def sniff_image(b: bytes) -> Optional[DecodedImage]:
    """Best-effort decode: full pixels for netpbm/BMP, header-only dims for
    PNG/GIF/JPEG, None when the bytes match no known signature."""
    if len(b) < 8:
        return None
    if b[:2] in (b"P5", b"P6"):
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is always first: length(4) 'IHDR' W(4) H(4) depth color ...
        w, h = struct.unpack_from(">II", b, 16)
        color_type = b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return DecodedImage("png", w, h, channels, None)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", b, 6)
        return DecodedImage("gif", w, h, 3, None)
    if b[:2] == b"\xff\xd8":
        # scan markers for a start-of-frame (SOFn) segment
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack_from(">H", b, i + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack_from(">HH", b, i + 5)
                channels = b[i + 9]
                return DecodedImage("jpeg", w, h, channels, None)
            i += 2 + seg_len
        return None
    return None


# --------------------------------------------------------------------- resize


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int,
    new_width: int, new_height: int,
) -> bytes:
    """Nearest-neighbor resample of interleaved row-major samples (the
    pandas/numpy analogue of PIL's NEAREST — deterministic, no filtering)."""
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(new_height) * height) // new_height
    xs = (np.arange(new_width) * width) // new_width
    return np.ascontiguousarray(img[ys][:, xs]).tobytes()


def fit_geometry(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving shrink so max(w, h) ≤ max_dim (integer arithmetic —
    replicable in any engine; never upscales)."""
    if w <= 0 or h <= 0:
        return (0, 0)
    if max(w, h) <= max_dim:
        return (w, h)
    if w >= h:
        return (max_dim, max(1, (h * max_dim) // w))
    return (max(1, (w * max_dim) // h), max_dim)


# ----------------------------------------------------------------------- WAV


@dataclass
class DecodedAudio:
    sample_rate: int
    n_channels: int
    n_frames: int
    #: float64 samples normalized to [-1, 1], shape (frames, channels)
    samples: np.ndarray

    @property
    def duration_ms(self) -> int:
        return (self.n_frames * 1000) // self.sample_rate if self.sample_rate else 0

    @property
    def rms(self) -> float:
        if self.samples.size == 0:
            return 0.0
        return float(np.sqrt(np.mean(np.square(self.samples))))


def decode_wav(b: bytes) -> DecodedAudio:
    """RIFF/WAVE chunk walk (robust to extra chunks like LIST/fact):
    PCM 8/16/32-bit int and IEEE float32."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack_from("<I", b, i + 4)[0]
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate, _, _, bits = fmt
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: treat as PCM layout
        audio_fmt = 1
    if audio_fmt == 1:
        dtype, scale = {
            8: (np.uint8, 128.0),
            16: (np.int16, 32768.0),
            32: (np.int32, 2147483648.0),
        }.get(bits, (None, None))
        if dtype is None:
            raise ValueError(f"unsupported PCM bit depth {bits}")
        raw = np.frombuffer(data, dtype=dtype)
        samples = (
            (raw.astype(np.float64) - 128.0) / 128.0
            if bits == 8
            else raw.astype(np.float64) / scale
        )
    elif audio_fmt == 3 and bits == 32:
        samples = np.frombuffer(data, dtype=np.float32).astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt}/{bits}bit")
    n_frames = len(samples) // max(n_channels, 1)
    samples = samples[: n_frames * n_channels].reshape(n_frames, n_channels)
    return DecodedAudio(sample_rate, n_channels, n_frames, samples)


# ----------------------------------------------------------------------- AVI


@dataclass
class DecodedVideo:
    width: int
    height: int
    #: frame period in microseconds (avih dwMicroSecPerFrame)
    micro_sec_per_frame: int
    #: top-down interleaved RGB24 rasters, one per stored frame
    frames: list[bytes]

    @property
    def n_frames(self) -> int:
        return len(self.frames)


def _riff_chunks(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run —
    the WAV walker generalized to nested LISTs (an AVI is LISTs all the
    way down)."""
    i = start
    while i + 8 <= end:
        cid = b[i : i + 4]
        size = struct.unpack_from("<I", b, i + 4)[0]
        yield cid, i + 8, size
        i += 8 + size + (size & 1)  # chunks pad to even offsets


def decode_avi(b: bytes) -> DecodedVideo:
    """RIFF/'AVI ' with uncompressed 24-bit BI_RGB video: 'hdrl' gives the
    frame period + geometry, 'movi' holds one raw bottom-up DIB raster per
    '00db'/'00dc' chunk (same padded-row layout as a BMP body). Returns
    frames as top-down RGB24. Compressed fourccs raise ValueError."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    mspf = width = height = None
    bpp, compression = 24, 0
    rasters: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal mspf, width, height, bpp, compression
        for cid, off, size in _riff_chunks(b, start, end):
            if cid == b"LIST":
                walk(off + 4, off + size)  # skip the 4-byte list type
            elif cid == b"avih" and size >= 40:
                mspf = struct.unpack_from("<I", b, off)[0]
                width, height = struct.unpack_from("<II", b, off + 32)
            elif cid == b"strf" and size >= 40:
                # BITMAPINFOHEADER of the (single) video stream
                compression = struct.unpack_from("<I", b, off + 16)[0]
                bpp = struct.unpack_from("<H", b, off + 14)[0]
            elif cid[2:4] in (b"db", b"dc"):
                rasters.append(b[off : off + size])

    walk(12, len(b))
    if mspf is None or not width or not height:
        raise ValueError("AVI missing avih header")
    if compression != 0 or bpp != 24:
        raise ValueError(
            f"unsupported AVI video (bpp={bpp}, compression={compression:#x}) — "
            "only uncompressed BI_RGB 24-bit decodes without codec libraries"
        )
    stride = (width * 3 + 3) & ~3
    frames = []
    for raster in rasters:
        if len(raster) < stride * height:
            raise ValueError("truncated AVI frame")
        rows = np.frombuffer(raster, dtype=np.uint8, count=stride * height)
        rows = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
        frames.append(np.ascontiguousarray(rows[::-1, :, ::-1]).tobytes())
    return DecodedVideo(width, height, mspf, frames)


def encode_avi(
    frames: list[bytes], width: int, height: int, micro_sec_per_frame: int = 40000
) -> bytes:
    """Minimal uncompressed-RGB24 AVI writer for tests/entries. ``frames``
    are top-down RGB rasters (w·h·3 bytes each); stored bottom-up BGR with
    4-byte row padding, per the DIB convention decode_avi expects."""
    stride = (width * 3 + 3) & ~3
    movi_body = b"movi"
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError(f"frame buffer {len(f)} != {width}x{height}x3")
        img = np.frombuffer(f, dtype=np.uint8).reshape(height, width, 3)
        padded = np.zeros((height, stride), dtype=np.uint8)
        padded[:, : width * 3] = img[::-1, :, ::-1].reshape(height, width * 3)
        raster = padded.tobytes()
        movi_body += b"00db" + struct.pack("<I", len(raster)) + raster
        if len(raster) & 1:
            movi_body += b"\x00"
    avih = struct.pack(
        "<14I",
        micro_sec_per_frame, 0, 0, 0, len(frames), 0, 1, stride * height,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1,
                                        max(1, 1_000_000 // max(micro_sec_per_frame, 1)),
                                        0, len(frames), stride * height, 0, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height, 0, 0, 0, 0
    )
    strl = b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih \
        + b"LIST" + struct.pack("<I", len(strl)) + strl
    body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int, n_channels: int = 1
) -> bytes:
    """Minimal PCM16 WAV writer for tests/entries. ``samples`` are int16
    values (interleaved when multi-channel)."""
    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
