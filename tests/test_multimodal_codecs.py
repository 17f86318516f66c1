"""Real (stdlib) multimodal codec paths: netpbm/BMP pixel decode, PNG/GIF/
JPEG header sniffing, nearest-neighbor resize + PPM re-encode, RIFF/WAV
audio features — both the pure codec functions and the Spark mapInPandas
kernels wired to them."""

import struct

import numpy as np
import pytest

from tempo_spark.pipeline import multimodal
from tempo_spark.pipeline.codecs import (
    DecodedImage,
    decode_avi,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_ppm,
    encode_wav_pcm16,
    fit_geometry,
    resize_nearest,
    sniff_image,
)


def checker_pixels(w: int, h: int, channels: int = 3) -> bytes:
    return bytes(
        ((x + y) % 2) * 255
        for y in range(h)
        for x in range(w)
        for _ in range(channels)
    )


class TestImageCodecs:
    def test_ppm_round_trip(self):
        px = checker_pixels(6, 4)
        img = decode_ppm(encode_ppm(6, 4, px))
        assert (img.width, img.height, img.n_channels) == (6, 4, 3)
        assert img.pixels == px

    def test_ppm_comment_and_p5(self):
        px = bytes(range(12))
        assert decode_ppm(b"P6\n# cmt\n2 2\n255\n" + px).pixels == px
        gray = decode_ppm(encode_ppm(3, 4, bytes(12), channels=1))
        assert (gray.n_channels, gray.format) == (1, "pgm")

    def test_ppm_truncated_raises(self):
        with pytest.raises(ValueError):
            decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 10)

    def test_bmp_round_trip_both_orders(self):
        px = bytes([(i * 11) % 256 for i in range(5 * 3 * 3)])
        b = encode_bmp(5, 3, px)
        img = decode_bmp(b)
        assert (img.width, img.height, img.n_channels) == (5, 3, 3)
        assert img.pixels == px  # bottom-up storage round-trips to top-down

    def test_bmp_32bpp_and_unsupported(self):
        # hand-build a 1x1 top-down 32bpp BMP, pixel BGRA = 01 02 03 04
        info = struct.pack("<IiiHHIIiiII", 40, 1, -1, 1, 32, 0, 4, 0, 0, 0, 0)
        b = struct.pack("<2sIHHI", b"BM", 14 + 40 + 4, 0, 0, 54) + info + bytes(
            [1, 2, 3, 4]
        )
        img = decode_bmp(b)
        assert (img.width, img.height) == (1, 1)
        assert img.pixels == bytes([3, 2, 1])  # RGB from BGR
        with pytest.raises(ValueError):
            decode_bmp(b"BM" + b"\x00" * 60)  # bpp 0

    def test_sniff_headers(self):
        png = (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big")
            + b"IHDR"
            + (320).to_bytes(4, "big")
            + (200).to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])
        )
        p = sniff_image(png)
        assert (p.format, p.width, p.height, p.n_channels) == ("png", 320, 200, 3)
        gif = b"GIF89a" + struct.pack("<HH", 40, 30) + b"\x00" * 10
        assert (sniff_image(gif).width, sniff_image(gif).height) == (40, 30)
        jpeg = (
            b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc2" + struct.pack(">H", 17) + bytes([8])
            + struct.pack(">HH", 90, 60) + bytes([3]) + b"\x00" * 10
        )
        j = sniff_image(jpeg)
        assert (j.format, j.width, j.height) == ("jpeg", 60, 90)
        assert sniff_image(b"not an image at all") is None
        assert sniff_image(b"") is None

    def test_resize_nearest_exact(self):
        # 2x2 checker down to 1x1 picks the top-left sample
        px = checker_pixels(2, 2)
        assert resize_nearest(px, 2, 2, 3, 1, 1) == px[:3]
        # upscale indexing never reads out of bounds
        up = resize_nearest(px, 2, 2, 3, 5, 5)
        assert len(up) == 5 * 5 * 3

    def test_fit_geometry(self):
        assert fit_geometry(1000, 500, 256) == (256, 128)
        assert fit_geometry(500, 1000, 256) == (128, 256)
        assert fit_geometry(100, 100, 256) == (100, 100)
        assert fit_geometry(5000, 2, 256) == (256, 1)  # floor clamps to ≥1
        assert fit_geometry(0, 10, 256) == (0, 0)


class TestWavCodec:
    def test_pcm16_round_trip(self):
        s = np.array([0, 16384, -16384, 32767, -32768, 0, 0, 0], dtype=np.int16)
        a = decode_wav(encode_wav_pcm16(s, 8000))
        assert (a.sample_rate, a.n_channels, a.n_frames) == (8000, 1, 8)
        assert a.duration_ms == 1
        exp = float(np.sqrt(np.mean((s.astype(np.float64) / 32768.0) ** 2)))
        assert a.rms == pytest.approx(exp, abs=1e-12)

    def test_stereo_and_float32(self):
        st = decode_wav(
            encode_wav_pcm16(np.array([1, 2, 3, 4], dtype=np.int16), 44100, 2)
        )
        assert (st.n_frames, st.n_channels) == (2, 2)
        pcm = np.array([0.5, -0.5], dtype=np.float32).tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
        b = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )
        assert decode_wav(b).rms == pytest.approx(0.5, abs=1e-12)

    def test_extra_chunks_tolerated(self):
        base = encode_wav_pcm16(np.array([100, -100], dtype=np.int16), 8000)
        # splice a LIST chunk between fmt and data
        fmt_end = 12 + 8 + 16
        spliced = (
            base[:fmt_end] + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + base[fmt_end:]
        )
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        assert decode_wav(spliced).n_frames == 2

    def test_rejects_garbage(self):
        for bad in (b"", b"RIFFxxxxWAVE", b"RIFF\x00\x00\x00\x00JUNK"):
            with pytest.raises(ValueError):
                decode_wav(bad)


class TestSparkRealPaths:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            (1, bytearray(encode_ppm(400, 100, checker_pixels(400, 100)))),
            (2, bytearray(encode_bmp(8, 6, checker_pixels(8, 6)))),
            (3, bytearray(b"utterly not an image")),
            (4, None),
        ]
        return spark.createDataFrame(rows, "media_id long, content binary")

    def test_real_decode(self, media):
        got = {
            r.media_id: (r.width, r.height, r.n_channels)
            for r in multimodal.decode_images(media).collect()
        }
        assert got[1] == (400, 100, 3)
        assert got[2] == (8, 6, 3)
        assert got[3] == (None, None, None)
        assert got[4] == (None, None, None)

    def test_real_resize_rewrites_payload(self, media):
        out = {
            r.media_id: r
            for r in multimodal.resize_images(media, max_dim=50).collect()
        }
        big = out[1]
        assert (big.resized_width, big.resized_height) == (50, 12)
        resized = decode_ppm(bytes(big.content))
        assert (resized.width, resized.height) == (50, 12)
        # nearest-neighbor of a checkerboard stays in {0, 255}
        assert set(resized.pixels) <= {0, 255}
        small = out[2]  # already within max_dim: bytes untouched
        assert (small.resized_width, small.resized_height) == (8, 6)
        assert bytes(small.content)[:2] == b"BM"
        assert out[3].resized_width is None and out[4].resized_width is None

    def test_real_audio_features(self, spark):
        s = np.array([3276, -3276] * 8, dtype=np.int16)  # |x| constant
        rows = [
            (1, bytearray(encode_wav_pcm16(s, 8000))),
            (2, bytearray(b"not audio")),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        got = {
            r.media_id: (r.duration_ms, r.rms)
            for r in multimodal.extract_audio_features(df).collect()
        }
        assert got[1][0] == (16 * 1000) // 8000
        assert got[1][1] == pytest.approx(3276 / 32768.0, abs=1e-12)
        assert got[2] == (None, None) and got[3] == (None, None)

    def test_real_video_frames(self, spark):
        # 10 distinct frames at 40 ms/frame; sample every 80 ms → stride 2
        frames = [checker_pixels(6, 4) if i % 2 == 0 else bytes(6 * 4 * 3)
                  for i in range(10)]
        avi = encode_avi(frames, 6, 4, micro_sec_per_frame=40_000)
        rows = [(1, bytearray(avi)), (2, bytearray(b"not a video")), (3, None)]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        out = multimodal.sample_video_frames(df, every_n_ms=80).collect()
        by_id: dict = {}
        for r in out:
            by_id.setdefault(r.media_id, []).append(r)
        kept = sorted((r.frame_idx, r.frame_ts_ms) for r in by_id[1])
        assert kept == [(0, 0), (2, 80), (4, 160), (6, 240), (8, 320)]
        # each emitted frame is a standalone BMP decode_images can read
        f0 = next(r for r in by_id[1] if r.frame_idx == 0)
        img = decode_bmp(bytes(f0.frame))
        assert (img.width, img.height) == (6, 4)
        assert img.pixels == frames[0]
        # unparseable / null rows stay visible as one all-null frame row
        assert [(r.frame_idx, r.frame) for r in by_id[2]] == [(None, None)]
        assert [(r.frame_idx, r.frame) for r in by_id[3]] == [(None, None)]


class TestAviCodec:
    def test_round_trip(self):
        frames = [bytes([(i * 7 + j) % 256 for j in range(5 * 3 * 3)])
                  for i in range(4)]
        vid = decode_avi(encode_avi(frames, 5, 3, micro_sec_per_frame=33_333))
        assert (vid.width, vid.height, vid.n_frames) == (5, 3, 4)
        assert vid.micro_sec_per_frame == 33_333
        assert vid.frames == frames  # bottom-up BGR storage round-trips

    def test_rejects_garbage_and_compressed(self):
        with pytest.raises(ValueError):
            decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
        b = bytearray(encode_avi([bytes(4 * 2 * 3)], 4, 2))
        # flip strf biCompression (offset: find the strf chunk body + 16)
        i = b.find(b"strf") + 8 + 16
        b[i:i + 4] = struct.pack("<I", 0x47504A4D)  # 'MJPG'
        with pytest.raises(ValueError, match="compression"):
            decode_avi(bytes(b))

    def test_truncated_frame_raises(self):
        b = encode_avi([bytes(4 * 2 * 3)], 4, 2)
        with pytest.raises(ValueError, match="truncated"):
            decode_avi(b[:-8])
