"""Multimodal column plumbing (driver mandate: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side architecture is real and tested: a typed media schema,
Arrow-batched `mapInPandas` decode/feature/resize/frame-sample stages with
explicit output schemas, and partition-count control so one decoded batch
fits executor memory (decoded frames are ~100× the compressed bytes —
*the* sizing constraint at 100 TB).

The codec layer follows the driver contract (no image/audio/video libs
in this container): `decode_media` understands a deterministic fake
container format (FAKEv1) end-to-end, plus three REAL container formats
with stdlib-only codecs — PNG (zlib+struct encode, Pillow-seam decode),
RIFF/WAVE PCM16 (struct encode, stdlib `wave` decode), and RIFF/AVI
uncompressed 24-bit DIB (struct encode, generic RIFF-walker decode).
NotImplementedError now marks only the compressed-codec seam
(JPEG-in-Pillow-absent, non-PCM WAV, MP4/H.264) where Pillow/libav
would plug in.

FAKEv1 layout (big-endian):  b"FAKE" | u8 kind (0=img,1=aud,2=vid) |
u16 width | u16 height | u16 n_frames | payload bytes (w*h per frame,
grayscale u8).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_KINDS = ["image", "audio", "video"]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def encode_fake_media(media_id: int, kind: int, width: int, height: int, n_frames: int = 1) -> bytes:
    """Deterministic FAKEv1 blob (payload derived from media_id)."""
    payload = bytes(
        (media_id * 31 + i * 7) % 256 for i in range(width * height * n_frames)
    )
    return b"FAKE" + struct.pack(">BHHH", kind, width, height, n_frames) + payload


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Synthetic media table for tests/demos."""
    rows = []
    for i in range(n):
        kind = i % 3
        w, h, fr = 8 + (i % 5), 6 + (i % 4), 1 + (i % 3 if kind == 2 else 0)
        rows.append(
            (
                i,
                _KINDS[kind],
                encode_fake_media(i, kind, w, h, fr),
                (f"src{i % 4}", f"fake/{_KINDS[kind]}"),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# Optional real-codec dependency: Pillow plugs into the decode seam when
# importable (container-dependent); the FAKEv1 tests define the decode
# contract either way, and tests for the real path skip-gate on the
# import (same pattern as the transformWithState protobuf gate).
try:  # pragma: no cover - availability depends on the container
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8"


def codec_support() -> dict[str, bool]:
    """Which decode paths are live in THIS container — the seam's
    introspection surface, so tests and operators can report exactly
    which codecs were exercised instead of a bare skip."""
    return {
        "fakev1": True,  # the always-on test contract
        "png": _PILImage is not None,
        "jpeg": _PILImage is not None,
        "wav": True,  # stdlib `wave` PCM decode — always on
        "avi": True,  # struct RIFF walker, uncompressed DIB — always on
        "mp4": False,  # pyav/libav seam, deliberately unimplemented
    }


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal valid 8-bit grayscale PNG from raw pixel bytes — pure
    stdlib (struct + zlib), no Pillow. Exists so the real-codec seam is
    testable without circularity: the PNG handed to the decoder was NOT
    produced by the library that decodes it, and containers without
    Pillow can still assert that a WELL-FORMED real image (not junk
    bytes) reaches the NotImplementedError seam."""
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes (8-bit gray)")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav_pcm16(
    samples: list[int], sample_rate: int, n_channels: int = 1
) -> bytes:
    """Minimal valid RIFF/WAVE container around 16-bit little-endian PCM
    — hand-rolled with struct so the encoder is independent of the
    stdlib `wave` module that decodes it (the encode_png_gray
    non-circularity discipline). `samples` are interleaved int16."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate,
            n_channels * 2, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm16(
    content: bytes,
) -> tuple[int, int, int, int, int]:
    """Decode a RIFF/WAVE PCM16 blob via the stdlib `wave` module →
    (sample_rate, n_channels, n_samples, peak, sumsq) with EXACT integer
    peak=max(|s|) and sumsq=sum(s^2) over all interleaved samples —
    integer moments so downstream aggregates replay bit-for-bit in any
    engine (the quantize-before-sum discipline)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content)) as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only PCM16 WAV is decoded (sampwidth=2), "
                f"got sampwidth={w.getsampwidth()}"
            )
        frames = w.readframes(w.getnframes())
        sr, ch = w.getframerate(), w.getnchannels()
    s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    n = int(s.size)
    peak = int(np.abs(s).max()) if n else 0
    sumsq = int((s * s).sum()) if n else 0
    return sr, ch, n, peak, sumsq


def encode_avi_rgb24(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal valid RIFF/AVI container around uncompressed 24-bit DIB
    video — the video leg of the encode_png_gray / encode_wav_pcm16
    discipline: hand-rolled with struct (MSDN 'AVI RIFF File Reference'
    layout), fully independent of the RIFF walker that decodes it.

    `frames` are top-down row-major RGB24 (3 bytes/pixel); the encoder
    converts to the on-disk DIB convention — BGR channel order,
    bottom-up rows, stride padded to a 4-byte boundary — so a decoder
    that forgets either inversion produces different bytes, which the
    flip/channel-weighted features downstream are built to catch.
    Frames land in '00db' chunks inside the 'movi' LIST, with a
    standard 'idx1' index (AVIIF_KEYFRAME on every frame: raw DIB has
    no inter-frame deps)."""
    stride = (width * 3 + 3) & ~3
    dib_size = stride * height

    def dib(frame: bytes) -> bytes:
        rows = []
        pad = b"\x00" * (stride - width * 3)
        for y in range(height - 1, -1, -1):  # bottom-up
            row = bytearray(frame[y * width * 3 : (y + 1) * width * 3])
            row[0::3], row[2::3] = row[2::3], row[0::3]  # RGB -> BGR
            rows.append(bytes(row) + pad)
        return b"".join(rows)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        dib_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        n, 0, 1, dib_size,  # frames, initial, streams, bufsize
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsDIB "
        + struct.pack(
            "<IHH8I4H",
            0, 0, 0,  # dwFlags, wPriority, wLanguage
            0, 1, fps,  # dwInitialFrames, dwScale, dwRate
            0, n, dib_size, 0, 0,  # start, length, bufsize, quality, samplesize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, dib_size, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00db", dib(f)) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the 'movi' fourcc (the common
    # convention decoders expect); first chunk sits 4 bytes after it.
    idx_entries, off = [], 4
    for _ in range(n):
        idx_entries.append(b"00db" + struct.pack("<III", 0x10, off, dib_size))
        off += 8 + dib_size + (dib_size % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_rgb24(
    content: bytes,
) -> tuple[int, int, int, int, list[bytes]]:
    """Decode an uncompressed 24-bit RIFF/AVI blob via a generic RIFF
    chunk walker (independent of the encoder above) →
    (width, height, fps, n_frames, frames) with frames normalized back
    to top-down RGB24. Raises NotImplementedError at the compressed-
    codec seam (biCompression != 0 — where libav would plug in)."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI blob")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            data_start = pos + 8
            if tag == b"LIST":
                yield buf[data_start : data_start + 4], data_start + 4, data_start + size
                yield from walk(buf, data_start + 4, data_start + size)
            else:
                yield tag, data_start, data_start + size
            pos = data_start + size + (size % 2)

    width = height = n_frames = 0
    scale, rate, bitcount, compression = 1, 10, 24, 0
    raw_frames: list[bytes] = []
    for tag, s, e in walk(content, 12, len(content)):
        if tag == b"avih":
            hdr = struct.unpack("<14I", content[s : s + 56])
            n_frames, width, height = hdr[4], hdr[8], hdr[9]
        elif tag == b"strh" and content[s : s + 4] == b"vids":
            flds = struct.unpack("<IHH8I4H", content[s + 8 : s + 56])
            scale, rate = max(flds[4], 1), flds[5]
        elif tag == b"strf":
            bitcount = struct.unpack("<H", content[s + 14 : s + 16])[0]
            compression = struct.unpack("<I", content[s + 16 : s + 20])[0]
        elif tag in (b"00db", b"00dc"):
            raw_frames.append(content[s:e])
    if compression != 0 or bitcount != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit DIB AVI is decoded (BI_RGB); got "
            f"biCompression={compression} biBitCount={bitcount} — the "
            f"libav seam for real codecs"
        )
    stride = (width * 3 + 3) & ~3
    frames = []
    for raw in raw_frames:
        rows = []
        for y in range(height - 1, -1, -1):  # un-flip bottom-up
            row = bytearray(raw[y * stride : y * stride + width * 3])
            row[0::3], row[2::3] = row[2::3], row[0::3]  # BGR -> RGB
            rows.append(bytes(row))
        frames.append(b"".join(rows))
    return width, height, rate // scale, len(frames), frames


def _decode_one(content: bytes) -> tuple[int, int, int, float]:
    """Decode a media blob → (width, height, n_frames, mean_intensity).

    FAKEv1 is always supported (the test contract). PNG/JPEG decode via
    Pillow when the library is importable — same output contract as
    FAKEv1 (single frame, mean intensity over the grayscale conversion).
    WAV/PCM16 decodes via the stdlib `wave` module, mapped into the
    image-shaped tuple as (n_channels, sample_rate, n_samples, RMS
    amplitude) — so decode_media is total over image+audio. Video
    (libav/pyav) is the one remaining NotImplementedError seam.
    """
    if content is None or len(content) < 11:
        raise ValueError("truncated media blob")
    magic, rest = content[:4], content[4:]
    if magic != b"FAKE":
        if _PILImage is not None and (
            content[:8] == _PNG_MAGIC or content[:2] == _JPEG_MAGIC
        ):
            import io

            img = _PILImage.open(io.BytesIO(content)).convert("L")
            data = list(img.getdata())
            mean = sum(data) / max(len(data), 1)
            return img.width, img.height, 1, float(mean)
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            import math

            sr, ch, n, _peak, sumsq = decode_wav_pcm16(content)
            rms = math.sqrt(sumsq / n) if n else 0.0
            return ch, sr, n, rms
        if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            w, h, _fps, nf, frames = decode_avi_rgb24(content)
            tot = sum(sum(f) for f in frames)
            npx = w * h * 3 * nf
            return w, h, nf, tot / max(npx, 1)
        raise NotImplementedError(
            "real codec decode not available: Pillow handles PNG/JPEG when "
            "installed; WAV/PCM16 decodes via the stdlib wave module; "
            "uncompressed 24-bit AVI decodes via the struct RIFF walker; "
            "compressed video (MP4/H.264) still needs pyav/libav. FAKEv1 "
            "is guaranteed everywhere."
        )
    kind, width, height, n_frames = struct.unpack(">BHHH", rest[:7])
    payload = rest[7 : 7 + width * height * n_frames]
    mean = sum(payload) / max(len(payload), 1)
    return width, height, n_frames, mean


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("sumsq", T.LongType(), True),
        T.StructField("rms_q", T.LongType(), True),
    ]
)


def audio_features(df: DataFrame, *, batch_partitions: int | None = None) -> DataFrame:
    """Arrow-batched WAV feature extraction via mapInPandas — the audio
    leg of the decode path, same batch shape and memory-envelope
    contract as decode_media. Exact integer features (duration in whole
    ms, peak, sum-of-squares) plus RMS quantized to integer thousandths
    BEFORE any cross-row aggregation, so downstream groupBys replay
    bit-for-bit in other engines."""
    import math

    if batch_partitions:
        df = df.repartition(batch_partitions)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                sr, ch, n, peak, sumsq = decode_wav_pcm16(content)
                out["media_id"].append(mid)
                out["sample_rate"].append(sr)
                out["n_channels"].append(ch)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // (sr * ch) if sr else 0)
                out["peak"].append(peak)
                out["sumsq"].append(sumsq)
                out["rms_q"].append(
                    int(math.floor(math.sqrt(sumsq / n) * 1000 + 0.5))
                    if n
                    else 0
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        feats, schema=AUDIO_FEATURE_SCHEMA
    )


VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("lum_sum", T.LongType(), True),
        T.StructField("wrow_sum", T.LongType(), True),
        T.StructField("wchan_sum", T.LongType(), True),
        T.StructField("motion_sum", T.LongType(), True),
    ]
)


def video_features(df: DataFrame, *, batch_partitions: int | None = None) -> DataFrame:
    """Arrow-batched AVI feature extraction via mapInPandas — the video
    leg of the decode path. All features are EXACT integer moments over
    the decoded top-down RGB24 frames, chosen so every on-disk DIB
    convention is load-bearing:

    - lum_sum: sum of all channel bytes (decode sanity);
    - wrow_sum: sum of (top-down row index + 1) x row byte-sum — a
      decoder that forgets the bottom-up un-flip changes this;
    - wchan_sum: sum of (channel index + 1) x channel byte-sum in RGB
      order — a decoder that forgets the BGR swap changes this;
    - motion_sum: sum over consecutive frames of |lum(f) - lum(f-1)| —
      a decoder that reorders or drops frames changes this.

    Quantization-before-aggregation discipline as audio_features: the
    per-media values are exact BIGINTs, so cross-row sums replay
    bit-for-bit in any engine. At 100 TB the envelope math matches
    decode_media — decoded-frames-per-task is the partition sizing
    constraint (`batch_partitions`), and the features are one bounded
    pass over each blob with no cross-row state."""
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k.name: [] for k in VIDEO_FEATURE_SCHEMA.fields}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, fps, nf, frames = decode_avi_rgb24(content)
                lum = wrow = wchan = motion = 0
                prev = None
                row_w = np.repeat(np.arange(1, h + 1, dtype=np.int64), w * 3)
                chan_w = np.tile(
                    np.array([1, 2, 3], dtype=np.int64), w * h
                )
                for fb in frames:
                    a = np.frombuffer(fb, dtype=np.uint8).astype(np.int64)
                    fsum = int(a.sum())
                    lum += fsum
                    wrow += int((a * row_w).sum())
                    wchan += int((a * chan_w).sum())
                    if prev is not None:
                        motion += abs(fsum - prev)
                    prev = fsum
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["fps"].append(fps)
                out["n_frames"].append(nf)
                out["lum_sum"].append(lum)
                out["wrow_sum"].append(wrow)
                out["wchan_sum"].append(wchan)
                out["motion_sum"].append(motion)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        feats, schema=VIDEO_FEATURE_SCHEMA
    )


def decode_media(df: DataFrame, *, batch_partitions: int | None = None) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas.

    `batch_partitions` controls the decoded-bytes-per-task envelope: at
    scale, repartition so (rows/partition × decoded size) fits executor
    memory — compressed→decoded blowup is the sizing constraint, not the
    input bytes.
    """
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "width": [], "height": [],
                "n_frames": [], "mean_intensity": [], "n_bytes": [],
            }
            for mid, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                w, h, fr, mean = _decode_one(content)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(fr)
                out["mean_intensity"].append(mean)
                out["n_bytes"].append(len(content))
            yield pd.DataFrame(out)

    return df.select("media_id", "kind", "content").mapInPandas(
        decode, schema=FEATURE_SCHEMA
    )


def frame_sample(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Video frame sampling: one output row per kept frame
    (media_id, frame_idx, frame_bytes). Runs as mapInPandas so a real
    demuxer can stream frames without materializing whole videos."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, fr, _ = _decode_one(content)
                frame_len = w * h
                for f in range(0, fr, every_nth):
                    start = 11 + f * frame_len
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(bytes(content[start : start + frame_len]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return (
        df.where(F.col("kind") == "video")
        .select("media_id", "content")
        .mapInPandas(sample, schema=schema)
    )


def resize_media(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Image/frame resize to (out_w, out_h) via nearest-neighbor sampling
    — REAL pixel math on the FAKEv1 payload (numpy index gather per
    frame), not a stub; a Pillow/libav resampler swaps in at the same
    seam for real codecs. Output rows are re-encoded FAKEv1 blobs with
    the new dimensions, so resize composes with decode_media /
    frame_sample downstream.

    Arrow-batched mapInPandas: the decoded-pixels-per-task envelope is
    (rows/partition × w × h × frames) — size partitions upstream like
    decode_media. Nearest-neighbor keeps it allocation-light: one index
    gather, no interpolation buffers.
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), True),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, blobs = [], [], []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                w, h, fr, _ = _decode_one(content)
                src = np.frombuffer(content, dtype=np.uint8, offset=11)
                src = src[: w * h * fr].reshape(fr, h, w)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = src[:, ys[:, None], xs[None, :]]
                header = b"FAKE" + struct.pack(
                    ">BHHH", {"image": 0, "audio": 1, "video": 2}.get(kind, 0),
                    out_w, out_h, fr,
                )
                ids.append(mid)
                kinds.append(kind)
                blobs.append(header + resized.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "content": blobs}
            )

    return (
        df.where(F.col("kind") != "audio")
        .select("media_id", "kind", "content")
        .mapInPandas(resize, schema=schema)
    )
