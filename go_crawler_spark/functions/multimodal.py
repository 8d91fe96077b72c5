"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides through the engine as ``binary`` columns
with a typed metadata struct — the lakehouse-native layout for multimodal
training data.  The Spark-side plumbing (schemas, batch shapes, mapInPandas
signatures, partitioning) is real and tested.  Codec coverage is split:

* **PPM (P6) images decode for real** — a numpy-only parser
  (:func:`decode_ppm`), no Pillow required; ``image_features(fake=False)``
  runs decode -> grayscale -> nearest-neighbor resize -> phash/entropy
  end-to-end on real bytes (``synth_media`` emits genuine P6 payloads).
* **WAV (RIFF PCM16) audio decodes for real** — a numpy/stdlib chunk
  parser (:func:`decode_wav`); ``audio_features(fake=False)`` computes
  duration/RMS/peak/zero-crossings on the decoded signal end-to-end
  (``synth_media`` emits genuine seeded sine+noise WAV payloads).
* Compressed codecs (JPEG/PNG/mp3/ffmpeg) are NOT available in this
  container: those mimes raise ``NotImplementedError`` under
  ``fake=False``, and ``fake=True`` keeps the deterministic stand-in
  kernels.  Swapping in Pillow/ffmpeg later only replaces the kernel
  body — the plan shape is already the production one (Arrow-batched
  mapInPandas, no per-row Python hot loops, metadata pushdown-friendly).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


PPM_MIME = "image/x-portable-pixmap"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) -> binary PPM (P6, maxval 255)."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) rgb array, got {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) -> RGB uint8 array (h, w, 3), pure numpy.

    A real decoder for the one image container that needs no codec
    library: full header parse (whitespace runs + ``#`` comment lines,
    maxval 1..255), strict length check on the raster.  Compressed
    formats stay behind the NotImplementedError gate in
    :func:`image_features`.
    """
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM (missing P6 magic)")
    # header = magic + 3 ints (width, height, maxval), tokens separated
    # by whitespace; '#' starts a comment running to end-of-line
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            nl = buf.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tok = buf[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad PPM header token {tok!r}")
        fields.append(int(tok))
    w, h, maxval = fields
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval} (expect 1..255)")
    pos += 1  # exactly ONE whitespace byte separates header and raster
    need = w * h * 3
    raster = buf[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"PPM raster truncated: want {need}, got {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (seeded bytes).

    Image rows carry REAL binary-PPM payloads (seeded rgb pixels,
    variable small dims) and audio rows REAL RIFF/WAVE PCM16 payloads
    (seeded sine + noise, variable length/rate) so both ``fake=False``
    decode paths run end-to-end on genuine bytes; video payloads stay
    opaque seeded blobs (ffmpeg is environment-gated)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(42 + int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                if kind == "image":
                    w, h = 8 + int(i) % 9, 6 + int(i) % 7
                    payload = encode_ppm(
                        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    )
                    mime = PPM_MIME
                elif kind == "audio":
                    w = h = None
                    rate = [8_000, 16_000, 44_100][int(i) % 3]
                    n_s = 64 + int(i) % 200
                    t = np.arange(n_s) / rate
                    freq = 200.0 + (int(i) % 40) * 25.0
                    sig = 8_000.0 * np.sin(2 * np.pi * freq * t)
                    sig = sig + 500.0 * rng.standard_normal(n_s)
                    payload = encode_wav(
                        np.clip(sig, -32768, 32767).astype(np.int16), rate
                    )
                    mime = WAV_MIME
                else:
                    w = h = None
                    payload = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
                    mime = "video/mp4"
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": payload,
                        "mime": mime,
                        "width": w if kind == "image" else (64 + int(i) % 512 if kind == "video" else None),
                        "height": h if kind == "image" else (64 + int(i) % 256 if kind == "video" else None),
                        # audio metadata agrees with the real payload
                        "duration_ms": (
                            int(1000 * n_s / rate) if kind == "audio"
                            else 1000 + int(i) * 10 if kind == "video"
                            else None
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


WAV_MIME = "audio/wav"


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes, pure numpy/stdlib."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError(f"expected 1-D mono samples, got shape {s.shape}")
    data = s.tobytes()
    import struct

    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte-rate, block-align 2, 16-bit
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16-mono bytes -> (int16 samples, sample_rate), pure
    numpy/stdlib.

    A real decoder for the one audio container that needs no codec
    library: walks the RIFF chunk list (tolerating extra chunks like
    LIST/INFO, honoring odd-size padding), requires format tag 1 (PCM),
    mono, 16-bit.  Compressed formats (mp3/aac/ogg) stay behind the
    NotImplementedError gate in :func:`audio_features`.
    """
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        chunk = buf[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError(f"truncated {cid!r} chunk: want {size} bytes")
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"WAV fmt chunk too short ({len(fmt)} < 16 bytes)")
    tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (tag={tag}, bits={bits})")
    if channels != 1:
        raise ValueError(f"only mono supported, got {channels} channels")
    if len(data) % 2:
        raise ValueError("PCM16 data chunk has odd length")
    return np.frombuffer(data, dtype="<i2"), rate


def _byte_entropy(buf: bytes) -> float:
    if not buf:
        return 0.0
    counts = np.bincount(np.frombuffer(buf, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(buf)
    return float(-(p * np.log2(p)).sum())


def image_features(media: DataFrame, fake: bool = True, thumb_size: int = 8) -> DataFrame:
    """Decode → perceptual-hash → thumbnail, as Arrow-batched mapInPandas.

    ``fake=False`` is the REAL path for binary-PPM payloads
    (:func:`decode_ppm`): grayscale = integer channel mean
    ``(r+g+b)//3``, nearest-neighbor resize to ``thumb_size²``, phash =
    bits(pixel > median(thumb)), ``byte_entropy`` over the DECODED
    grayscale raster (header bytes excluded — the image content, not
    the container).  Any non-PPM mime under ``fake=False`` raises
    ``NotImplementedError`` (JPEG/PNG need Pillow/libjpeg, absent in
    this container).  ``fake=True`` keeps the deterministic stand-in
    decoder (payload bytes reshaped as a grayscale grid) with entropy
    over the raw payload.
    """
    cols = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]

    if not fake:

        def real_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # Arrow-batched; per-image work is whole-array numpy (decode,
            # grayscale, strided NN resize, median phash, bincount
            # entropy).  Variable dims make cross-image vectorization
            # impossible without padding — per-image numpy is the real
            # shape a Pillow-backed kernel would have too.
            npix = thumb_size * thumb_size
            weights = np.uint64(1) << np.arange(min(npix, 64), dtype=np.uint64)
            ti = np.arange(thumb_size, dtype=np.int64)
            for b in batches:
                out = []
                for mid, mime, payload in zip(
                    b["media_id"], b["mime"], b["payload"]
                ):
                    if mime != PPM_MIME:
                        raise NotImplementedError(
                            f"real decode for mime {mime!r} requires "
                            "Pillow/libjpeg/ffmpeg, not present in this "
                            "container (only binary PPM decodes natively)"
                        )
                    buf = bytes(payload) if payload is not None else b""
                    rgb = decode_ppm(buf).astype(np.int64)
                    h, w = rgb.shape[:2]
                    gray = (rgb.sum(axis=2) // 3).astype(np.uint8)
                    thumb = gray[(ti * h) // thumb_size][:, (ti * w) // thumb_size]
                    flat = thumb.ravel()
                    bits = (flat > np.median(flat))[: len(weights)]
                    phash = np.int64(
                        (bits * weights).sum(dtype=np.uint64).astype(np.uint64)
                    )
                    counts = np.bincount(gray.ravel(), minlength=256)
                    p = counts[counts > 0] / gray.size
                    ent = float(-(p * np.log2(p)).sum())
                    out.append(
                        {
                            "media_id": int(mid),
                            "n_bytes": len(buf),
                            "byte_entropy": ent,
                            "phash": phash,
                            "thumb": thumb.tobytes(),
                        }
                    )
                yield pd.DataFrame(out, columns=cols)

        imgs = media.where(F.col("kind") == "image")
        return imgs.mapInPandas(real_kernel, IMAGE_FEATURES_SCHEMA)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One numpy pass over the whole Arrow batch — no per-row Python.
        step = 16 // thumb_size
        npix = thumb_size * thumb_size
        weights = np.uint64(1) << np.arange(min(npix, 64), dtype=np.uint64)
        for b in batches:
            n = len(b)
            if n == 0:
                yield pd.DataFrame(columns=cols)
                continue
            bufs = [bytes(x) if x is not None else b"" for x in b["payload"]]
            lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=n)
            # fake decode, batched: each payload truncated/zero-padded to
            # 256 bytes -> one (n, 16, 16) grayscale block
            grid = np.frombuffer(
                b"".join(x[:256].ljust(256, b"\0") for x in bufs), dtype=np.uint8
            ).reshape(n, 16, 16)
            # fake resize: strided subsample to (n, thumb, thumb)
            thumbs = np.ascontiguousarray(grid[:, ::step, ::step])
            flat_t = thumbs.reshape(n, -1)
            # perceptual hash: bits = pixel > per-image median
            med = np.median(flat_t, axis=1)[:, None]
            bits = (flat_t > med)[:, : len(weights)]
            phash = (bits * weights).sum(axis=1, dtype=np.uint64).astype(np.int64)
            # byte entropy over the FULL payload (variable lengths):
            # row-offset bincount = one histogram per row, one numpy call
            all_b = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.int64)
            row = np.repeat(np.arange(n, dtype=np.int64), lens)
            counts = np.bincount(row * 256 + all_b, minlength=n * 256).reshape(n, 256)
            p = counts / np.maximum(lens, 1)[:, None]
            logp = np.log2(p, out=np.zeros_like(p), where=p > 0)
            ent = -(p * logp).sum(axis=1)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].to_numpy(),
                    "n_bytes": lens,
                    "byte_entropy": ent,
                    "phash": phash,
                    # (an S-dtype view would strip trailing \0 bytes)
                    "thumb": [t.tobytes() for t in thumbs],
                }
            )

    imgs = media.where(F.col("kind") == "image")
    return imgs.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode → signal stats, as Arrow-batched ``mapInPandas`` — the
    audio twin of :func:`image_features`.

    ``fake=False`` is the REAL path for RIFF/WAVE PCM16 payloads
    (:func:`decode_wav`): duration from the fmt chunk's sample rate,
    RMS / peak / zero-crossing rate over the decoded int16 signal —
    the standard cheap quality gates an audio corpus pipeline cuts on
    (silence, clipping, noise).  Any non-WAV mime under ``fake=False``
    raises ``NotImplementedError`` (mp3/aac need codec libraries,
    absent in this container).  ``fake=True`` computes the same stats
    over the raw payload bytes REINTERPRETED as int16 at a nominal
    16 kHz — deterministic stand-in, same schema and plan shape.
    """
    cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]

    def stats(sig: np.ndarray, rate: int, n_bytes: int, mid: int) -> dict:
        n = len(sig)
        f = sig.astype(np.float64)
        rms = float(np.sqrt((f * f).mean())) if n else 0.0
        # peak on the float copy: np.abs on int16 wraps -32768 to
        # -32768, silently passing the exact clipping case this gate
        # exists to catch
        peak = int(np.abs(f).max()) if n else 0
        zc = float((np.signbit(f[1:]) != np.signbit(f[:-1])).mean()) if n > 1 else 0.0
        return {
            "media_id": mid,
            "n_bytes": n_bytes,
            "sample_rate": rate,
            "n_samples": n,
            "duration_ms": 1000.0 * n / rate if rate else 0.0,
            "rms": rms,
            "peak": peak,
            "zero_cross_rate": zc,
        }

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, mime, payload in zip(b["media_id"], b["mime"], b["payload"]):
                buf = bytes(payload) if payload is not None else b""
                if not fake:
                    if mime != WAV_MIME:
                        raise NotImplementedError(
                            f"real decode for mime {mime!r} requires an "
                            "audio codec library, not present in this "
                            "container (only RIFF/WAVE PCM16 decodes "
                            "natively)"
                        )
                    sig, rate = decode_wav(buf)
                else:
                    sig = np.frombuffer(buf[: len(buf) & ~1], dtype="<i2")
                    rate = 16_000
                out.append(stats(sig, rate, len(buf), int(mid)))
            yield pd.DataFrame(out, columns=cols)

    auds = media.where(F.col("kind") == "audio")
    return auds.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling (1 row per sampled frame)."""
    if not fake:
        raise NotImplementedError("real frame extraction requires ffmpeg")

    cols = [f.name for f in FRAME_SAMPLE_SCHEMA.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized fan-out: frame counts/indices/offsets computed as
        # whole-batch numpy ops; only the final byte slices touch Python
        # (C-level bytes slicing, no iterrows / per-row Series).
        for b in batches:
            n = len(b)
            if n == 0:
                yield pd.DataFrame(columns=cols)
                continue
            durs = b["duration_ms"].fillna(0).to_numpy().astype(np.int64)
            bufs = [bytes(x) if x is not None else b"" for x in b["payload"]]
            lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=n)
            k = np.maximum(-(-durs // every_ms), 0)  # frames per video
            vid = np.repeat(np.arange(n, dtype=np.int64), k)
            # concatenated per-video aranges: 0..k_i-1 for each video i
            total = int(k.sum())
            fidx = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(k) - k, k)
            lo = (fidx * 16) % np.maximum(lens - 16, 1)[vid]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].to_numpy()[vid],
                    "frame_idx": fidx.astype(np.int32),
                    "frame_ts_ms": (fidx * every_ms).astype(np.int32),
                    "frame": [bufs[v][o : o + 16] for v, o in zip(vid, lo)],
                },
                columns=cols,
            )

    vids = media.where(F.col("kind") == "video")
    return vids.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
