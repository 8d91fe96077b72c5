"""Real numpy-only WAV (RIFF PCM16) decode path — the audio twin of the
PPM image path."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import multimodal as mm


def test_wav_roundtrip_and_golden_header():
    sig = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    buf = mm.encode_wav(sig, sample_rate=8000)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    out, rate = mm.decode_wav(buf)
    assert rate == 8000
    assert np.array_equal(out, sig)


def test_wav_decoder_tolerates_extra_chunks_and_padding():
    import struct

    sig = np.array([5, -5, 7], dtype=np.int16)
    core = mm.encode_wav(sig, 16000)
    # splice a LIST chunk with ODD size (forces pad handling) before data
    fmt_end = core.index(b"data")
    listing = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\0"  # pad byte
    spliced = core[:fmt_end] + listing + core[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = mm.decode_wav(spliced)
    assert rate == 16000 and np.array_equal(out, sig)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"JUNK" + b[4:], "RIFF"),
        (lambda b: b[:46], "truncated"),   # cuts into the data chunk
        (lambda b: b[:40], "missing"),     # cuts the data chunk header
        (lambda b: b.replace(b"fmt ", b"xxx "), "fmt"),
    ],
)
def test_wav_decoder_error_cases(mutate, msg):
    buf = mm.encode_wav(np.array([1, 2], dtype=np.int16), 8000)
    with pytest.raises(ValueError, match=msg):
        mm.decode_wav(mutate(buf))


def test_wav_decoder_rejects_stereo_and_nonpcm():
    import struct

    buf = bytearray(mm.encode_wav(np.array([1, 2], dtype=np.int16), 8000))
    fmt_off = buf.index(b"fmt ") + 8
    stereo = bytes(buf[:fmt_off + 2]) + struct.pack("<H", 2) + bytes(buf[fmt_off + 4:])
    with pytest.raises(ValueError, match="mono"):
        mm.decode_wav(stereo)
    nonpcm = bytes(buf[:fmt_off]) + struct.pack("<H", 3) + bytes(buf[fmt_off + 2:])
    with pytest.raises(ValueError, match="PCM16"):
        mm.decode_wav(nonpcm)


def test_audio_features_real_golden(spark):
    """Hand-computable signal: [100, -100, 100, -100] at 1 kHz."""
    sig = np.array([100, -100, 100, -100], dtype=np.int16)
    buf = mm.encode_wav(sig, sample_rate=1000)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(buf), mm.WAV_MIME, None, None, 4)],
        mm.MEDIA_SCHEMA,
    )
    r = mm.audio_features(df, fake=False).collect()[0]
    assert r.sample_rate == 1000 and r.n_samples == 4
    assert r.duration_ms == pytest.approx(4.0)
    assert r.rms == pytest.approx(100.0)
    assert r.peak == 100
    assert r.zero_cross_rate == pytest.approx(1.0)  # alternates every step
    assert r.n_bytes == len(buf)


def test_audio_features_real_on_synth_media(spark):
    media = mm.synth_media(spark, 30)
    feats = mm.audio_features(media, fake=False).collect()
    assert len(feats) == 10  # kinds cycle image/audio/video
    for r in feats:
        assert r.sample_rate in (8000, 16000, 44100)
        assert r.n_samples > 0 and r.rms > 0
        assert 0.0 <= r.zero_cross_rate <= 1.0
    # metadata duration agrees with decoded duration
    metas = {r.media_id: r.duration_ms
             for r in media.where(F.col("kind") == "audio").collect()}
    for r in feats:
        assert metas[r.media_id] == int(r.duration_ms)


def test_audio_features_fake_path_and_gate(spark):
    df = spark.createDataFrame(
        [(1, "audio", bytearray(b"\x01\x02\x03\x04\x05"), "audio/mp3",
          None, None, 1)],
        mm.MEDIA_SCHEMA,
    )
    # fake path: bytes reinterpreted as int16 (odd byte dropped)
    r = mm.audio_features(df, fake=True).collect()[0]
    assert r.n_samples == 2 and r.sample_rate == 16000 and r.n_bytes == 5
    # real path refuses non-WAV mimes honestly
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.audio_features(df, fake=False).collect()
