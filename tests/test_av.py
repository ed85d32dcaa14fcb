"""WAV/Y4M codecs (operators/av) + the real audio/video multimodal ops."""

import struct

import numpy as np
import pytest

from fourmc_spark.operators import av, multimodal


def _tone(n, ch, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(-1024, 1024, size=(n, ch)).astype(np.int16)


@pytest.mark.parametrize("n,ch,rate", [(1, 1, 8000), (441, 2, 44100), (100, 1, 16000)])
def test_wav_roundtrip(n, ch, rate):
    a = _tone(n, ch, n + ch)
    back, r = av.decode_wav(av.encode_wav(a, rate))
    assert r == rate
    assert back.dtype == np.int16
    assert np.array_equal(back, a)


def test_wav_extra_chunks_skipped():
    a = _tone(50, 1, 3)
    data = bytearray(av.encode_wav(a, 8000))
    # splice a LIST chunk (odd size -> exercises the RIFF pad rule)
    # between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    data[fmt_end:fmt_end] = extra
    struct.pack_into("<I", data, 4, len(data) - 8)
    back, r = av.decode_wav(bytes(data))
    assert np.array_equal(back, a)


def test_wav_float32_and_uint8():
    f = np.linspace(-1, 1, 32, dtype=np.float32)[:, None]
    hdr = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    raw = f.tobytes()
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + len(raw)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + hdr
            + b"data" + struct.pack("<I", len(raw)) + raw)
    back, _ = av.decode_wav(data)
    assert back.dtype == np.float32
    assert np.array_equal(back[:, 0], f[:, 0])


@pytest.mark.parametrize("bad", [
    b"RIFX" + b"\x00" * 40,                       # wrong magic
    b"RIFF" + struct.pack("<I", 4) + b"WAVE",     # no chunks
    b"\xff\xfb\x90\x00 mp3 frame",                # mp3 needs external codec
])
def test_wav_rejects(bad):
    with pytest.raises(av.UnsupportedMediaError):
        av.decode_wav(bad)


def test_wav_rejects_truncated_data_chunk():
    a = _tone(50, 2, 9)
    data = av.encode_wav(a, 8000)
    with pytest.raises(av.UnsupportedMediaError):
        av.decode_wav(data[:-7])


def test_y4m_roundtrip():
    frames = [
        (np.arange(8 * 6, dtype=np.uint8).reshape(6, 8) + k) for k in range(4)
    ]
    stream = av.encode_y4m(frames)
    w, h, chroma, off = av.parse_y4m_header(stream)
    assert (w, h, chroma) == (8, 6, "420")
    got = list(av.iter_y4m_frames(stream))
    assert [k for k, _ in got] == [0, 1, 2, 3]
    for k, luma in got:
        assert np.array_equal(luma, frames[k])


def test_y4m_header_variants_and_rejects():
    frames = [np.zeros((2, 4), dtype=np.uint8)]
    stream = bytearray(av.encode_y4m(frames))
    with pytest.raises(av.UnsupportedMediaError):
        av.parse_y4m_header(b"JUNK" + bytes(stream))
    # truncated frame body
    with pytest.raises(av.UnsupportedMediaError):
        list(av.iter_y4m_frames(bytes(stream[:-3])))
    # unsupported chroma
    bad = bytes(stream).replace(b"C420", b"C411")
    with pytest.raises(av.UnsupportedMediaError):
        av.parse_y4m_header(bad)


def _audio_lattice(d):
    n, ch = 100 + d % 257, 1 + (d + 1) % 2
    i = np.arange(n)[:, None]
    c = np.arange(ch)[None, :]
    return ((7 * i + 11 * c + d) % 2048) - 1024


def test_audio_pipeline_matches_lattice(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_audio_features(
            multimodal.synthesize_audio(df)
        ).collect()
    }
    for d in range(10):
        s = _audio_lattice(d)
        r = feats[d]
        assert (r["n_samples"], r["channels"]) == s.shape
        assert r["sample_rate"] == 8000 + 100 * (d % 9)
        assert r["amp_sum"] == int(np.abs(s).sum())


def test_video_pipeline_matches_lattice(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    rows = multimodal.sample_video_frames(
        multimodal.synthesize_video(df), stride=2
    ).collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    for d in range(10):
        w, h, nf = 4 + 2 * (d % 7), 2 + 2 * (d % 5), 2 + d % 5
        kept = [k for k in range(nf) if k % 2 == 0]
        assert sorted(k for dd, k in got if dd == d) == kept
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        for k in kept:
            luma = (3 * x + 5 * y + 17 * k + d) % 256
            r = got[(d, k)]
            assert (r["width"], r["height"]) == (w, h)
            assert r["luma_sum"] == int(luma.sum())


def test_y4m_odd_dimensions_parse():
    # 5x4 C420jpeg: chroma planes are ceil(5/2) x ceil(4/2) = 3x2 (the
    # int(w*h*1.5) shortcut under-reads 2 bytes/frame and derails the
    # next FRAME marker)
    w, h = 5, 4
    luma0 = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    luma1 = (luma0 + 7).astype(np.uint8)
    chroma = bytes([128]) * (3 * 2)
    stream = b"YUV4MPEG2 W5 H4 F25:1 C420jpeg\n"
    for fr in (luma0, luma1):
        stream += b"FRAME\n" + fr.tobytes() + chroma + chroma
    got = list(av.iter_y4m_frames(stream))
    assert len(got) == 2
    assert np.array_equal(got[0][1], luma0)
    assert np.array_equal(got[1][1], luma1)


def test_y4m_odd_width_422():
    w, h = 3, 2
    luma = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    chroma = bytes([90]) * (2 * h)  # ceil(3/2)=2 per row
    stream = b"YUV4MPEG2 W3 H2 C422\n" + b"FRAME\n" + luma.tobytes() + chroma + chroma
    (idx, got), = av.iter_y4m_frames(stream)
    assert idx == 0 and np.array_equal(got, luma)
