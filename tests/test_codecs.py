"""Pure-stdlib PNG/WAV codec round trips + the real-codec multimodal
operators end-to-end on a tiny Spark frame.

The closed-form DuckDB twins are checked by tools/oracle_check.py
(multimodal_image_decode / _image_resize / _audio_decode /
_audio_frames); here we gate the codec layer itself: exact array
round trips across shapes and filter types, CRC rejection, resize
index math, and the Spark operators' agreement with a pure-local
recomputation.
"""

import numpy as np
import pytest

from search_engine_spark.functions import codecs
from search_engine_spark.operators import multimodal as mm


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (1, 7), (6, 1), (5, 3), (8, 8, 3), (12, 17, 3), (9, 4, 4)],
)
def test_png_roundtrip_exact(shape):
    rng = np.random.default_rng(hash(shape) % (2**32))
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = codecs.png_decode(codecs.png_encode(arr))
    assert out.shape == arr.shape
    assert (out == arr).all()


def test_png_all_filter_rows_exercised():
    # encoder cycles filter type y % 5 — with h >= 5 every filter kind is
    # present in the stream; a wrong unfilter breaks exactness somewhere
    arr = (np.arange(10 * 13 * 3, dtype=np.int64) * 37 % 256).astype(
        np.uint8
    ).reshape(10, 13, 3)
    assert (codecs.png_decode(codecs.png_encode(arr)) == arr).all()


def test_png_crc_rejected():
    enc = bytearray(codecs.png_encode(np.zeros((4, 4), np.uint8)))
    enc[-6] ^= 0x55  # flip a byte inside IEND/IDAT tail
    with pytest.raises(ValueError):
        codecs.png_decode(bytes(enc))


def test_png_bad_signature_rejected():
    with pytest.raises(ValueError):
        codecs.png_decode(b"NOTPNG..")


def test_resize_nearest_matches_index_formula():
    arr = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3)
    out = codecs.resize_nearest(arr, 7, 9)
    for y2 in range(9):
        for x2 in range(7):
            assert (out[y2, x2] == arr[(y2 * 20) // 9, (x2 * 30) // 7]).all()


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1234).astype(np.int16)
    out, rate = codecs.wav_decode(codecs.wav_encode(s, 16000))
    assert rate == 16000
    assert (out == s).all()


def test_wav_empty():
    out, rate = codecs.wav_decode(codecs.wav_encode(np.array([], np.int16), 8000))
    assert rate == 8000 and len(out) == 0


try:
    from hypothesis import given, settings, strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False


if _HAS_HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        ch=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_png_roundtrip_property(h, w, ch, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = codecs.png_decode(codecs.png_encode(arr))
        assert out.shape == arr.shape and (out == arr).all()

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(0, 2048),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_wav_roundtrip_property(n, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        out, r = codecs.wav_decode(codecs.wav_encode(s, rate))
        assert r == rate and (out == s).all()


def _local_image_rows(doc_ids):
    rows = {}
    for d in doc_ids:
        if d % 2:
            continue
        img = mm._synth_image(d)
        h, w, _ = img.shape
        rows[d] = (w, h, int(img.sum(dtype=np.int64)))
    return rows


def test_spark_image_decode_matches_local(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "src") for i in range(20)],
        "doc_id long, text string, source string",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    got = {
        r["media_id"]: (r["width"], r["height"], r["pixel_sum"])
        for r in mm.q_multimodal_image_decode(spark, str(tmp_path)).collect()
    }
    assert got == _local_image_rows(range(20))


def test_spark_audio_frames_match_local(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "src") for i in range(10)],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = mm.q_multimodal_audio_frames(spark, str(tmp_path)).collect()
    # recompute one doc fully locally
    d = 3
    samples, _ = mm._synth_audio(d)
    absd = np.abs(samples.astype(np.int64))
    want = {}
    n_frames = (len(samples) + mm.AUD_FRAME - 1) // mm.AUD_FRAME
    for fi in range(0, n_frames, mm.AUD_FRAME_EVERY):
        seg = absd[fi * mm.AUD_FRAME:(fi + 1) * mm.AUD_FRAME]
        want[fi] = (len(seg), int(seg.sum()))
    got = {
        r["frame_idx"]: (r["frame_len"], r["frame_abs_sum"])
        for r in rows
        if r["media_id"] == d
    }
    assert got == want
    # only even frame indices survive sampling, odd-doc ids only
    assert all(r["frame_idx"] % mm.AUD_FRAME_EVERY == 0 for r in rows)
    assert all(r["media_id"] % 2 == 1 for r in rows)


def test_png_decode_rejects_truncated_input():
    """Truncated/malformed chunk streams must raise a clean ValueError
    (not struct.error or a silent short-slice that only CRC catches)."""
    import numpy as np
    import pytest

    from search_engine_spark.functions import codecs

    blob = codecs.png_encode(
        np.arange(48, dtype="uint8").reshape(4, 4, 3)
    )
    for cut in (9, 15, len(blob) - 5):
        with pytest.raises(ValueError, match="truncated"):
            codecs.png_decode(blob[:cut])
