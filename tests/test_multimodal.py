"""Multimodal plumbing: binary payload columns + stubbed decode via
Arrow-batched mapInPandas (operators/multimodal.py).

The codec is a deterministic fake (no image/audio libs in this
container); these tests pin the fake's contract AND the distributed
plumbing (schemas, fan-out shape, byte-exact hashing vs hashlib).
"""

from __future__ import annotations

import hashlib

import pytest

from vul_dbgen_spark.operators.multimodal import (
    AUDIO_SCHEMA,
    FRAME_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    _fake_decode,
    _try_real_decode,
    audio_features,
    frame_sample,
    image_features,
    synth_media,
)

TEXTS = [
    (0, "hello multimodal world"),
    (1, "x" * 200),
    (2, ""),
    (3, "short"),
]


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    return synth_media(df, "doc_id", "text")


def test_decode_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        _try_real_decode(b"\x89PNG")


def test_synth_media_schema_and_meta(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "media_type",
        "payload",
        "meta",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    rows = {r.media_id: r for r in media.collect()}
    assert bytes(rows[0].payload) == b"hello multimodal world"
    assert rows[1].meta.n_bytes == 200
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"


def test_image_features_match_reference(media):
    out = image_features(media)
    assert out.schema == IMAGE_FEATURES_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    for doc_id, text in TEXTS:
        b = text.encode()
        w, h, c = _fake_decode(b)
        r = rows[doc_id]
        assert (r.n_bytes, r.width, r.height, r.channels) == (len(b), w, h, c)
        assert r.sha16 == hashlib.sha256(b).hexdigest()[:16]


def test_frame_sample_fanout_and_bytes(media):
    out = frame_sample(media, frame_bytes=64, every_k=2)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    # 200-byte payload → 4 frames → sampled idx {0, 2}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 2]
    f2 = next(r for r in by_doc[1] if r.frame_idx == 2)
    seg = (b"x" * 200)[128:192]
    assert f2.frame_len == 64
    assert f2.frame_sha16 == hashlib.sha256(seg).hexdigest()[:16]
    # empty payload → zero frames
    assert 2 not in by_doc


def test_audio_features_duration_format(media):
    out = audio_features(media, sample_rate=16000)
    assert out.schema == AUDIO_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].duration_s == f"{200 / 16000:.6f}"
    b = TEXTS[0][1].encode()
    assert rows[0].mean_byte == sum(b) // len(b)
    assert rows[2].mean_byte == 0


# ---------------------------------------------------------------------------
# real header parsing (no codec)
# ---------------------------------------------------------------------------


def test_parse_header_corrupt_and_truncated_inputs():
    from vul_dbgen_spark.operators.multimodal import _parse_header

    assert _parse_header(b"")[0] == "unknown"
    assert _parse_header(b"\x00" * 32)[0] == "unknown"
    # right magic, truncated structure: format sniffed, fields None
    assert _parse_header(b"\x89PNG\r\n\x1a\n") == ("png", None, None, None)
    assert _parse_header(b"\xff\xd8\xff") == ("jpeg", None, None, None)
    assert _parse_header(b"RIFF\x04\x00\x00\x00WAVE") == ("wav", None, None, None)


def test_probe_recovers_ground_truth_distributed(spark):
    from vul_dbgen_spark.operators.multimodal import (
        probe_media_headers,
        synth_containers,
    )

    ids = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    got = {
        r["media_id"]: (r["format"], r["width"], r["height"], r["sample_rate"])
        for r in probe_media_headers(synth_containers(ids, "doc_id")).collect()
    }
    assert len(got) == 120
    for i in range(120):
        kind = i % 3
        if kind == 0:
            assert got[i] == ("png", 100 + i % 900, 100 + (i * 7) % 900, None)
        elif kind == 1:
            assert got[i] == ("jpeg", 64 + i % 512, 64 + (i * 3) % 512, None)
        else:
            assert got[i] == ("wav", None, None, 8000 + (i % 5) * 2000)


def test_pcm_features_exact_on_known_waveform(spark):
    from vul_dbgen_spark.operators.multimodal import (
        pcm_audio_features,
        synth_wav_pcm,
    )
    import numpy as np

    ids = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    got = {
        r["media_id"]: r
        for r in pcm_audio_features(synth_wav_pcm(ids, "doc_id")).collect()
    }
    for i in range(30):
        v = np.array([((i * 31 + j * 17) % 65536) - 32768 for j in range(256)])
        signs = np.where(v >= 0, 1, -1)
        r = got[i]
        assert r["sample_rate"] == 8000 + (i % 5) * 2000
        assert r["n_samples"] == 256
        assert r["peak_amp"] == int(np.max(np.abs(v)))
        assert r["zero_cross"] == int(np.count_nonzero(signs[1:] != signs[:-1]))
        assert abs(r["rms"] - float(np.sqrt(np.sum(v * v) / 256))) == 0.0
