"""Multimodal stages: real Ray plumbing over stubbed decoders."""

import numpy as np
import pytest

from olx_ray.pipelines.multimodal import (AudioFeatures, FrameSample,
                                          ImageDecode, ImageResize,
                                          media_pipeline, synthesize_media)


@pytest.fixture(scope="module")
def media():
    return synthesize_media(96)


def test_synthesize_deterministic(media):
    again = synthesize_media(96)
    assert media.equals(again)
    kinds = set(media["kind"].to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_image_decode_pipeline(ray_session, media):
    out = media_pipeline(media, "image", ImageDecode).to_pandas()
    n_images = media.to_pandas().kind.eq("image").sum()
    assert len(out) == n_images
    assert set(out.columns) == {"media_id", "doc_id", "height", "width",
                                "channels", "mean_pixel"}
    assert (out["height"] >= 16).all() and (out["channels"] == 3).all()
    # deterministic across runs
    out2 = media_pipeline(media, "image", ImageDecode).to_pandas()
    assert out.sort_values("media_id").reset_index(drop=True).equals(
        out2.sort_values("media_id").reset_index(drop=True))


def test_image_resize_fixed_shape(ray_session, media):
    out = media_pipeline(media, "image", ImageResize, target=8).to_pandas()
    assert all(len(p) == 64 for p in out["pixels"])


def test_frame_sample_explodes(ray_session, media):
    out = media_pipeline(media, "video", FrameSample, stride=8).to_pandas()
    assert len(out) > media.to_pandas().kind.eq("video").sum()  # >1 frame/video
    assert (out["frame_idx"] % 8 == 0).all()


def test_audio_features(ray_session, media):
    out = media_pipeline(media, "audio", AudioFeatures).to_pandas()
    assert np.allclose(out["duration_sec"],
                       out["n_samples"] / out["sample_rate"], atol=1e-5)
    assert (out["rms"] > 0).all()


def test_decode_rejects_unknown_format():
    dec = ImageDecode()
    with pytest.raises(NotImplementedError):
        dec.decode(b"\x89PNG not really")


def test_ppm_roundtrip_real_decode():
    """The PPM payload is a REAL image format: decode must return the
    exact pixels that were encoded."""
    from olx_ray.pipelines.multimodal import _decode_ppm, _make_ppm

    px = _decode_ppm(_make_ppm(5, 3, seed=7))
    assert px.shape == (3, 5, 3)
    again = _decode_ppm(_make_ppm(5, 3, seed=7))
    assert (px == again).all()
    # comment + whitespace tolerant header
    manual = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    assert (_decode_ppm(manual).ravel() == np.arange(12, dtype=np.uint8)).all()


def test_wav_real_decode():
    """WAV payloads decode through the stdlib wave module with correct
    rate/frames and near-sine RMS (~0.5/sqrt(2))."""
    from olx_ray.pipelines.multimodal import AudioFeatures, _make_wav

    sr, ns, x = AudioFeatures.decode(_make_wav(16000, 8000, seed=3))
    assert sr == 16000 and ns == 8000 and len(x) == 8000
    assert abs(x).max() <= 1.0
    assert 0.25 < np.sqrt((x ** 2).mean()) < 0.55


def test_y4m_roundtrip_real_decode():
    """Y4M is a REAL video format: the decoder must return the exact
    luma planes that were encoded, frame count and geometry intact."""
    from olx_ray.pipelines.multimodal import _decode_y4m, _make_y4m

    w, h, nf = 16, 12, 5
    payload = _make_y4m(w, h, nf, seed=11)
    dw, dh, frames = _decode_y4m(payload)
    assert (dw, dh, len(frames)) == (w, h, nf)
    assert all(f.shape == (h, w) for f in frames)
    # deterministic + exact: re-encode with the same seed and compare
    _, _, again = _decode_y4m(_make_y4m(w, h, nf, seed=11))
    assert all((a == b).all() for a, b in zip(frames, again))
    # hand-built stream: known luma values survive the roundtrip
    fsz = w * h + 2 * ((w // 2) * (h // 2))
    manual = (f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
              + b"FRAME\n" + bytes([7] * fsz))
    assert (_decode_y4m(manual)[2][0] == 7).all()


def test_frame_sample_mean_luma_real(ray_session, media):
    out = media_pipeline(media, "video", FrameSample, stride=8).to_pandas()
    assert ((out["mean_y"] >= 0) & (out["mean_y"] <= 255)).all()
    # random uint8 luma → mean near 127.5
    assert (out["mean_y"] - 127.5).abs().max() < 30


def test_media_features_spec_derived_golden(ray_session):
    """The driver's media_features surface pinned against generator
    SPECS: expected (kind, width, height, n_units, feat) recomputed
    straight from the seeds — same RNG streams as synthesize_media but
    NO PPM/WAV/Y4M bytes are built or parsed, so the byte encoders,
    the three real decoders, the kind filters, the strided frame
    sampler and the union/aggregate plumbing are all under test
    (upgrades the entry from rows-only to golden conformance, the
    crawl-goldens discipline). The golden recomputation lives in
    ``sources.goldens.golden_media_features`` — shared with the
    driver's DuckDB VALUES oracle (``__ray_entry__``), so the entry
    and this pin can't drift apart."""
    from olx_ray.pipelines.multimodal import media_features, synthesize_media
    from olx_ray.sources.goldens import golden_media_features

    n, tag, stride = 256, "media", 8
    want = {r["media_id"]: (r["kind"], r["width"], r["height"],
                            r["n_units"], r["feat"])
            for r in golden_media_features(n, tag, stride)}

    out = media_features(synthesize_media(n, tag)).to_pandas()
    assert len(out) == n and out["media_id"].is_unique
    for r in out.itertuples(index=False):
        assert (r.kind, r.width, r.height, r.n_units, r.feat) \
            == want[r.media_id], r
