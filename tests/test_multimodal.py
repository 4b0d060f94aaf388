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
