"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as ``large_binary`` payload columns with typed
metadata, processed by actor-pool ``map_batches`` stages. Decode
status per modality in this container:

- **image: REAL** for PPM (P6) — a from-scratch stdlib parser; PIL is
  used instead when importable (it is not here), and the legacy FIMG
  synthetic header remains as a fallback. ``synthesize_media`` emits
  real PPM payloads.
- **audio: REAL** for WAV (PCM16) via the stdlib ``wave`` module;
  FAUD synthetic fallback kept. ``synthesize_media`` emits real WAV.
- **video: REAL** for Y4M (YUV4MPEG2, C420) — an uncompressed
  plain-text-header raw-frame format, parsed from scratch with
  numpy; the legacy FVID synthetic header remains as a fallback;
  compressed codecs raise ``NotImplementedError`` (ffmpeg absent).
  ``synthesize_media`` emits real Y4M.

Scale notes (wide binary rows): batches are kept SMALL
(``batch_size≈32``) and stages run ``batch_format="pyarrow"`` so
payloads stay in Arrow buffers; when payloads are ~MB-scale, also
raise ``DataContext.target_max_block_size`` so blocks aren't split
absurdly small (ray_guide "Pitfalls").

Synthetic fallback payload formats (deterministic, seed-stable):
- image: ``b"FIMG" + u16 width + u16 height + u8 channels + bytes``
- audio: ``b"FAUD" + u32 sample_rate + u32 n_samples + bytes``
- video: ``b"FVID" + u16 n_frames + u16 width + u16 height + bytes``
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64

MEDIA = pa.schema([
    ("media_id", pa.int64()),
    ("doc_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
])


def _make_ppm(w: int, h: int, seed: int) -> bytes:
    """Real PPM (P6) payload with deterministic pixels."""
    rng = np.random.RandomState(seed % (1 << 32))
    body = rng.randint(0, 256, w * h * 3, dtype=np.int64).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode("ascii") + body.tobytes()


def _make_wav(sr: int, ns: int, seed: int) -> bytes:
    """Real WAV (PCM16 mono) payload: seeded sine + noise."""
    import io
    import wave

    rng = np.random.RandomState(seed % (1 << 32))
    t = np.arange(ns, dtype=np.float64) / sr
    freq = 200 + (seed % 800)
    sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(ns)
    pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _make_y4m(w: int, h: int, nf: int, seed: int) -> bytes:
    """Real Y4M (YUV4MPEG2, C420jpeg) payload: ASCII stream header,
    ``FRAME\\n`` markers, raw 4:2:0 planes. ``w``/``h`` must be even."""
    rng = np.random.RandomState(seed % (1 << 32))
    fsz = w * h + 2 * ((w // 2) * (h // 2))
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode("ascii")]
    for _ in range(nf):
        out.append(b"FRAME\n")
        out.append(rng.randint(0, 256, fsz, dtype=np.int64)
                   .astype(np.uint8).tobytes())
    return b"".join(out)


def _decode_y4m(payload: bytes):
    """REAL Y4M decode, stdlib+numpy only: → (w, h, [luma planes]) —
    each luma plane a (h, w) uint8 array (chroma planes are skipped;
    the feature stages only use luma)."""
    nl = payload.index(b"\n")
    tokens = payload[:nl].decode("ascii").split()
    if tokens[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    params = {t[0]: t[1:] for t in tokens[1:]}
    w, h = int(params["W"]), int(params["H"])
    # 8-BIT 4:2:0 only: C420p10/p12/p16 use 2 bytes/sample, so the 8-bit
    # frame-size arithmetic below would land mid-frame (or return the low
    # bytes of 10-bit samples as garbage luma) — refuse loudly instead
    if params.get("C", "420jpeg") not in ("420", "420jpeg", "420mpeg2",
                                          "420paldv"):
        raise NotImplementedError(
            f"only 8-bit C420 Y4M supported, got C{params.get('C')}")
    fsz = w * h + 2 * ((w // 2) * (h // 2))
    pos, frames = nl + 1, []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("missing FRAME marker")
        start = fnl + 1
        frames.append(np.frombuffer(payload, np.uint8, count=w * h,
                                    offset=start).reshape(h, w))
        pos = start + fsz
    return w, h, frames


def synthesize_media(n: int = 64, seed_tag: str = "media") -> pa.Table:
    """Deterministic media table (counter-based like sitegen): REAL PPM
    images, WAV audio and Y4M video."""
    rows = {k: [] for k in ("media_id", "doc_id", "kind", "payload", "mime")}
    for i in range(n):
        kind = ("image", "audio", "video")[hash64(f"{seed_tag}:k:{i}") % 3]
        if kind == "image":
            w = 16 + hash64(f"{seed_tag}:w:{i}") % 48
            h = 16 + hash64(f"{seed_tag}:h:{i}") % 48
            payload = _make_ppm(w, h, hash64(f"{seed_tag}:px:{i}"))
            mime = "image/x-portable-pixmap"
        elif kind == "audio":
            sr = 8000 * (1 + hash64(f"{seed_tag}:sr:{i}") % 3)
            ns = 1000 + hash64(f"{seed_tag}:ns:{i}") % 9000
            payload = _make_wav(sr, ns, hash64(f"{seed_tag}:au:{i}"))
            mime = "audio/wav"
        else:
            w = 16 + 2 * (hash64(f"{seed_tag}:vw:{i}") % 9)   # even, 16-32
            h = 16 + 2 * (hash64(f"{seed_tag}:vh:{i}") % 9)
            nf = 8 + hash64(f"{seed_tag}:nf:{i}") % 56
            payload = _make_y4m(w, h, nf, hash64(f"{seed_tag}:vf:{i}"))
            mime = "video/x-yuv4mpeg"
        rows["media_id"].append(i)
        rows["doc_id"].append(i % max(1, n // 4))
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "payload": pa.array(rows["payload"], pa.large_binary()),
        "mime": pa.array(rows["mime"], pa.string()),
    }, schema=MEDIA)


def _fake_pixels(payload: bytes) -> np.ndarray:
    """STUB image decode: (h, w, c) uint8 array deterministically derived
    from the payload bytes. Replace with PIL.Image.open for real data."""
    w, h, c = struct.unpack("<HHB", payload[4:9])
    body = np.frombuffer(payload[9:], dtype=np.uint8)
    reps = int(np.ceil(h * w * c / len(body)))
    return np.tile(body, reps)[: h * w * c].reshape(h, w, c)


def _decode_ppm(payload: bytes) -> np.ndarray:
    """REAL PPM (P6) decode, stdlib-only: parse the ASCII header
    (whitespace/comment tolerant), view the raster as (h, w, 3)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":           # comment to EOL
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                       # single ws after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


class ImageDecode:
    """Actor-pool stage: payload → (height, width, channels, mean_pixel).
    PPM (P6) decoded for REAL by the stdlib parser above; PIL handles
    other formats when importable (not in this container); the
    synthetic FIMG fallback covers legacy fixtures."""

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this sandbox
            from PIL import Image  # type: ignore

            self._real = Image
        except ImportError:
            self._real = None

    def decode(self, payload: bytes) -> np.ndarray:
        if payload.startswith(b"P6"):
            return _decode_ppm(payload)
        if payload.startswith(b"FIMG"):
            return _fake_pixels(payload)
        if self._real is not None:  # pragma: no cover
            import io

            return np.asarray(self._real.open(io.BytesIO(payload)))
        raise NotImplementedError(
            "image format not decodable in this container (PPM and the "
            "synthetic FIMG header are; PIL would handle the rest)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ws, cs, means = [], [], [], []
        for payload in batch["payload"].to_pylist():
            px = self.decode(payload)
            hs.append(px.shape[0]); ws.append(px.shape[1]); cs.append(px.shape[2])
            means.append(round(float(px.mean()), 4))
        return pa.table({
            "media_id": batch["media_id"], "doc_id": batch["doc_id"],
            "height": pa.array(hs, pa.int32()), "width": pa.array(ws, pa.int32()),
            "channels": pa.array(cs, pa.int32()),
            "mean_pixel": pa.array(means, pa.float64()),
        })


class ImageResize:
    """Actor-pool stage: decode + mean-pool resize to (target, target) —
    the canonical preprocess-for-training shape. Emits the resized
    pixels as a fixed-size list<uint8> column."""

    def __init__(self, target: int = 8):
        self.target = target
        self.decoder = ImageDecode()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        t = self.target
        for payload in batch["payload"].to_pylist():
            px = self.decoder.decode(payload).astype(np.float32)
            h, w, c = px.shape
            ys = (np.arange(t) * h // t)
            xs = (np.arange(t) * w // t)
            small = px[ys][:, xs].mean(axis=2).astype(np.uint8)  # grayscale pool
            out.append(small.ravel().tolist())
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pa.array(out, pa.list_(pa.uint8(), self.target * self.target)),
        })


class FrameSample:
    """Actor-pool stage: video payload → one row per sampled frame
    (every ``stride``-th), the explode-shaped transform of the family.
    Y4M (YUV4MPEG2) decoded for REAL — sampled frames report their mean
    luma; the legacy FVID synthetic header is a metadata-only fallback
    (``mean_y = -1.0``); compressed codecs raise (no ffmpeg here)."""

    def __init__(self, stride: int = 8):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, hs, ws, my = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            if payload.startswith(b"YUV4MPEG2"):
                w, h, frames = _decode_y4m(payload)
                for f in range(0, len(frames), self.stride):
                    mids.append(mid); fidx.append(f); hs.append(h); ws.append(w)
                    my.append(round(float(frames[f].mean()), 4))
            elif payload.startswith(b"FVID"):
                nf, w, h = struct.unpack("<HHH", payload[4:10])
                for f in range(0, nf, self.stride):
                    mids.append(mid); fidx.append(f); hs.append(h); ws.append(w)
                    my.append(-1.0)     # synthetic header carries no raster
            else:
                raise NotImplementedError(
                    "video format not decodable in this container (Y4M and "
                    "the synthetic FVID header are; ffmpeg would handle "
                    "compressed codecs)")
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "mean_y": pa.array(my, pa.float64()),
        })


class AudioFeatures:
    """Actor-pool stage: audio payload → (sample_rate, n_samples,
    duration_sec, rms). WAV (PCM16) decoded for REAL via the stdlib
    ``wave`` module; FAUD synthetic fallback kept."""

    @staticmethod
    def decode(payload: bytes):
        """→ (sample_rate, n_samples, float samples in [-1, 1])."""
        if payload.startswith(b"RIFF"):
            import io
            import wave

            with wave.open(io.BytesIO(payload), "rb") as wf:
                sr = wf.getframerate()
                ns = wf.getnframes()
                raw = wf.readframes(ns)
                if wf.getsampwidth() != 2:
                    raise NotImplementedError("only PCM16 WAV supported")
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
                if wf.getnchannels() > 1:
                    x = x.reshape(-1, wf.getnchannels()).mean(axis=1)
            return sr, ns, x
        if payload.startswith(b"FAUD"):
            sr, ns = struct.unpack("<II", payload[4:12])
            raw = np.frombuffer(payload[12:], dtype=np.uint8).astype(np.float64)
            x = (raw - 128.0) / 128.0   # honor the [-1, 1] contract so
            #                             rms is comparable with WAV rows
            return sr, ns, x
        raise NotImplementedError("audio format not decodable here "
                                  "(WAV/PCM16 and synthetic FAUD are)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        srs, nss, durs, rms = [], [], [], []
        for payload in batch["payload"].to_pylist():
            sr, ns, x = self.decode(payload)
            srs.append(sr); nss.append(ns)
            durs.append(round(ns / sr, 6))
            rms.append(round(float(np.sqrt((x ** 2).mean())), 4))
        return pa.table({
            "media_id": batch["media_id"],
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(nss, pa.int64()),
            "duration_sec": pa.array(durs, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
        })


def media_features(media_path_or_table, *, stride: int = 8):
    """ONE table over all three modalities — the driver-checked surface
    for the media family. Each kind runs its real decoder (PPM / WAV /
    Y4M) through the usual actor-pool pipeline, then adapts to a common
    summary schema: (media_id, kind, width, height, n_units, feat) with
    n_units = channels / samples / sampled-frames and feat = mean_pixel
    / rms / mean-of-sampled-frame-luma; -1 where a field doesn't apply.
    The per-media video aggregate coalesces one row per SAMPLED FRAME
    into one per media item — media count is bounded here (synthetic
    set); at corpus scale bucket it like the events finishes."""
    import pandas as pd
    import ray.data as rd

    def img_adapt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "media_id": b["media_id"],
            "kind": pa.array(["image"] * n, pa.string()),
            "width": b["width"].cast(pa.int32()),
            "height": b["height"].cast(pa.int32()),
            "n_units": b["channels"].cast(pa.int64()),
            "feat": b["mean_pixel"].cast(pa.float64()),
        })

    def aud_adapt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        neg = pa.array([-1] * n, pa.int32())
        return pa.table({
            "media_id": b["media_id"],
            "kind": pa.array(["audio"] * n, pa.string()),
            "width": neg, "height": neg,
            "n_units": b["n_samples"].cast(pa.int64()),
            "feat": b["rms"].cast(pa.float64()),
        })

    def vid_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["media_id", "width", "height"], as_index=False) \
            .agg(n_units=("frame_idx", "size"), feat_sum=("mean_y", "sum"))

    def vid_finish(b: pd.DataFrame) -> pa.Table:
        # Arrow out: the union with the image/audio branches must be
        # block-type homogeneous (Ray's sort sampler asserts it)
        g = b.groupby(["media_id", "width", "height"], as_index=False) \
            .agg(n_units=("n_units", "sum"), feat_sum=("feat_sum", "sum"))
        return pa.table({
            "media_id": pa.array(g["media_id"].to_numpy(), pa.int64()),
            "kind": pa.array(["video"] * len(g), pa.string()),
            "width": pa.array(g["width"].to_numpy(), pa.int32()),
            "height": pa.array(g["height"].to_numpy(), pa.int32()),
            "n_units": pa.array(g["n_units"].to_numpy(), pa.int64()),
            "feat": pa.array((g["feat_sum"] / g["n_units"]).round(4)
                             .to_numpy(), pa.float64()),
        })

    img = media_pipeline(media_path_or_table, "image", ImageDecode) \
        .map_batches(img_adapt, batch_format="pyarrow")
    aud = media_pipeline(media_path_or_table, "audio", AudioFeatures) \
        .map_batches(aud_adapt, batch_format="pyarrow")
    vid = media_pipeline(media_path_or_table, "video", FrameSample,
                         stride=stride) \
        .map_batches(vid_partial, batch_format="pandas") \
        .repartition(1).map_batches(vid_finish, batch_format="pandas")
    return img.union(aud).union(vid).sort(["media_id", "kind"])


def media_pipeline(media_path_or_table, kind: str, stage_cls, *,
                   batch_size: int = 32, concurrency: int = 4, **stage_kwargs):
    """read media → filter kind → actor-pool stage. Accepts a parquet
    path or an in-memory Arrow table (tests)."""
    import ray.data as rd

    if isinstance(media_path_or_table, str):
        # parquet reads already split into size-based blocks; forcing a
        # repartition here would shuffle the raw media bytes for nothing
        ds = rd.read_parquet(media_path_or_table)
    else:
        # from_arrow yields ONE block and task parallelism == block
        # count (CLAUDE.md: repartition before CPU-heavy map_batches):
        # without this the whole actor pool decodes serially in one task
        ds = rd.from_arrow(media_path_or_table) \
            .repartition(concurrency * 2)
    return ds.filter(expr=f"kind == '{kind}'") \
        .map_batches(stage_cls, fn_constructor_kwargs=stage_kwargs,
                     batch_format="pyarrow", batch_size=batch_size,
                     concurrency=(1, concurrency), num_cpus=1)
