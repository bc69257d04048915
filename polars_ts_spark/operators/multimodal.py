"""Multimodal-column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The decode step is STUBBED (the real image/audio codecs are not in
this container): ``decode_image`` produces a deterministic fake
"decoded" tensor derived from the payload bytes, clearly marked. The
Spark-side plumbing — schema, batch iteration, partition sizing,
UDF signatures — is real and tested; swapping the stub for
PIL/ffmpeg is a one-function change.

Scale notes (100 TB):
- Binary payloads ride in parquet as-is; the mapInPandas kernel sees
  Arrow record batches, so bytes are never row-pickled.
- ``spark.sql.files.maxPartitionBytes`` bounds per-task payload
  memory; decode output (frames/features) is typically larger than
  input — emit one row per frame and let downstream repartition.
- Feature columns come back as array<float> ready for embedsim ops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# payload construction (the synthetic corpus has no binary column; we
# derive one from text so the plumbing is exercised on real data)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """[id, payload: binary, media_type, n_bytes] — opaque blob column
    plus typed metadata, the canonical multimodal row shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(payload).alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# decode stub

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", ArrayType(FloatType())),
    ]
)

_FAKE_W, _FAKE_H, _FAKE_C = 4, 4, 3


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from md5(payload).
    The signature (bytes -> HxWxC float32 array) is the decoder
    contract; see _pil_decode for the real-codec implementation."""
    h = hashlib.md5(payload).digest()
    seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    n = _FAKE_W * _FAKE_H * _FAKE_C
    reps = int(np.ceil(n / len(seed)))
    return np.tile(seed, reps)[:n].reshape(_FAKE_H, _FAKE_W, _FAKE_C) / 255.0


def _pil_decode(payload: bytes) -> np.ndarray:
    """Real-codec decoder (PIL): bytes -> HxWxC float32 in [0, 1].
    Grayscale is widened to one channel, palettes converted to RGB."""
    import io

    from PIL import Image  # noqa: PLC0415 - optional dependency

    img = Image.open(io.BytesIO(payload))
    if img.mode in ("P", "CMYK", "YCbCr"):
        img = img.convert("RGB")
    a = np.asarray(img, dtype=np.float32) / 255.0
    if a.ndim == 2:
        a = a[:, :, None]
    return a


def _resolve_decoder(decoder):
    """decoder: 'stub' | 'pil' | 'auto' | callable(bytes)->ndarray.
    'auto' picks PIL when importable, else the deterministic stub."""
    if callable(decoder):
        return decoder
    if decoder == "stub":
        return _fake_decode
    if decoder == "pil":
        return _pil_decode
    if decoder == "auto":
        try:
            import PIL  # noqa: F401, PLC0415

            return _pil_decode
        except ImportError:
            return _fake_decode
    raise ValueError(f"unknown decoder {decoder!r}")


def decode_image(df: DataFrame, id_col: str = "doc_id", decoder="stub") -> DataFrame:
    """Decode binary payloads to float tensors via mapInPandas
    (Arrow-batched; bytes never row-pickled).
    Output [doc_id, width, height, channels, pixels].

    ``decoder``: 'stub' (deterministic md5 pseudo-pixels, the default —
    reproducible without codecs), 'pil' (real codec, import-guarded),
    'auto', or any callable matching the bytes -> HxWxC float32
    contract. Real decodes are variable-shape; the per-row
    width/height/channels metadata carries the shape downstream."""
    decode = _resolve_decoder(decoder)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, cs, pxs = [], [], [], []
            for p in pdf["payload"]:
                a = decode(bytes(p))
                hs.append(a.shape[0])
                ws.append(a.shape[1])
                cs.append(a.shape[2])
                pxs.append(a.ravel().tolist())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "width": ws,
                "height": hs,
                "channels": cs,
                "pixels": pxs,
            })

    return df.mapInPandas(kernel, DECODED_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(decoded: DataFrame) -> DataFrame:
    """Per-image feature vector (channel means/stds + a 4-bin
    histogram per channel): the standard decode -> featurize hop.
    Output [doc_id, features: array<double>] — feeds embedsim ops.
    Statistics accumulate in float64 (pixels stay float32 storage):
    float32 accumulation order is not reproducible across engines,
    float64 over float32 inputs is."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for px, c in zip(pdf["pixels"], pdf["channels"]):
                a = np.asarray(px, dtype=np.float64).reshape(-1, int(c))
                hist = [
                    np.histogram(a[:, ch], bins=4, range=(0, 1))[0] / a.shape[0]
                    for ch in range(int(c))
                ]
                f = np.concatenate([a.mean(axis=0), a.std(axis=0), *hist])
                feats.append(f.tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return decoded.mapInPandas(kernel, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def resize_image(decoded: DataFrame, out_w: int = 2, out_h: int = 2) -> DataFrame:
    """Block-mean downsample of decoded tensors (the resize hop of an
    image pipeline): non-overlapping (h/out_h, w/out_w) blocks averaged
    per channel, accumulated in float64. Same [doc_id, width, height,
    channels, pixels] schema so resize composes with extract_features.
    Works on any decoder output — the stub's fake tensors here, real
    codec output in production.

    Only DOWNSAMPLING is supported (block-mean cannot upsample): rows
    with height < out_h or width < out_w raise a clear ValueError.
    Defaults (2x2) fit the in-repo stub decoder's 4x4 output."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for px, w, h, c in zip(
                pdf["pixels"], pdf["width"], pdf["height"], pdf["channels"]
            ):
                w, h, c = int(w), int(h), int(c)
                if h < out_h or w < out_w:
                    raise ValueError(
                        f"resize_image only downsamples: input {h}x{w} is "
                        f"smaller than requested {out_h}x{out_w}"
                    )
                fy, fx = max(h // out_h, 1), max(w // out_w, 1)
                a = np.asarray(px, dtype=np.float64).reshape(h, w, c)
                a = a[: out_h * fy, : out_w * fx]
                r = a.reshape(out_h, fy, out_w, fx, c).mean(axis=(1, 3))
                out_px.append(r.ravel().tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": out_w,
                    "height": out_h,
                    "channels": pdf["channels"],
                    "pixels": out_px,
                }
            )

    return decoded.mapInPandas(kernel, DECODED_SCHEMA)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Video-style frame sampling stub: slice the payload into
    fixed-size "frames", emit one row per sampled frame (fan-out —
    rows out > rows in, the shape a real frame sampler has).
    Output [doc_id, frame_idx, frame: binary]."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                b = bytes(p)
                for fi, off in enumerate(range(0, len(b), every_n_bytes)):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(b[off : off + every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(kernel, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# decoded video frame sampling (real-codec path, import-guarded)

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", ArrayType(FloatType())),
    ]
)

# the stub "container" format: raw concatenated 4x4x3 uint8 frames
_STUB_FRAME_BYTES = _FAKE_W * _FAKE_H * _FAKE_C


def _stub_video_decode(payload: bytes) -> Iterator[np.ndarray]:
    """Deterministic fake video decoder: the payload is read as
    concatenated raw 4x4x3 uint8 frames (trailing partial frame
    zero-padded) — same tensor contract as the real path, no codecs."""
    b = bytes(payload)
    for off in range(0, len(b), _STUB_FRAME_BYTES):
        chunk = b[off : off + _STUB_FRAME_BYTES]
        if len(chunk) < _STUB_FRAME_BYTES:
            chunk = chunk + b"\x00" * (_STUB_FRAME_BYTES - len(chunk))
        a = np.frombuffer(chunk, dtype=np.uint8).astype(np.float32) / 255.0
        yield a.reshape(_FAKE_H, _FAKE_W, _FAKE_C)


def _av_video_decode(payload: bytes) -> Iterator[np.ndarray]:  # pragma: no cover
    """Real-codec video decoder (PyAV/ffmpeg): bytes -> RGB frame
    tensors in [0, 1]. Import-guarded — ffmpeg bindings are not in
    this container; the tensor contract matches _stub_video_decode."""
    import io

    import av  # noqa: PLC0415 - optional dependency

    with av.open(io.BytesIO(payload)) as container:
        for frame in container.decode(video=0):
            yield frame.to_ndarray(format="rgb24").astype(np.float32) / 255.0


def _resolve_video_decoder(decoder):
    """'stub' | 'av' | 'auto' | callable(bytes) -> iterator of HxWxC."""
    if callable(decoder):
        return decoder
    if decoder == "stub":
        return _stub_video_decode
    if decoder == "av":
        try:
            import av  # noqa: F401, PLC0415
        except ImportError as e:
            raise ImportError(
                "PyAV (ffmpeg bindings) is required for decoder='av'; use "
                "decoder='stub' or pass a callable matching the "
                "bytes -> iterator-of-HxWxC-float32 contract"
            ) from e
        return _av_video_decode
    if decoder == "auto":
        try:
            import av  # noqa: F401, PLC0415

            return _av_video_decode
        except ImportError:
            return _stub_video_decode
    raise ValueError(f"unknown video decoder {decoder!r}")


def sample_video_frames(
    df: DataFrame,
    every_n_frames: int = 2,
    max_frames: int | None = None,
    id_col: str = "doc_id",
    decoder="stub",
) -> DataFrame:
    """DECODED frame sampling: run the video decoder over each payload,
    keep every ``every_n_frames``-th frame (0, n, 2n, ...; at most
    ``max_frames`` of them), and emit one tensor row per kept frame —
    [doc_id, frame_idx, width, height, channels, pixels], the same
    tensor shape as decode_image so the rows compose with resize_image
    and extract_features. The fan-out (rows out > rows in) and the
    per-row shape metadata are the real video-pipeline contract;
    ``decoder='av'`` is the import-guarded ffmpeg path, 'stub' the
    deterministic raw-frame parser, and any callable can plug in."""
    if every_n_frames < 1:
        raise ValueError(f"every_n_frames must be >= 1, got {every_n_frames}")
    decode = _resolve_video_decoder(decoder)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, cs, pxs = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                kept = 0
                for fi, a in enumerate(decode(bytes(p))):
                    if fi % every_n_frames:
                        continue
                    if max_frames is not None and kept >= max_frames:
                        break
                    kept += 1
                    ids.append(i)
                    idxs.append(fi)
                    hs.append(a.shape[0])
                    ws.append(a.shape[1])
                    cs.append(a.shape[2] if a.ndim == 3 else 1)
                    pxs.append(a.ravel().tolist())
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": idxs, "width": ws,
                "height": hs, "channels": cs, "pixels": pxs,
            })

    return df.mapInPandas(kernel, VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# audio plumbing: decode -> frame features (the audio leg of the
# image/audio/video mandate; same honest-stub pattern as decode_image)

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("samples", ArrayType(FloatType())),
    ]
)

_FAKE_SR, _FAKE_N = 16_000, 64


def _fake_audio_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """STUB audio decoder: a deterministic pseudo-waveform from
    md5(payload) — byte b becomes the centered sample (b - 128)/128,
    tiled to 64 samples. Exact in float32 (integer numerator, power-of-2
    denominator), so the SQL oracle replays it without quantization
    games. Signature (bytes -> (sample_rate, float32 mono)) is the
    decoder contract; _wav_decode is the real-codec implementation."""
    h = hashlib.md5(payload).digest()
    b = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    s = (b - 128.0) / 128.0
    reps = int(np.ceil(_FAKE_N / len(s)))
    return _FAKE_SR, np.tile(s, reps)[:_FAKE_N].astype(np.float32)


def _wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """Real-codec decoder for PCM WAV via the stdlib ``wave`` module
    (no external deps): 16-bit samples -> float32 in [-1, 1), channels
    mono-mixed by mean."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError(f"_wav_decode handles 16-bit PCM, got {8 * width}-bit")
    a = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        a = a.reshape(-1, n_ch).mean(axis=1)
    return sr, a.astype(np.float32)


def _resolve_audio_decoder(decoder):
    """decoder: 'stub' | 'wav' | callable(bytes) -> (sr, float32[])."""
    if callable(decoder):
        return decoder
    if decoder == "stub":
        return _fake_audio_decode
    if decoder == "wav":
        return _wav_decode
    raise ValueError(f"unknown audio decoder {decoder!r}")


def decode_audio(df: DataFrame, id_col: str = "doc_id", decoder="stub") -> DataFrame:
    """Decode binary payloads to mono waveforms via mapInPandas
    (Arrow-batched). Output [doc_id, sample_rate, n_samples, samples]."""
    decode = _resolve_audio_decoder(decoder)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, ns, ss = [], [], []
            for p in pdf["payload"]:
                sr, a = decode(bytes(p))
                srs.append(sr)
                ns.append(len(a))
                ss.append(a.tolist())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "sample_rate": srs,
                "n_samples": ns,
                "samples": ss,
            })

    return df.mapInPandas(kernel, AUDIO_SCHEMA)


def audio_features(decoded: DataFrame, frame: int = 16) -> DataFrame:
    """Frame-level waveform features: RMS energy per non-overlapping
    ``frame``-sample window plus the global zero-crossing rate —
    the standard decode -> featurize hop for audio curation (silence /
    clipping / activity filters). Output [doc_id, features] with
    features = [rms_0, ..., rms_{n_frames-1}, zcr].

    Pure Spark expressions over the samples array (higher-order
    functions — no second python hop after the decode kernel)."""
    n_frames = F.floor(F.col("n_samples") / frame).cast("int")
    # a clip shorter than one frame has n_frames = 0: an unguarded
    # sequence(0, -1) is DESCENDING [0, -1] and would emit two bogus
    # RMS entries (one via a negative-index slice) — emit none instead
    rms = F.when(
        n_frames >= 1,
        F.transform(
            F.sequence(F.lit(0), n_frames - 1),
            lambda j: F.sqrt(
                F.aggregate(
                    F.slice(F.col("samples"), j * frame + 1, frame),
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                ) / frame
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<double>"))
    # a 0/1-sample clip has no sample pairs: zero crossings, not 0/0
    zc = F.when(
        F.col("n_samples") > 1,
        F.aggregate(
            F.expr("zip_with(slice(samples, 1, n_samples - 1), "
                   "slice(samples, 2, n_samples - 1), "
                   "(a, b) -> CASE WHEN CAST(a AS DOUBLE) * CAST(b AS DOUBLE) < 0 "
                   "THEN 1 ELSE 0 END)"),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double") / (F.col("n_samples") - 1),
    ).otherwise(F.lit(0.0))
    return decoded.select(
        "doc_id",
        F.concat(rms, F.array(zc)).alias("features"),
    )
