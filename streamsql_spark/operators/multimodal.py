"""Multimodal (image/audio/video) column handling.

Media lives in DataFrames as opaque ``binary`` columns plus typed
metadata structs — the pattern Spark's own ``binaryFile`` source and
Delta's media tables use.  Decode / feature-extraction run as
Arrow-batched ``mapInPandas`` stages: one Python worker per partition,
columnar transfer, output schema declared up front so Catalyst can
prune/push around the stage.

Decode is REAL for codec-free container formats — binary PPM (P6)
images and PCM WAV audio parse with numpy/stdlib only, and their
features (per-channel pixel stats + luma histogram; RMS/zero-crossing
rate + FFT band energies) are genuine signal features.  Formats that
need external codecs (JPEG/PNG/MP4 — PIL/librosa/ffmpeg are NOT in
this container) fall back to deterministic byte-statistics features;
``decode_image_stub`` documents that seam.  The Spark plumbing
(schema, batching, partitioning) is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_parallelism
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque encoded bytes
    StructField("meta", StructType([
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("byte_mean", DoubleType()),
    StructField("byte_entropy", DoubleType()),
    StructField("feature", ArrayType(DoubleType())),  # 8-dim fake embedding
])


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload so the
    multimodal path is exercisable on the driver's fixtures."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def _parse_ppm_at(payload: bytes, pos: int):
    """One P6 image starting at ``pos`` → ((h, w, 3) uint8 array,
    next_pos), or None if no valid P6 starts there.  The netpbm spec
    allows MULTIPLE images concatenated in one file — this offset form
    is what lets :func:`sample_frames` treat such a stream as raw
    video frames."""
    import numpy as np

    if payload[pos:pos + 2] != b"P6":
        return None
    try:
        # header: magic, width, height, maxval — whitespace/comment
        # separated
        fields = []
        pos += 2
        while len(fields) < 3 and pos < len(payload):
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields[0], fields[1], fields[2]
        if maxval > 255:
            return None  # 16-bit PPM out of scope
        if w <= 0 or h <= 0:
            # degenerate-but-parseable "P6\\n0 5\\n255\\n": a zero axis
            # crashes the resize gather (IndexError on a size-0 axis)
            # — treat as undecodable like every other malformed payload
            return None
        n = w * h * 3
        if pos + n > len(payload):
            return None  # truncated pixel data
        pix = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
        return pix.reshape(h, w, 3), pos + n
    except (ValueError, IndexError):
        return None  # malformed header/pixels — not a decodable P6


def decode_ppm(payload: bytes):
    """Binary PPM (P6) → (h, w, 3) uint8 array, or None if not P6.

    Pure numpy — PPM is the codec-free image container, so this is REAL
    image decoding, not a stub."""
    r = _parse_ppm_at(payload, 0)
    return None if r is None else r[0]


def iter_ppm_frames(payload: bytes):
    """Yield every image of a (possibly multi-image) P6 stream in
    order — the netpbm-spec concatenated form, i.e. codec-free raw
    video."""
    pos = 0
    while pos < len(payload):
        r = _parse_ppm_at(payload, pos)
        if r is None:
            return
        img, pos = r
        yield img


def encode_ppm(img) -> bytes:
    """(h, w, 3) uint8 array → binary P6 bytes (the inverse of
    :func:`decode_ppm`)."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()


def decode_wav(payload: bytes):
    """PCM WAV → (samples float array in [-1, 1], sample_rate), or None.

    stdlib ``wave`` + numpy — real audio decoding for the codec-free
    container."""
    import io
    import struct
    import wave

    import numpy as np

    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        return None
    try:
        with wave.open(io.BytesIO(payload)) as f:
            rate = f.getframerate()
            width = f.getsampwidth()
            raw = f.readframes(f.getnframes())
    except (wave.Error, EOFError, struct.error, ValueError):
        # truncated/corrupt RIFF raises EOFError or struct.error, not
        # just wave.Error — one bad payload must not fail the task
        return None
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                   - 128.0) / 128.0
    else:
        return None
    return samples, rate


def decode_image_stub(payload: bytes, real_decode: bool = False):
    """Codec-format decode seam.  JPEG/PNG/MP4 require PIL/cv2/ffmpeg —
    not in this container; a production build injects a decoder through
    ``extract_features(codec_decoder=...)`` (see that docstring and
    README §codec seam).  Codec-free formats decode for real: see
    decode_ppm / decode_wav."""
    if real_decode:
        raise NotImplementedError(
            "codec decoding (JPEG/PNG/MP4) requires PIL/cv2/ffmpeg which "
            "are not installed; PPM/WAV decode for real — inject a "
            "codec_decoder for codec formats only")
    return payload  # passthrough for deterministic feature extraction


def image_features(img) -> tuple[str, float, float, list[float]]:
    """(kind, mean luma, luma-histogram entropy, 8-bin luma histogram)
    from an (h, w, 3) uint8 array — shared by the built-in PPM decode
    and any injected codec decoder."""
    import numpy as np

    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])
    hist = np.histogram(luma, bins=8, range=(0, 256))[0]
    total = max(int(hist.sum()), 1)
    nz = hist[hist > 0]
    ent = float(-((nz / total) * np.log2(nz / total)).sum())
    feat = [round(c / total, 6) for c in hist.tolist()]
    return "image/decoded", float(luma.mean()), ent, feat


def audio_features(samples) -> tuple[str, float, float, list[float]]:
    """(kind, RMS, zero-crossing rate, 8 normalized FFT band energies)
    from a float sample array in [-1, 1]."""
    import numpy as np

    if not samples.size:
        return "audio/decoded", 0.0, 0.0, [0.0] * 8
    mean = float(np.sqrt((samples ** 2).mean()))
    ent = float((np.diff(np.signbit(samples)) != 0).mean())
    spec = np.abs(np.fft.rfft(samples)) ** 2
    bands = [float(b.sum()) for b in np.array_split(spec, 8)]
    total = sum(bands) or 1.0
    return ("audio/decoded", mean, ent,
            [round(b / total, 6) for b in bands])


def extract_features(media: DataFrame, batch_hint: int = 1024,
                     codec_decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the pipeline streaming-shaped (no collect), and
    the declared output schema lets Catalyst prune downstream.  Per
    payload, the kernel sniffs the container:

    - P6 PPM → real pixel decode; ``byte_mean`` = mean luma,
      ``feature`` = 8-bin luma histogram, kind → "image/ppm";
    - PCM WAV → real sample decode; ``byte_mean`` = RMS,
      ``byte_entropy`` = zero-crossing rate, ``feature`` = 8 FFT band
      energies (power, normalized), kind → "audio/wav";
    - otherwise, if ``codec_decoder`` is injected it gets the payload —
      THE CODEC SEAM: a production build passes a function wrapping
      PIL/cv2/ffmpeg (not in this container).  Contract:
      ``codec_decoder(payload: bytes)`` returns an (h, w, 3) uint8
      numpy array (image), a ``(samples_float_array, sample_rate)``
      tuple (audio), or None (undecodable → fall through).  The return
      value feeds the SAME image_features/audio_features kernels as the
      built-in decoders, so the output schema never changes.  The
      function is captured in the mapInPandas closure (cloudpickle), so
      injection works on real executors — no module monkeypatching,
      which would not propagate to Python workers;
    - anything else → byte statistics + an 8-bin byte histogram, the
      deterministic fallback with the exact output shape of a real
      decode stage.
    """

    def kernel(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        def byte_stats(payload):
            arr = np.frombuffer(payload or b"", dtype=np.uint8)
            n = int(arr.size)
            counts = np.bincount(arr >> 5, minlength=8) if n else \
                np.zeros(8, dtype=np.int64)
            mean = float(arr.sum()) / n if n else 0.0
            nz = counts[counts > 0]
            ent = float(-((nz / n) * np.log2(nz / n)).sum()) if nz.size else 0.0
            feat = [round(c / n, 6) if n else 0.0 for c in counts.tolist()]
            return mean, ent, feat

        for pdf in batches:
            out_rows = []
            for media_id, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                n = len(payload)
                decoded = None
                img = decode_ppm(payload)
                if img is not None:
                    _, mean, ent, feat = image_features(img)
                    kind = "image/ppm"
                elif (wav := decode_wav(payload)) is not None:
                    _, mean, ent, feat = audio_features(wav[0])
                    kind = "audio/wav"
                elif codec_decoder is not None and \
                        (decoded := codec_decoder(payload)) is not None:
                    # injected codec decode (the seam): same feature
                    # kernels, same output schema as the built-ins
                    if isinstance(decoded, tuple):
                        kind, mean, ent, feat = audio_features(decoded[0])
                    else:
                        kind, mean, ent, feat = image_features(decoded)
                else:
                    mean, ent, feat = byte_stats(decode_image_stub(payload))
                out_rows.append({
                    "media_id": media_id,
                    "kind": kind,
                    "n_bytes": n,
                    "byte_mean": round(mean, 6),
                    "byte_entropy": round(ent, 6),
                    "feature": feat,
                })
            yield pd.DataFrame(out_rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return ensure_parallelism(media).mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  codec_decoder=None) -> DataFrame:
    """Resize the image payloads to ``width × height`` (nearest
    neighbor) — REAL for the codec-free P6/PPM container (decode →
    numpy index-gather → re-encode); codec formats (JPEG/PNG) go
    through the injected ``codec_decoder`` seam or pass through
    untouched with an unmodified payload and a ``resized=false`` flag
    (same seam contract as :func:`extract_features`).

    One ``mapInPandas`` Arrow pass; partitioning untouched (narrow) —
    at 100 TB this is a scan-rate-bound map over the binary column.
    """
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            outs, ok = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                img = decode_ppm(raw)
                if img is None and codec_decoder is not None:
                    img = codec_decoder(raw)
                if img is None:
                    outs.append(raw)
                    ok.append(False)
                    continue
                import numpy as np

                h, w = img.shape[0], img.shape[1]
                ri = (np.arange(height) * h) // height
                ci = (np.arange(width) * w) // width
                outs.append(encode_ppm(img[ri][:, ci]))
                ok.append(True)
            out = pdf.copy()
            out["payload"] = pd.Series(outs, index=pdf.index, dtype=object)
            out["resized"] = pd.Series(ok, index=pdf.index)
            yield out

    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(list(media.schema.fields)
                            + [StructField("resized", BooleanType())])
    return media.mapInPandas(kernel, schema=out_schema) \
        .withColumn("meta", F.struct(
            F.col("meta.mime").alias("mime"),
            F.when(F.col("resized"), F.length("payload").cast("long"))
             .otherwise(F.col("meta.n_bytes")).alias("n_bytes"),
            F.when(F.col("resized"),
                   F.concat(F.col("meta.source"),
                            F.lit(f"|resized:{width}x{height}")))
             .otherwise(F.col("meta.source")).alias("source")))


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every ``every_n``-th frame from video payloads — REAL for
    the codec-free concatenated-P6 stream (the netpbm spec's
    multi-image form ≡ raw video, one P6 per frame): each sampled frame
    is re-emitted as a standalone single-image P6 payload with its
    dimensions.  Non-P6 payloads (MP4 etc.) yield no rows here — the
    codec seam (README) owns them.

    One ``mapInPandas`` pass, one output row per sampled frame — the
    standard video→frames fan-out a multimodal training pipeline feeds
    into the image path (resize → features)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                for idx, img in enumerate(iter_ppm_frames(raw)):
                    if idx % every_n == 0:
                        rows.append({
                            "media_id": mid, "frame_index": idx,
                            "frame_w": img.shape[1],
                            "frame_h": img.shape[0],
                            "payload": encode_ppm(img)})
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_w",
                               "frame_h", "payload"])

    id_t = media.schema["media_id"].dataType.simpleString()
    return (media.where(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(kernel,
                         schema=f"media_id {id_t}, frame_index int, "
                                "frame_w int, frame_h int, payload binary"))
