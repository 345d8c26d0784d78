"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Mirrors Towhee's payload types (towhee/types/image.py, video_frame.py,
audio_frame.py — ndarray subclasses carrying mode/timestamp/sample_rate)
as Spark structs, and its decode ops (hub_ops/image_decode.py,
video_decode.py:24-64 flat_map→frames, audio_decode.py) as Arrow-batched
``mapInPandas`` transforms.

The sandbox has no image/audio codecs, so the *decode step* is stubbed with
a deterministic fake (or raises NotImplementedError when strict=True); the
Spark-side plumbing — schemas, batch iteration, fan-out explode, partition
behavior — is real and tested. Swapping in cv2/ffmpeg later only replaces
the innermost `_fake_decode` call.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# struct<data:binary, mode:string> — towhee/types/image.py:18-32
IMAGE_TYPE = T.StructType([
    T.StructField("data", T.BinaryType()),
    T.StructField("mode", T.StringType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
])

# struct<data:binary, ts:long, key_frame:int> — towhee/types/video_frame.py:18-34
VIDEO_FRAME_TYPE = T.StructType([
    T.StructField("data", T.BinaryType()),
    T.StructField("mode", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("key_frame", T.IntegerType()),
])

# struct<data:binary, sample_rate:int, ts:long, layout:string> — audio_frame.py:18-34
AUDIO_FRAME_TYPE = T.StructType([
    T.StructField("data", T.BinaryType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("layout", T.StringType()),
])


def _fake_decode(raw: bytes, h: int, w: int) -> np.ndarray:
    """STUB: deterministic fake decoder — seeded by content hash so tests
    are reproducible. Replace with cv2.imdecode for real images."""
    seed = int.from_bytes(hashlib.sha256(raw or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "image",
    height: int = 8,
    width: int = 8,
    strict: bool = False,
) -> DataFrame:
    """image_decode.cv2 parity: binary column → IMAGE_TYPE struct.
    Arrow-batched mapInPandas; per-batch numpy, no per-row Python I/O."""
    if strict:
        raise NotImplementedError(
            "real image decoding requires cv2/PIL, unavailable in this environment"
        )
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, IMAGE_TYPE)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [
                {
                    "data": _fake_decode(raw, height, width).tobytes(),
                    "mode": "RGB",
                    "height": height,
                    "width": width,
                }
                for raw in pdf[content_col]
            ]
            pdf[out_col] = imgs
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("path",),
    n_frames: int = 4,
    fps_ms: int = 40,
    strict: bool = False,
) -> DataFrame:
    """video_decode.ffmpeg parity (flat_map → frames): one video row fans
    out to n sampled VIDEO_FRAME_TYPE rows. The explode happens inside
    mapInPandas so frame bytes never round-trip through the driver."""
    if strict:
        raise NotImplementedError("real video decoding requires ffmpeg")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("frame_idx", T.IntegerType()), T.StructField("frame", VIDEO_FRAME_TYPE)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # zip-over-columns (no iterrows): per-row Series construction costs
        # more than the fake decode itself
        for pdf in batches:
            ids = [pdf[c].tolist() for c in id_cols]
            contents = pdf[content_col].tolist()
            rows = []
            for ridx, content in enumerate(contents):
                for i in range(n_frames):
                    frame = _fake_decode((content or b"") + bytes([i]), 8, 8)
                    rows.append(
                        {**{c: col[ridx] for c, col in zip(id_cols, ids)},
                         "frame_idx": i,
                         "frame": {"data": frame.tobytes(), "mode": "RGB",
                                   "ts_ms": i * fps_ms, "key_frame": int(i == 0)}}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


def image_embed(
    df: DataFrame, image_col: str = "image", out_col: str = "embedding", dim: int = 32
) -> DataFrame:
    """image_embedding.timm parity shape: IMAGE struct → array<float>.
    STUB model = channel-histogram features (deterministic); the real model
    would be cached per worker via towhee_spark.kernels.worker_singleton."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for img in pdf[image_col]:
                if img is None:  # null struct (outer join / skipped decode)
                    embs.append(None)
                    continue
                arr = np.frombuffer(img["data"], dtype=np.uint8).astype(np.float32)
                hist = np.histogram(arr, bins=dim, range=(0, 256))[0].astype(np.float32)
                n = np.linalg.norm(hist)
                embs.append((hist / n if n > 0 else hist).tolist())
            pdf[out_col] = embs
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def decode_audio(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "audio",
    sample_rate: int = 16000,
    n_samples: int = 1024,
    strict: bool = False,
) -> DataFrame:
    """audio_decode.ffmpeg parity: binary column → AUDIO_FRAME_TYPE struct.
    STUB decoder (deterministic content-seeded PCM); real plumbing."""
    if strict:
        raise NotImplementedError("real audio decoding requires ffmpeg")
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, AUDIO_FRAME_TYPE)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [
                {
                    "data": (_fake_decode(raw, 1, n_samples // 4)[..., :2]
                             .astype("<i2").tobytes()),
                    "sample_rate": sample_rate,
                    "ts_ms": 0,
                    "layout": "mono",
                }
                for raw in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def image_crop(
    df: DataFrame,
    image_col: str = "image",
    out_col: str = "cropped",
    box: tuple[int, int, int, int] = (0, 0, 4, 4),
) -> DataFrame:
    """towhee.image_crop parity (hub_ops/utils.py:53): crop an IMAGE struct
    to box=(y, x, h, w). Pure numpy slicing over the decoded buffer."""
    y0, x0, h, w = box
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, IMAGE_TYPE)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            crops = []
            for img in pdf[image_col]:
                if img is None:  # null struct passes through as null crop
                    crops.append(None)
                    continue
                arr = np.frombuffer(img["data"], dtype=np.uint8).reshape(
                    img["height"], img["width"], 3
                )
                sub = arr[y0 : y0 + h, x0 : x0 + w]
                crops.append(
                    {"data": sub.tobytes(), "mode": img["mode"],
                     "height": sub.shape[0], "width": sub.shape[1]}
                )
            pdf[out_col] = crops
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def image_resize(
    df: DataFrame,
    image_col: str = "image",
    out_col: str = "resized",
    height: int = 4,
    width: int = 4,
) -> DataFrame:
    """towhee.image_resize shape (hub_ops/utils.py resize leg): rescale an
    IMAGE struct to (height, width). REAL nearest-neighbor resample — pure
    numpy index math (the half-pixel-center mapping cv2 INTER_NEAREST
    uses), no codec needed, so unlike the decode stubs this op's output is
    the true resize of its input buffer."""
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, IMAGE_TYPE)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for img in pdf[image_col]:
                if img is None:  # null struct passes through as null
                    outs.append(None)
                    continue
                arr = np.frombuffer(img["data"], dtype=np.uint8).reshape(
                    img["height"], img["width"], 3
                )
                ys = np.minimum(
                    ((np.arange(height) + 0.5) * img["height"] / height).astype(np.int64),
                    img["height"] - 1,
                )
                xs = np.minimum(
                    ((np.arange(width) + 0.5) * img["width"] / width).astype(np.int64),
                    img["width"] - 1,
                )
                sub = arr[ys][:, xs]
                outs.append(
                    {"data": sub.tobytes(), "mode": img["mode"],
                     "height": height, "width": width}
                )
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


# labels for the stub detector — tiny public COCO-style subset
_STUB_CLASSES = ["person", "car", "dog", "cat", "chair", "bottle", "bird", "bus"]

DETECTION_TYPE = T.StructType([
    T.StructField("boxes", T.ArrayType(T.ArrayType(T.IntegerType()))),
    T.StructField("classes", T.ArrayType(T.StringType())),
    T.StructField("scores", T.ArrayType(T.FloatType())),
])


def detect_objects(
    df: DataFrame,
    image_col: str = "image",
    out_col: str = "detections",
    max_objects: int = 3,
    strict: bool = False,
) -> DataFrame:
    """Object detection shape — parity with object_detection.yolov5
    (ref hub_ops/object_detection.py:25-60: img → (boxes (x1,y1,x2,y2),
    classes, scores)). The model is a STUB: deterministic boxes/labels
    seeded by the image content hash, clamped to the frame — the Spark-side
    plumbing (IMAGE struct in, detection struct out, Arrow batching, crop
    composition via image_crop) is real; pass strict=True to refuse the
    fake where a real model is required."""
    if strict:
        raise NotImplementedError(
            "real object detection requires a vision model (e.g. yolov5); "
            "plug its batched predict into this mapInPandas kernel"
        )
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, DETECTION_TYPE)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dets = []
            for img in pdf[image_col]:
                if img is None:  # null struct → zero detections, not a crash
                    dets.append({"boxes": [], "classes": [], "scores": []})
                    continue
                h, w = int(img["height"]), int(img["width"])
                if h < 1 or w < 1:  # degenerate frame → zero detections,
                    dets.append({"boxes": [], "classes": [], "scores": []})
                    continue  # never a failed batch (loaders' degrade contract)
                seed = int.from_bytes(hashlib.sha256(img["data"] or b"").digest()[:8], "big")
                rng = np.random.default_rng(seed)
                n = int(rng.integers(1, max_objects + 1))
                boxes, classes, scores = [], [], []
                for _ in range(n):
                    x1 = int(rng.integers(0, max(1, w - 1)))
                    y1 = int(rng.integers(0, max(1, h - 1)))
                    x2 = int(rng.integers(x1 + 1, w + 1))
                    y2 = int(rng.integers(y1 + 1, h + 1))
                    boxes.append([x1, y1, x2, y2])
                    classes.append(_STUB_CLASSES[int(rng.integers(0, len(_STUB_CLASSES)))])
                    scores.append(round(float(rng.uniform(0.5, 1.0)), 4))
                dets.append({"boxes": boxes, "classes": classes, "scores": scores})
            pdf[out_col] = dets
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
