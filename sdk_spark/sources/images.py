"""Deterministic synthetic image+caption table (north-rule input shape).

Generates the authoritative input table
``(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash long)`` (BASELINE.json input_hint) fully inside Spark executors via
``mapInPandas`` — no driver-side materialization, arbitrary scale, seeded
and reproducible (seed=42; every row is a pure function of its index).

Planted defects at known row indices (FIXTURES.md §F1) make expected
violation rows exactly enumerable:

==================  ==========================================  =========================
index rule           defect                                     expected constraint
==================  ==========================================  =========================
i % 100 == 1         image_id = 'not-a-uuid-<i>'                INSTANCE_UUID_FORMAT_INVALID
i % 100 == 2         w = 0                                      INSTANCE_NUMBER_MINIMUM
i % 100 == 3         h = 20000 (metadata lies)                  INSTANCE_NUMBER_MAXIMUM
i % 100 == 4         fmt = 'gif'                                INSTANCE_ENUM_MISMATCH
i % 100 == 5         caption = ''                               INSTANCE_STRING_MIN_LENGTH
i % 100 == 6         caption contains NUL                       INSTANCE_STRING_PATTERN_MISMATCH
i % 100 == 7         caption = NULL                             INSTANCE_REQUIRED_PROPERTY_MISSING
i % 100 == 8         image_id duplicates row i-1                ENGINE_UNIQUE_VIOLATION
i % 100 == 9         pixel noise (PSNR < 40 dB vs reference)    ENGINE_PIXEL_MISMATCH
i % 100 == 10        caption mutated vs reference               ENGINE_CAPTION_MISMATCH
~30% (hash-gated)   solid-color image → one hot phash          (skew stressor, no violation;
                     gate: (crc32(image_id) >> 8) % 10 < 3 — id-derived, NOT i % 10)
==================  ==========================================  =========================
"""

from __future__ import annotations

import uuid
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
WORDS = (
    "amber basalt cedar dune ember fjord garnet harbor iris juniper kelp "
    "lagoon maple nectar onyx prairie quartz reef sierra tundra umber vale "
    "willow xenon yarrow zephyr"
).split()

IMAGE_TABLE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), True),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("w", T.IntegerType(), True),
    T.StructField("h", T.IntegerType(), True),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("caption", T.StringType(), True),
    T.StructField("phash", T.LongType(), True),
])

# JSON Structure schema driving the compiled plan (FIXTURES.md §F1; every
# keyword maps to reference semantics cited in SURVEY.md §2)
IMAGE_STRUCT_SCHEMA = {
    "$schema": "https://json-structure.org/meta/extended/v0/#",
    "$id": "https://sdk-spark.local/images.struct.json",
    "name": "ImageRecord",
    "$uses": ["JSONStructureValidation"],
    "type": "object",
    "properties": {
        "image_id": {"type": "uuid"},
        "bytes": {"type": "binary"},
        "w": {"type": "int32", "minimum": 1, "maximum": 16384},
        "h": {"type": "int32", "minimum": 1, "maximum": 16384},
        "fmt": {"type": "string", "enum": ["png", "jpeg", "webp"]},
        "caption": {"type": "string", "minLength": 1, "maxLength": 1024,
                    "pattern": "^[^\\x00]*$"},
        "phash": {"type": "int64"},
    },
    "required": ["image_id", "bytes", "w", "h", "fmt", "caption"],
}


def canonical_id(i: int, seed: int = SEED) -> str:
    return str(uuid.uuid5(uuid.NAMESPACE_URL, f"sdk-spark-img-{seed}-{i}"))


def _id_seed(image_id: str) -> int:
    return zlib.crc32(image_id.encode("utf-8"))


def reference_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Reference pixel content as a pure function of the row identity —
    the per-row invariant needs no join and no stored baseline."""
    s = _id_seed(image_id)
    if (s >> 8) % 10 < 3:
        # solid color block (30% of rows → one hot phash, dedup/skew fixture)
        color = np.array([s & 0xFF, (s >> 4) & 0xFF, (s >> 7) & 0xFF], dtype=np.uint8)
        return np.broadcast_to(color, (h, w, 3)).copy()
    xx = np.arange(w, dtype=np.uint16)
    yy = np.arange(h, dtype=np.uint16)
    r = ((xx[None, :] * ((s % 7) + 1) + yy[:, None]) % 256).astype(np.uint8)
    g = ((xx[None, :] + yy[:, None] * ((s % 5) + 2)) % 256).astype(np.uint8)
    b = np.full((h, w), s % 256, dtype=np.uint8)
    return np.stack([r, g, b], axis=2)


def reference_caption(image_id: str) -> str:
    s = _id_seed(image_id)
    n = 3 + s % 6
    return " ".join(WORDS[(s // (k + 1)) % len(WORDS)] for k in range(n))


def average_hash(arr: np.ndarray) -> int:
    """8x8 average hash → signed int64 (the ``phash`` column).

    Accepts (H, W), (H, W, 1), (H, W, 3) or (H, W, 4); alpha is ignored
    so a hash computed from an RGBA decode matches the RGB original."""
    gray = arr if arr.ndim == 2 else arr[..., :3].mean(axis=2) \
        if arr.shape[2] >= 3 else arr[..., 0]
    hh, ww = gray.shape
    ys = np.linspace(0, hh, 9, dtype=int)
    xs = np.linspace(0, ww, 9, dtype=int)
    cells = np.array([[gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                            xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                       for j in range(8)] for i in range(8)])
    # one-gray-level epsilon: flat content (every cell AT the mean) hashes
    # deterministically to all-ones instead of flipping on float-summation
    # ulps or sub-level lossy noise — without it a solid-color image's
    # hash is unstable between encode and decode
    bits = (cells >= cells.mean() - 1.0).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def _dims(i: int) -> tuple[int, int]:
    return 8 + (i * 7) % 17, 8 + (i * 11) % 13


def make_row(i: int, seed: int = SEED, plant: bool = True,
             jpeg_fraction: float = 0.0,
             webp_fraction: float = 0.0,
             progressive_fraction: float = 0.0,
             lossy_webp_fraction: float = 0.0) -> tuple:
    from ..functions.png import encode_png

    image_id = canonical_id(i, seed)
    k = i % 100 if plant else -1
    if k == 8:
        # k == 8 implies i >= 8, so i - 1 is always a valid prior row
        image_id = canonical_id(i - 1, seed)  # duplicate key
    elif k == 1:
        # mutate the id BEFORE deriving content so this row violates only
        # the uuid format check, not the content-vs-id invariants
        image_id = f"not-a-uuid-{i}"
    w, h = _dims(i)
    pixels = reference_pixels(image_id, w, h)
    if k == 9:
        rng = np.random.RandomState(i & 0x7FFFFFFF)
        noise = rng.randint(-80, 80, pixels.shape)
        pixels = np.clip(pixels.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    caption = reference_caption(image_id)
    # lossy tier: q95 keeps clean content >= ~50 dB (well above the 40 dB
    # invariant) while planted noise rows stay far below it; webp (VP8L)
    # is lossless like png
    use_jpeg = jpeg_fraction > 0 and (i % 10) < jpeg_fraction * 10
    use_webp = (webp_fraction > 0 and not use_jpeg
                and (i % 10) >= 10 - webp_fraction * 10)
    if use_jpeg:
        from ..functions.jpeg import encode_jpeg, encode_jpeg_progressive

        # a deterministic share of JPEG rows is progressive (the dominant
        # real-crawl encoding), two-thirds of those with restart intervals
        # (i % 3 is nonzero for 2 of every 3 rows)
        if progressive_fraction > 0 and \
                (i // 10) % 10 < progressive_fraction * 10:
            payload = encode_jpeg_progressive(pixels, quality=95,
                                              restart_interval=(i % 3))
        else:
            payload = encode_jpeg(pixels, quality=95,
                                  restart_interval=4 if i % 5 == 0 else 0)
        fmt = "jpeg"
    elif use_webp:
        from ..functions.webp import encode_webp

        # a deterministic share of webp rows is lossy VP8 (the dominant
        # real-crawl webp flavor).  Rows whose reference content cannot
        # survive 4:2:0 chroma subsampling at 40 dB (sawtooth chroma
        # ramps) fall back to lossless so the PSNR invariant keeps its
        # planted/clean separation; the gate is deterministic per row.
        payload = None
        if lossy_webp_fraction > 0 and \
                (i // 10) % 10 < lossy_webp_fraction * 10:
            from ..functions.vp8enc import encode_webp_lossy
            from ..functions.webp import decode_webp

            lossy = encode_webp_lossy(pixels, quality=95)
            dec = decode_webp(lossy).astype(np.float64)
            mse = float(np.mean((dec - pixels) ** 2))
            if mse == 0 or 10 * np.log10(255.0 ** 2 / mse) >= 42.0:
                payload = lossy
        if payload is None:
            payload = encode_webp(pixels)
        fmt = "webp"
    else:
        payload = encode_png(pixels)
        fmt = "png"
    phash = average_hash(pixels)
    out_w, out_h = w, h
    if plant:
        if k == 2:
            out_w = 0
        elif k == 3:
            out_h = 20000
        elif k == 4:
            fmt = "gif"
        elif k == 5:
            caption = ""
        elif k == 6:
            caption = caption[:3] + "\x00" + caption[3:]
        elif k == 7:
            caption = None
        elif k == 10:
            caption = caption + " MUTATED"
    return (image_id, payload, out_w, out_h, fmt, caption, phash)


def _gen_batches(batches: Iterator[pd.DataFrame], seed: int, plant: bool,
                 jpeg_fraction: float = 0.0,
                 webp_fraction: float = 0.0,
                 progressive_fraction: float = 0.0,
                 lossy_webp_fraction: float = 0.0) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [make_row(int(i), seed, plant, jpeg_fraction, webp_fraction,
                         progressive_fraction, lossy_webp_fraction)
                for i in pdf["id"]]
        yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_TABLE_SCHEMA.fields])


def generate_images(spark: SparkSession, n: int, partitions: int = 32,
                    seed: int = SEED, plant: bool = True,
                    jpeg_fraction: float = 0.0,
                    webp_fraction: float = 0.0,
                    progressive_fraction: float = 0.0,
                    lossy_webp_fraction: float = 0.0) -> DataFrame:
    """Distributed deterministic generation: every executor builds its own
    slice from row indices (Arrow-batched, no driver data movement).

    ``jpeg_fraction`` > 0 encodes that share of rows as baseline JPEG
    (lossy tier; the PSNR invariant's reason to exist);
    ``progressive_fraction`` of the JPEG rows use the progressive (SOF2)
    process, a share of them with restart intervals. The scaling bench
    keeps PNG-only input so its numbers measure the engine, not the
    pure-Python stand-in codec's throughput."""
    base = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _gen_batches(batches, seed, plant, jpeg_fraction,
                            webp_fraction, progressive_fraction,
                            lossy_webp_fraction)

    return base.mapInPandas(gen, IMAGE_TABLE_SCHEMA)


def expected_violation_ids(n: int, seed: int = SEED) -> dict[str, list[int]]:
    """Ground truth for tests: index lists per planted defect class."""
    out = {"uuid": [], "w_min": [], "h_max": [], "fmt_enum": [], "cap_minlen": [],
           "cap_pattern": [], "cap_required": [], "dup": [], "pixel": [], "cap_ref": []}
    names = {1: "uuid", 2: "w_min", 3: "h_max", 4: "fmt_enum", 5: "cap_minlen",
             6: "cap_pattern", 7: "cap_required", 8: "dup", 9: "pixel", 10: "cap_ref"}
    for i in range(n):
        k = i % 100
        if k in names:
            out[names[k]].append(i)
    return out
