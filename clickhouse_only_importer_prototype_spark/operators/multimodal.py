"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video travel as
``binary`` columns with a typed metadata struct alongside. Decode /
feature-extract / resize / frame-sample run as arrow-vectorized
functions over ``mapInPandas`` so each task processes whole record
batches — the Spark-side plumbing (schema, batch shape, partitioning)
is real and tested here; the actual codec calls are stubbed because
image/audio libraries are not in this container.

``decode_stub=True`` (default) substitutes a deterministic fake decode
(blake2b-keyed byte statistics) so pipelines and tests exercise the
full path; passing ``decode_stub=False`` raises NotImplementedError at
the point a real codec (Pillow/ffmpeg/torchaudio) would be invoked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from clickhouse_only_importer_prototype_spark.localframe import arrow_local_df
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec + feature extractor:
    blake2b-seeded byte statistics, FEATURE_DIM floats in [0, 1)."""
    import hashlib

    import numpy as np

    digest = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM * 4).digest()
    # explicit little-endian: native byte order would give different
    # "deterministic" features on big-endian executors
    arr = np.frombuffer(digest, dtype="<u4").astype(np.float64)
    return (arr / 2**32).astype(np.float32).tolist()


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Each arrow batch is processed whole (no per-row Python dispatch);
    the output schema is fixed so downstream joins/aggregations plan
    normally. At 100 TB the input should be bucketed or range-
    partitioned by media_id so feature joins co-locate.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires Pillow/ffmpeg; not in container"
                )
            feats = [_fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled timestamp with a feature vector.

    The frame expansion happens INSIDE the Python function, one input
    row per video — exploding first would replicate the multi-MB
    payload once per frame through the Arrow transfer (payload x
    n_frames memory). The metadata-only plan variant is frame_plan."""
    videos = df.where(F.col("media_type") == "video").select(
        "media_id", "payload", F.coalesce("duration_ms", F.lit(0)).alias("dur")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame decode not available")
            ids, frames, feats = [], [], []
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["dur"]):
                payload = p or b""
                for ms in range(0, max(int(dur), 1), every_ms):
                    ids.append(mid)
                    frames.append(ms)
                    feats.append(
                        _fake_decode_features(payload + ms.to_bytes(8, "big"))
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_ms": frames, "features": feats}
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ms", LongType(), True),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )
    return videos.mapInPandas(run, schema)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_width", LongType(), False),
        StructField("out_height", LongType(), False),
        StructField("n_bytes_in", LongType(), True),
        StructField("n_bytes_out", LongType(), True),
        StructField("resized", BinaryType(), True),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image decode+resize+re-encode:
    blake2b keyed by payload and target dims, length scaled to w*h/256
    so output sizes behave like a real thumbnailer's."""
    import hashlib

    n_out = max((w * h) // 256, 16)
    out = b""
    seed = hashlib.blake2b(
        (payload or b"") + w.to_bytes(4, "big") + h.to_bytes(4, "big"),
        digest_size=32,
    ).digest()
    while len(out) < n_out:
        seed = hashlib.blake2b(seed, digest_size=32).digest()
        out += seed
    return out[:n_out]


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Resize image payloads to (width, height) via mapInPandas.

    Same contract as extract_features: arrow batches in, fixed output
    schema, payload bytes only ever cross the Arrow boundary once per
    image. Non-image rows are filtered BEFORE the Python stage —
    pruning in the JVM so audio/video payloads never pay the transfer.
    The codec call is stubbed (`_fake_resize`, deterministic);
    decode_stub=False marks where Pillow would run.
    """
    images = df.where(F.col("media_type") == "image").select(
        "media_id", "payload"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires Pillow; not in container"
                )
            resized = [_fake_resize(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": [width] * len(pdf),
                    "out_height": [height] * len(pdf),
                    "n_bytes_in": [len(p or b"") for p in pdf["payload"]],
                    "n_bytes_out": [len(r) for r in resized],
                    "resized": resized,
                }
            )

    return images.mapInPandas(run, RESIZED_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapt the documents table into the media shape (testdata carries
    no real binary column, so payload = the text's UTF-8 bytes — the
    engine-side plumbing is identical for real codec payloads).

    media_type cycles image/audio/video by doc_id; duration_ms is
    derived from n_chars so frame-sampling has real variation.
    """
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        ((F.col("doc_id") % 3) + 1).cast("int"),
    )
    return df.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            ((F.col("doc_id") % 3) + 1).cast("int"),
        ).alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.when(F.col("doc_id") % 3 == 2, (F.col("n_chars") * 10).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("duration_ms"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata projection over binary payloads — JVM-side only
    (octet_length + md5 on binary), runs at scan speed; the pattern for
    'cheap metadata pass before expensive decode' at 100 TB."""
    return df.select(
        F.col("media_id"),
        F.col("media_type"),
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
    )


def frame_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """The sampling *plan* of frame_sample_plan without the decode:
    one row per (video, sampled timestamp). Pure Spark generator —
    prunable, oracle-checkable, no Python."""
    ts = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
            F.lit(every_ms),
        )
    ).alias("frame_ms")
    return df.where(F.col("media_type") == "video").select("media_id", ts)


def synthetic_media(spark, n: int = 8) -> DataFrame:
    """Deterministic fixture media table (payload = patterned bytes)."""
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 37 + j) % 256 for j in range(64 + i))
        rows.append(
            (
                i,
                mtype,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    mtype
                ],
                payload,
                64 if mtype == "image" else None,
                64 if mtype == "image" else None,
                3000 if mtype == "video" else None,
            )
        )
    return arrow_local_df(spark, rows, MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# Real dependency-free codec: binary PPM (P6) — the toy format that turns
# the decode/feature/resize plumbing into full value oracles (round-4
# verdict #7). PPM is pure byte-slicing: "P6" magic, whitespace-separated
# ASCII width/height/maxval (with '#' comments), one whitespace byte, then
# width*height*3 raw RGB bytes. The stub paths above remain for opaque
# payloads (real JPEG/PNG would need Pillow, not in this container).
# --------------------------------------------------------------------------

_PPM_WS = b" \t\r\n"


def try_decode_ppm(payload: bytes) -> tuple[int, int, bytes] | None:
    """Parse a binary PPM (P6) payload -> (width, height, rgb_bytes),
    or None if the payload is not a well-formed maxval-255 P6 image.

    Full spec parse (whitespace runs + '#' comments in the header), not
    just the happy path the synthesizer emits — the decoder must hold
    up against any producer's PPM output.
    """
    if not payload or not payload.startswith(b"P6"):
        return None
    i, n, toks = 2, len(payload), []
    while len(toks) < 3 and i < n:
        c = payload[i : i + 1]
        if c in _PPM_WS:
            i += 1
            continue
        if c == b"#":
            j = payload.find(b"\n", i)
            if j < 0:
                return None
            i = j + 1
            continue
        j = i
        while j < n and payload[j : j + 1] not in _PPM_WS and payload[j : j + 1] != b"#":
            j += 1
        toks.append(payload[i:j])
        i = j
    if len(toks) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval != 255:
        return None
    i += 1  # exactly one whitespace byte separates maxval from the raster
    body = payload[i : i + 3 * w * h]
    if len(body) != 3 * w * h:
        return None
    return w, h, body


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Inverse of try_decode_ppm (canonical single-space header)."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length != 3*w*h")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def try_decode_bmp(payload: bytes) -> tuple[int, int, bytes] | None:
    """Parse an uncompressed 24-bit BI_RGB BMP -> (width, height,
    rgb_bytes top-down), or None if the payload is any other BMP
    flavor (paletted, compressed, 16/32-bpp) or not a BMP at all.

    Handles both row orders (positive height = bottom-up, the common
    case; negative = top-down) and the 4-byte row stride padding —
    the parts foreign producers actually vary. Same return contract
    as try_decode_ppm, so the feature/resize operators are
    format-agnostic over the two real codecs.
    """
    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40 or len(payload) < 14 + hdr_size:
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if planes != 1 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    ah = -h if top_down else h
    stride = (3 * w + 3) & ~3
    if data_off < 14 + hdr_size or len(payload) < data_off + stride * ah:
        return None
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=stride * ah, offset=data_off
    ).reshape(ah, stride)[:, : 3 * w]
    if not top_down:
        raster = raster[::-1]
    # BGR -> RGB
    rgb = raster.reshape(ah, w, 3)[:, :, ::-1]
    return w, ah, rgb.tobytes()


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Canonical 24-bit BI_RGB BMP (bottom-up, 54-byte headers) from
    top-down RGB bytes — the inverse of try_decode_bmp."""
    import numpy as np

    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length != 3*w*h")
    stride = (3 * width + 3) & ~3
    pad = b"\x00" * (stride - 3 * width)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = px[:, :, ::-1]
    body = b"".join(
        bgr[r].tobytes() + pad for r in range(height - 1, -1, -1)
    )
    file_size = 54 + len(body)
    hdr = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return hdr + dib + body


def try_decode_image(payload: bytes) -> tuple[int, int, bytes] | None:
    """Dispatch over the real dependency-free codecs (PPM P6, 24-bit
    BI_RGB BMP) -> (width, height, top-down rgb bytes); None for any
    payload needing an external codec (Pillow/ffmpeg territory)."""
    return try_decode_ppm(payload) or try_decode_bmp(payload)


PPM_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
        StructField("min_byte", LongType(), True),
        StructField("max_byte", LongType(), True),
    ]
)


def ppm_feature_stats(df: DataFrame, on_opaque: str = "error") -> DataFrame:
    """Decode PPM payloads and emit integral per-channel pixel stats —
    the REAL (non-stub) feature-extraction path, mapInPandas over whole
    arrow batches, fully value-oracled (all int64, no float anywhere).

    ``on_opaque``: 'error' raises NotImplementedError on a non-PPM
    payload (where Pillow/ffmpeg would run — the honest codec gap for
    opaque formats); 'skip' drops such rows (the 100 TB posture:
    quarantine undecodable media, don't fail the job).
    """
    import numpy as np

    if on_opaque not in ("error", "skip"):
        raise ValueError(f"on_opaque must be error|skip: {on_opaque}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PPM_STATS_SCHEMA.fields]
        for pdf in batches:
            out: list[list] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                dec = try_decode_image(bytes(p) if p is not None else b"")
                if dec is None:
                    if on_opaque == "error":
                        raise NotImplementedError(
                            "payload is neither PPM nor 24-bit BMP: "
                            "real media codec (Pillow/ffmpeg) not in "
                            "this container"
                        )
                    continue
                w, h, body = dec
                arr = np.frombuffer(body, dtype=np.uint8)
                px = arr.astype(np.int64).reshape(h, w, 3)
                out.append(
                    [
                        int(mid),
                        w,
                        h,
                        w * h,
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int(arr.min()),
                        int(arr.max()),
                    ]
                )
            yield pd.DataFrame(out, columns=cols, dtype="int64")

    return df.mapInPandas(run, PPM_STATS_SCHEMA)


PPM_RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_width", LongType(), False),
        StructField("out_height", LongType(), False),
        StructField("n_bytes_in", LongType(), True),
        StructField("n_bytes_out", LongType(), True),
        StructField("resized", BinaryType(), True),
    ]
)


def resize_ppm(
    df: DataFrame, out_w: int = 4, out_h: int = 4, on_opaque: str = "error"
) -> DataFrame:
    """Nearest-neighbor PPM resize, REAL codec end-to-end: decode, a
    floor-mapped index gather (src_y = oy*h // out_h — the mapping the
    SQL oracle replicates byte-for-byte), re-encode canonical P6.

    Payload bytes cross the Arrow boundary once per image; at 100 TB
    the input is pre-filtered to images JVM-side (mime/media_type
    predicate on the scan) exactly like resize_images above.
    """
    import numpy as np

    if on_opaque not in ("error", "skip"):
        raise ValueError(f"on_opaque must be error|skip: {on_opaque}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "out_width", "out_height", "n_bytes_in", "n_bytes_out"]
        for pdf in batches:
            rows: list[list] = []
            payloads: list[bytes] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                dec = try_decode_image(raw)
                if dec is None:
                    if on_opaque == "error":
                        raise NotImplementedError(
                            "payload is neither PPM nor 24-bit BMP: "
                            "real image codec (Pillow) not in this "
                            "container"
                        )
                    continue
                w, h, body = dec
                px = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = encode_ppm(
                    out_w, out_h, px[ys][:, xs].tobytes()
                )
                rows.append([int(mid), out_w, out_h, len(raw), len(resized)])
                payloads.append(resized)
            out = pd.DataFrame(rows, columns=cols, dtype="int64")
            out["resized"] = pd.Series(payloads, dtype="object")
            yield out

    return df.mapInPandas(run, PPM_RESIZED_SCHEMA)


def documents_as_ppm_media(df: DataFrame) -> DataFrame:
    """Synthesize REAL binary PPM (P6) payloads from the documents
    table, entirely JVM-side: pixel byte i of doc d is (d*31 + i) % 256
    over an 8 x (1 + n_chars % 13) image — closed-form, so a SQL oracle
    can recompute every decoded statistic (and every resized byte)
    without running a codec. Construction is hex-string assembly
    (transform + lpad(hex) + unhex) concatenated after the ASCII
    header; no Python touches the bytes until the decoder under test.
    """
    h = (F.lit(1) + F.col("n_chars") % 13).cast("long")
    n_body = (h * 24).cast("int")  # 3 channels x width 8 x height
    body_hex = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), n_body - 1),
            lambda i: F.lpad(
                F.hex((F.col("doc_id") * 31 + i.cast("long")) % 256), 2, "0"
            ),
        ),
    )
    header = F.concat(F.lit("P6\n8 "), h.cast("string"), F.lit("\n255\n"))
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.concat(F.encode(header, "UTF-8"), F.unhex(body_hex)).alias("payload"),
        F.lit(8).cast("long").alias("width"),
        h.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("b0", LongType(), True),
        StructField("b1", LongType(), True),
        StructField("b2", LongType(), True),
        StructField("b3", LongType(), True),
    ]
)


def dhash_images(df: DataFrame, on_opaque: str = "error") -> DataFrame:
    """Perceptual difference-hash (dHash) over the REAL decode path:
    decode (PPM/BMP codecs above), integer luma gray = (299r + 587g +
    114b) div 1000, floor-mapped nearest-neighbor resample to a 9x8
    grid (src_y = oy*h // 8, src_x = ox*w // 9 — the resize_ppm
    mapping), then bit(oy, ox) = gray[oy][ox+1] > gray[oy][ox] over
    the 8x8 horizontal comparisons. The standard image near-dup
    fingerprint: robust to rescaling and light recompression, cheap
    enough to run at crawl scale.

    Output is the 64-bit hash as FOUR 16-bit bands (b0..b3, bit index
    oy*8+ox, band j = bits 16j..16j+15, LSB-first within a band):
    bands are what both consumers key on — exact-dup clustering
    groups on all four, near-dup candidate generation joins on any
    one (pigeonhole: two hashes within Hamming distance 3 agree on
    at least one of 4 bands) — and four small positive ints sidestep
    every signed-int64 shift hazard a packed 64-bit value has in
    cross-engine SQL. Integer arithmetic end-to-end: bit-exact
    reproducible on any engine, any platform.
    """
    import numpy as np

    if on_opaque not in ("error", "skip"):
        raise ValueError(f"on_opaque must be error|skip: {on_opaque}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DHASH_SCHEMA.fields]
        w16 = 1 << np.arange(16, dtype=np.int64)
        for pdf in batches:
            out: list[list[int]] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                dec = try_decode_image(bytes(p) if p is not None else b"")
                if dec is None:
                    if on_opaque == "error":
                        raise NotImplementedError(
                            "payload is neither PPM nor 24-bit BMP: "
                            "real media codec (Pillow/ffmpeg) not in "
                            "this container"
                        )
                    continue
                w, h, body = dec
                px = (
                    np.frombuffer(body, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                )
                gray = (
                    299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                ) // 1000
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                g = gray[ys][:, xs]
                bits = (g[:, 1:] > g[:, :-1]).astype(np.int64).ravel()
                out.append(
                    [int(mid)]
                    + [int((bits[16 * j : 16 * j + 16] * w16).sum())
                       for j in range(4)]
                )
            yield pd.DataFrame(out, columns=cols, dtype="int64")

    return df.mapInPandas(run, DHASH_SCHEMA)


def phash_clusters(hashes: DataFrame) -> DataFrame:
    """(media_id, b0..b3, cluster_id) — exact-dHash dedup groups over
    the band frame, cluster_id = min media_id sharing the full 64-bit
    hash; singletons cluster to themselves (total function, one row
    per media — manifest-friendly). One map-side-combinable groupBy on
    the four bands plus the keeper join; distinct-hash frame is
    bounded by |media|."""
    keep = hashes.groupBy("b0", "b1", "b2", "b3").agg(
        F.min("media_id").alias("cluster_id")
    )
    return hashes.join(keep, ["b0", "b1", "b2", "b3"]).select(
        "media_id", "b0", "b1", "b2", "b3", "cluster_id"
    )


def phash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    skew_bucket_max: int = 1024,
) -> DataFrame:
    """Near-duplicate REPRESENTATIVE pairs: (media_a, media_b, hamming,
    n_media_a, n_media_b) over DISTINCT hashes with 1 <= Hamming
    distance <= max_hamming, media_a/b = each hash group's min
    media_id, n_media_* = group sizes (the weight a collapse/review
    pass needs).

    The house dedup architecture: exact-hash groups collapse FIRST
    (phash_clusters), near-dup search runs on the distinct-hash frame
    only — a crawl with a thousand copies of one banner image costs
    one representative row here, never a member-pair explosion.
    Candidates come from a banded self-join (posexplode of the four
    16-bit bands; pigeonhole makes the 4-band join EXACT for
    max_hamming <= 3 — two hashes differing in <= 3 bits must agree
    on a full band), then one xor/bit_count verify per candidate.

    Band-value SKEW guard (round-6 verdict #4): a crawl dominated by
    near-flat images collapses many DISTINCT hashes onto identical
    16-bit band values (b0=0 etc.), making one band bucket quadratic
    even after the exact-hash collapse. Buckets whose rep count
    exceeds ``skew_bucket_max`` take a second-level EXACT refinement
    instead of the direct self-join: within a (band, value) bucket
    the bucket band already agrees, so the <= 3 remaining bit diffs
    live in the 48 bits of the other three bands — pigeonhole over
    four disjoint 12-bit sub-bands of those 48 bits means any
    matching pair agrees on at least one sub-band, and joining on
    (bucket, sub_idx, sub_val) is a lossless candidate superset that
    shatters the degenerate bucket 4096 ways by the diverse remaining
    bits (measured: 100k near-flat distinct hashes, one all-zero
    band — refined 19.7s vs a ~330s+ quadratic direct join; 20k slice
    direct 13.2s vs refined 4.4s, identical pair sets). Only
    degenerate buckets pay the 4x sub-band explode. Both sides of a
    bucket share its count, so the split never strands a pair; the
    final distinct() absorbs candidates found via multiple bands,
    same as before.

    max_hamming > 3 would need finer bands (8x8-bit) for exactness;
    rejected here rather than silently returning a subset.
    """
    if not (1 <= max_hamming <= 3):
        raise ValueError(
            "4x16-bit banding is pigeonhole-exact only for "
            f"max_hamming in 1..3, got {max_hamming}"
        )
    bands = ("b0", "b1", "b2", "b3")
    reps = hashes.groupBy(*bands).agg(
        F.min("media_id").alias("rep"), F.count("*").alias("n_media")
    )
    banded = reps.select(
        "rep",
        "n_media",
        *[F.col(c) for c in bands],
        F.posexplode(F.array(*bands)).alias("__bi", "__bv"),
    )
    counts = banded.groupBy("__bi", "__bv").agg(
        F.count("*").alias("__bn")
    )
    banded = banded.join(counts, ["__bi", "__bv"])
    ham = sum(
        F.bit_count(F.expr(f"a{c} ^ b{c}")) for c in bands
    )

    def pairs(src: DataFrame, extra_keys: list[str]) -> DataFrame:
        left = src.select(
            F.col("rep").alias("media_a"),
            F.col("n_media").alias("n_media_a"),
            *[F.col(c).alias(f"a{c}") for c in bands],
            "__bi",
            "__bv",
            *extra_keys,
        )
        right = src.select(
            F.col("rep").alias("media_b"),
            F.col("n_media").alias("n_media_b"),
            *[F.col(c).alias(f"b{c}") for c in bands],
            "__bi",
            "__bv",
            *extra_keys,
        )
        return (
            left.join(right, ["__bi", "__bv", *extra_keys])
            .where(F.col("media_a") < F.col("media_b"))
            .select(
                "media_a", "media_b", "n_media_a", "n_media_b",
                ham.cast("long").alias("hamming"),
            )
            .where(
                (F.col("hamming") >= 1) & (F.col("hamming") <= max_hamming)
            )
        )

    small = pairs(
        banded.where(F.col("__bn") <= skew_bucket_max), []
    )
    # second level: concatenate the three NON-bucket bands into one
    # 48-bit value and posexplode its four 12-bit sub-bands
    rem = F.expr(
        "CASE __bi"
        " WHEN 0 THEN b1 + shiftleft(b2, 16) + shiftleft(b3, 32)"
        " WHEN 1 THEN b0 + shiftleft(b2, 16) + shiftleft(b3, 32)"
        " WHEN 2 THEN b0 + shiftleft(b1, 16) + shiftleft(b3, 32)"
        " ELSE        b0 + shiftleft(b1, 16) + shiftleft(b2, 32) END"
    )
    subs = F.array(
        *[
            F.shiftright(rem, 12 * j).bitwiseAND(F.lit(4095))
            for j in range(4)
        ]
    )
    big = banded.where(F.col("__bn") > skew_bucket_max).select(
        "rep",
        "n_media",
        *bands,
        "__bi",
        "__bv",
        F.posexplode(subs).alias("__hi", "__hv"),
    )
    return (
        pairs(big, ["__hi", "__hv"])
        .unionByName(small)
        .select(
            "media_a", "media_b", "hamming", "n_media_a", "n_media_b"
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Audio: real dependency-free PCM WAV codec + integral feature stats
# ---------------------------------------------------------------------------

def try_decode_wav(payload: bytes) -> tuple[int, int, bytes] | None:
    """Parse a RIFF/WAVE container -> (sample_rate, n_channels,
    little-endian int16 PCM data bytes); None for anything that is not
    16-bit integer PCM (compressed/float audio is Pillow/ffmpeg
    territory — the same honest opaque-format posture as the image
    codecs). Chunk-walks the container, so extra chunks (LIST, fact)
    before or after fmt/data parse correctly."""
    p = payload
    if len(p) < 44 or p[0:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos, rate, channels, bits, fmt_ok, data = 12, None, None, None, False, None
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        size = int.from_bytes(p[pos + 4 : pos + 8], "little")
        body = p[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None  # truncated chunk
        if cid == b"fmt ":
            if size < 16:
                return None
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            fmt_ok = audio_format == 1 and bits == 16 and channels >= 1
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt_ok or data is None or rate in (None, 0):
        return None
    # truncate to WHOLE FRAMES (block_align = 2 bytes x channels): a
    # stereo file with a half-frame tail would otherwise decode with a
    # dangling single-channel sample that shifts channel interleaving
    # for every downstream consumer
    block = 2 * channels
    if len(data) % block:
        data = data[: (len(data) // block) * block]
    return rate, channels, data


def encode_wav(sample_rate: int, channels: int, pcm16: bytes) -> bytes:
    """Canonical minimal RIFF/WAVE for 16-bit PCM (the encoder twin
    try_decode_wav round-trips with)."""
    block = 2 * channels
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + (16).to_bytes(4, "little") + fmt
    body += b"data" + len(pcm16).to_bytes(4, "little") + pcm16
    return b"RIFF" + len(body).to_bytes(4, "little") + body


WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sum_sq", LongType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("min_s", LongType(), True),
        StructField("max_s", LongType(), True),
    ]
)


def wav_feature_stats(df: DataFrame, on_opaque: str = "error") -> DataFrame:
    """Decode PCM WAV payloads and emit integral audio features — the
    audio twin of ppm_feature_stats, mapInPandas over whole arrow
    batches, fully value-oracled (all int64): total energy (sum of
    squared samples over ALL channels — int64-safe to ~8.6e9
    samples/file at full scale), strict-sign zero crossings on
    CHANNEL 0 (s_i * s_{i+1} < 0 over consecutive frames — the
    classic cheap voiced/unvoiced + noisiness proxy; comparing across
    interleaved channel boundaries would be meaningless for stereo),
    sample extrema (clipping audit), exact
    duration_ms = frames * 1000 div rate where frames = n div
    channels (n_samples counts every channel's samples).

    ``on_opaque``: 'error' raises NotImplementedError on non-PCM16
    payloads (where ffmpeg would run); 'skip' quarantines them —
    the 100 TB posture."""
    import numpy as np

    if on_opaque not in ("error", "skip"):
        raise ValueError(f"on_opaque must be error|skip: {on_opaque}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WAV_STATS_SCHEMA.fields]
        for pdf in batches:
            out: list[list[int]] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                dec = try_decode_wav(bytes(p) if p is not None else b"")
                if dec is None:
                    if on_opaque == "error":
                        raise NotImplementedError(
                            "payload is not 16-bit PCM RIFF/WAVE: real "
                            "audio codec (ffmpeg) not in this container"
                        )
                    continue
                rate, ch, data = dec
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = len(s)
                frames = n // ch
                s0 = s[0::ch]  # channel 0 for the crossing count
                zc = (
                    int(((s0[:-1] * s0[1:]) < 0).sum())
                    if len(s0) > 1
                    else 0
                )
                out.append(
                    [
                        int(mid),
                        rate,
                        ch,
                        n,
                        frames * 1000 // rate,
                        int((s * s).sum()),
                        zc,
                        int(s.min()) if n else 0,
                        int(s.max()) if n else 0,
                    ]
                )
            yield pd.DataFrame(out, columns=cols, dtype="int64")

    return df.mapInPandas(run, WAV_STATS_SCHEMA)


def documents_as_wav_media(df: DataFrame) -> DataFrame:
    """Synthesize REAL binary PCM-WAV payloads from the documents
    table, entirely JVM-side (the audio twin of documents_as_ppm_media):
    unsigned 16-bit word i of doc d is u_i = (d*31 + i) % 65536 over
    n = 32 + n_chars % 64 mono samples at 8000 Hz — decoded int16
    s_i = u_i - 65536 if u_i >= 32768 else u_i, so a SQL oracle
    recomputes every decoded statistic closed-form. Little-endian hex
    assembly + unhex; all header u16/u32 fields fit two bytes here
    (n <= 95 -> data 190 bytes) and are padded with explicit zero
    bytes."""
    n = (F.lit(32) + F.col("n_chars") % 64).cast("long")
    word = lambda v: F.concat(  # noqa: E731 — LE u16 hex of v < 65536
        F.lpad(F.hex(v % 256), 2, "0"), F.lpad(F.hex((v / 256).cast("long") % 256), 2, "0")
    )
    data_hex = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), (n - 1).cast("int")),
            lambda i: word((F.col("doc_id") * 31 + i.cast("long")) % 65536),
        ),
    )
    # RIFF size = 36 + 2n, data size = 2n; both < 65536 -> two LE bytes
    # + two explicit zero bytes
    riff_hex = F.concat(word(F.lit(36).cast("long") + 2 * n), F.lit("0000"))
    data_sz_hex = F.concat(word(2 * n), F.lit("0000"))
    # fmt chunk for mono PCM16 @ 8000 Hz: constant 16-byte body
    fmt_hex = (
        "01000100"          # audio_format=1, channels=1
        "401F0000"          # sample_rate 8000
        "803E0000"          # byte_rate 16000
        "02001000"          # block_align 2, bits 16
    )
    payload_hex = F.concat(
        F.lit("52494646"),          # 'RIFF'
        riff_hex,
        F.lit("57415645666D7420"),  # 'WAVEfmt '
        F.lit("10000000"),          # fmt size 16
        F.lit(fmt_hex),
        F.lit("64617461"),          # 'data'
        data_sz_hex,
        data_hex,
    )
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("media_type"),
        F.lit("audio/wav").alias("mime"),
        F.unhex(payload_hex).alias("payload"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        (n * 1000 / 8000).cast("long").alias("duration_ms"),
    )


# ---------------------------------------------------------------------------
# Video: real dependency-free RIFF-AVI container walk (frame offsets,
# sizes, timing — no pixel decode). The honest video analog of
# try_decode_wav: MJPEG/raw frame BYTES stay opaque (that is ffmpeg
# territory), but the container structure — where every frame lives,
# how big it is, when it plays — is pure byte-slicing, which is exactly
# what a 100 TB frame-extraction pipeline needs to PLAN work: a decode
# fleet consumes (byte_offset, n_bytes) manifests, never whole files.
# ---------------------------------------------------------------------------


def _u16b(v: int) -> bytes:
    return int(v).to_bytes(2, "little")


def _u32b(v: int) -> bytes:
    return int(v).to_bytes(4, "little")


def encode_avi(
    us_per_frame: int,
    width: int,
    height: int,
    frames: list[bytes],
    audio: list[bytes] | None = None,
) -> bytes:
    """Canonical minimal RIFF-AVI container for one MJPG video stream —
    optionally with a second PCM audio stream whose '01wb' chunks
    interleave 1:1 after each video frame (classic muxer layout) —
    (the encoder twin try_parse_avi round-trips with): LIST hdrl
    (avih + one strl per stream), LIST movi with word-aligned chunks,
    and a full idx1 over EVERY stream chunk in container order, offsets
    in the usual convention — relative to the 'movi' fourcc (first
    chunk at offset 4)."""
    n = len(frames)
    if audio is not None and len(audio) != n:
        raise ValueError("audio chunks must interleave 1:1 with frames")
    max_sz = max((len(f) for f in frames), default=0)
    avih = (
        _u32b(us_per_frame) + _u32b(0) + _u32b(0) + _u32b(0x10)  # HASINDEX
        + _u32b(n) + _u32b(0) + _u32b(2 if audio is not None else 1)
        + _u32b(max_sz)
        + _u32b(width) + _u32b(height) + _u32b(0) * 4
    )
    strh = (
        b"vids" + b"MJPG" + _u32b(0) + _u16b(0) + _u16b(0) + _u32b(0)
        + _u32b(us_per_frame) + _u32b(1_000_000)  # scale/rate -> fps
        + _u32b(0) + _u32b(n) + _u32b(max_sz) + _u32b(0) + _u32b(0)
        + _u16b(0) + _u16b(0) + _u16b(width) + _u16b(height)  # rcFrame
    )
    strf = (
        _u32b(40) + _u32b(width) + _u32b(height) + _u16b(1) + _u16b(24)
        + b"MJPG" + _u32b(width * height * 3)
        + _u32b(0) + _u32b(0) + _u32b(0) + _u32b(0)
    )
    strl = b"LIST" + _u32b(4 + 8 + 56 + 8 + 40) + b"strl"
    strl += b"strh" + _u32b(56) + strh + b"strf" + _u32b(40) + strf
    if audio is not None:
        a_strh = (
            b"auds" + _u32b(0) + _u32b(0) + _u16b(0) + _u16b(0) + _u32b(0)
            + _u32b(1) + _u32b(8000)  # scale/rate: 8 kHz sample clock
            + _u32b(0) + _u32b(sum(len(a) for a in audio) // 2)  # samples
            + _u32b(max((len(a) for a in audio), default=0))
            + _u32b(0) + _u32b(2)  # sample_size: PCM16 mono block
            + _u16b(0) * 4
        )
        a_strf = (  # WAVEFORMATEX, PCM16 mono 8 kHz, no cbSize
            _u16b(1) + _u16b(1) + _u32b(8000) + _u32b(16000)
            + _u16b(2) + _u16b(16)
        )
        strl += b"LIST" + _u32b(4 + 8 + 56 + 8 + 16) + b"strl"
        strl += b"strh" + _u32b(56) + a_strh + b"strf" + _u32b(16) + a_strf
    hdrl = b"LIST" + _u32b(4 + 8 + 56 + len(strl)) + b"hdrl"
    hdrl += b"avih" + _u32b(56) + avih + strl
    chunks = b""
    idx1 = b""
    for i, f in enumerate(frames):
        # idx1 offset: position of this chunk's fourcc relative to the
        # 'movi' fourcc; chunks start right after the 4-byte list type
        idx1 += b"00dc" + _u32b(0x10) + _u32b(4 + len(chunks)) + _u32b(len(f))
        chunks += b"00dc" + _u32b(len(f)) + f + (b"\x00" if len(f) & 1 else b"")
        if audio is not None:
            a = audio[i]
            idx1 += (
                b"01wb" + _u32b(0x10) + _u32b(4 + len(chunks)) + _u32b(len(a))
            )
            chunks += (
                b"01wb" + _u32b(len(a)) + a + (b"\x00" if len(a) & 1 else b"")
            )
    movi = b"LIST" + _u32b(4 + len(chunks)) + b"movi" + chunks
    body = b"AVI " + hdrl + movi + b"idx1" + _u32b(len(idx1)) + idx1
    return b"RIFF" + _u32b(len(body)) + body


def _avi_walk_hdrl(p: bytes, pos: int, end: int):
    """Sub-walk of LIST hdrl -> (avih fields dict | None, strh 'vids'
    fields dict | None)."""
    avih = None
    strh = None
    while pos + 8 <= end:
        cid = p[pos : pos + 4]
        size = int.from_bytes(p[pos + 4 : pos + 8], "little")
        if pos + 8 + size > end:
            return None, None
        body = p[pos + 8 : pos + 8 + size]
        if cid == b"avih" and size >= 56:
            u = lambda o: int.from_bytes(body[o : o + 4], "little")  # noqa: E731
            avih = {
                "us_per_frame": u(0),
                "total_frames": u(16),
                "width": u(32),
                "height": u(36),
            }
        elif cid == b"LIST" and size >= 4 and body[:4] == b"strl":
            spos, send = pos + 12, pos + 8 + size
            while spos + 8 <= send:
                scid = p[spos : spos + 4]
                ssize = int.from_bytes(p[spos + 4 : spos + 8], "little")
                sbody = p[spos + 8 : spos + 8 + ssize]
                if (
                    scid == b"strh"
                    and ssize >= 56
                    and sbody[:4] == b"vids"
                    and strh is None
                ):
                    strh = {
                        "scale": int.from_bytes(sbody[20:24], "little"),
                        "rate": int.from_bytes(sbody[24:28], "little"),
                        "length": int.from_bytes(sbody[32:36], "little"),
                    }
                spos += 8 + ssize + (ssize & 1)
        pos += 8 + size + (size & 1)
    return avih, strh


def _avi_walk_movi(p: bytes, pos: int, end: int):
    """Sub-walk of LIST movi -> list of (fourcc, abs_chunk_pos, size)
    for stream chunks in container order — video ('##dc' compressed /
    '##db' uncompressed) AND audio ('##wb') — descending one level into
    'rec ' grouping LISTs; None on a truncated chunk."""
    chunks: list[tuple[bytes, int, int]] = []
    while pos + 8 <= end:
        cid = p[pos : pos + 4]
        size = int.from_bytes(p[pos + 4 : pos + 8], "little")
        if pos + 8 + size > end:
            return None
        if cid == b"LIST" and size >= 4 and p[pos + 8 : pos + 12] == b"rec ":
            sub = _avi_walk_movi(p, pos + 12, pos + 8 + size)
            if sub is None:
                return None
            chunks.extend(sub)
        elif cid[2:4] in (b"dc", b"db", b"wb") and cid[:2].isdigit():
            chunks.append((cid, pos, size))
        pos += 8 + size + (size & 1)
    return chunks


def try_parse_avi(payload: bytes) -> dict | None:
    """Chunk-walk a RIFF-AVI container -> dict with header timing/dims,
    per-frame (absolute_data_offset, size, byte_checksum), and an idx1
    consistency verdict; None for anything that is not a well-formed
    AVI (a WAV is RIFF too — rejected on the 'AVI ' form type). Frame
    PIXELS are never decoded — MJPEG entropy decode is ffmpeg
    territory; the checksum sums the raw chunk bytes so consumers can
    verify the manifest actually addressed the payload.

    idx1 offsets come in two common conventions — relative to the
    'movi' fourcc, or absolute file offsets of the chunk header. The
    convention is inferred from the FIRST entry and then required of
    the WHOLE index: per-entry acceptance would let a mixed or
    partially corrupted index score consistent whenever a bad offset
    coincidentally matched the other convention.

    A structurally valid container whose avih carries
    dwMicroSecPerFrame == 0 PARSES (us_per_frame = 0 in the result) —
    it is not confused with a non-AVI payload; callers route it as a
    distinct degenerate-timing reject (_avi_gate)."""
    p = payload
    if len(p) < 12 or p[0:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    pos, avih, strh, chunks, idx1, movi_fcc = 12, None, None, None, None, None
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        size = int.from_bytes(p[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(p):
            return None
        if cid == b"LIST" and size >= 4:
            ltype = p[pos + 8 : pos + 12]
            if ltype == b"hdrl":
                avih, strh = _avi_walk_hdrl(p, pos + 12, pos + 8 + size)
            elif ltype == b"movi":
                movi_fcc = pos + 8
                chunks = _avi_walk_movi(p, pos + 12, pos + 8 + size)
                if chunks is None:
                    return None
        elif cid == b"idx1":
            if size % 16:
                return None
            idx1 = [
                (
                    p[pos + 8 + k : pos + 12 + k],
                    int.from_bytes(p[pos + 16 + k : pos + 20 + k], "little"),
                    int.from_bytes(p[pos + 20 + k : pos + 24 + k], "little"),
                )
                for k in range(0, size, 16)
            ]
        pos += 8 + size + (size & 1)
    if avih is None or chunks is None:
        return None
    out_frames = [
        (cpos + 8, sz, sum(p[cpos + 8 : cpos + 8 + sz]))
        for cid, cpos, sz in chunks
        if cid[2:4] in (b"dc", b"db")
    ]
    out_audio = [
        (cpos + 8, sz, sum(p[cpos + 8 : cpos + 8 + sz]))
        for cid, cpos, sz in chunks
        if cid[2:4] == b"wb"
    ]
    # the index covers EVERY stream chunk in container order (audio
    # included) — entry fourcc must match the chunk's own
    idx1_ok = None
    if idx1 is not None:
        ok = len(idx1) == len(chunks)
        if ok and idx1:
            # pick ONE convention from the first entry, hold the whole
            # index to it
            ioff0, cpos0 = idx1[0][1], chunks[0][1]
            if ioff0 == cpos0 - movi_fcc:
                delta = movi_fcc
            elif ioff0 == cpos0:
                delta = 0
            else:
                delta = None
            ok = delta is not None and all(
                ifcc == cid and isz == sz and ioff == cpos - delta
                for (ifcc, ioff, isz), (cid, cpos, sz) in zip(idx1, chunks)
            )
        idx1_ok = int(ok)
    return {
        "us_per_frame": avih["us_per_frame"],
        "width": avih["width"],
        "height": avih["height"],
        "hdr_frames": avih["total_frames"],
        "stream_frames": strh["length"] if strh else None,
        "frames": out_frames,
        "audio": out_audio,
        "kinds": b"".join(
            b"v" if cid[2:4] in (b"dc", b"db") else b"a"
            for cid, _, _ in chunks
        ),
        "idx1_ok": idx1_ok,
    }


AVI_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("us_per_frame", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("total_frame_bytes", LongType(), True),
        StructField("min_frame_bytes", LongType(), True),
        StructField("max_frame_bytes", LongType(), True),
        StructField("header_frames_ok", LongType(), True),
        StructField("idx1_ok", LongType(), True),
    ]
)

AVI_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("byte_offset", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("pts_ms", LongType(), False),
        StructField("checksum", LongType(), False),
        StructField("sampled", LongType(), False),
    ]
)


def _opaque_avi(on_opaque: str) -> None:
    if on_opaque == "error":
        raise NotImplementedError(
            "payload is not a RIFF-AVI container: real video demuxing "
            "(ffmpeg) not in this container"
        )


def _avi_gate(payload: bytes, on_opaque: str) -> dict | None:
    """Parse-or-quarantine for one payload: the parsed AVI dict, or
    None after routing the reject per ``on_opaque``. A structurally
    valid container with dwMicroSecPerFrame == 0 is a DISTINCT reject
    class from not-an-AVI: its timing manifest would be meaningless
    (every pts collapses to 0), so it quarantines like an opaque
    payload but errors with its own message instead of the misleading
    'not a RIFF-AVI container'."""
    v = try_parse_avi(payload)
    if v is None:
        _opaque_avi(on_opaque)
        return None
    if not v["us_per_frame"]:
        if on_opaque == "error":
            raise NotImplementedError(
                "structurally valid RIFF-AVI with zero "
                "dwMicroSecPerFrame: timing is degenerate — "
                "quarantined rather than emitting all-zero pts"
            )
        return None
    return v


def avi_video_stats(df: DataFrame, on_opaque: str = "error") -> DataFrame:
    """Parse AVI payloads and emit per-file container stats — all
    int64, fully value-oracleable: dimensions and frame timing from
    avih, frame count/size distribution from the movi walk (never
    trusted from the header: header_frames_ok cross-checks avih
    total_frames AND strh length against the walked count), and the
    idx1 verdict (1 = every entry matches the walk, 0 = index
    disagrees, -1 = container carries no idx1). ``on_opaque``:
    'error' raises on non-AVI payloads,
    'skip' quarantines them — the 100 TB posture."""
    if on_opaque not in ("error", "skip"):
        raise ValueError(f"on_opaque must be error|skip: {on_opaque}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AVI_STATS_SCHEMA.fields]
        for pdf in batches:
            out: list[list[int]] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                v = _avi_gate(bytes(p) if p is not None else b"", on_opaque)
                if v is None:
                    continue
                szs = [sz for _, sz, _ in v["frames"]]
                nf = len(szs)
                hdr_ok = int(
                    v["hdr_frames"] == nf
                    and (v["stream_frames"] in (None, nf))
                )
                out.append(
                    [
                        int(mid),
                        v["width"],
                        v["height"],
                        nf,
                        v["us_per_frame"],
                        nf * v["us_per_frame"] // 1000,
                        sum(szs),
                        min(szs) if szs else 0,
                        max(szs) if szs else 0,
                        hdr_ok,
                        v["idx1_ok"] if v["idx1_ok"] is not None else -1,
                    ]
                )
            yield pd.DataFrame(out, columns=cols, dtype="int64")

    return df.mapInPandas(run, AVI_STATS_SCHEMA)


def avi_frame_plan(
    df: DataFrame, sample_stride: int = 3, on_opaque: str = "error"
) -> DataFrame:
    """The frame-extraction MANIFEST: one row per video frame with its
    absolute byte range in the source object, presentation time, a
    byte checksum (proof the walk addressed the real payload), and a
    deterministic every-``sample_stride``-th sampling flag — what a
    downstream decode fleet range-reads instead of whole files. Rows
    are container METADATA (~30 bytes each), so the explode is
    manifest-scale, never payload-scale."""
    if sample_stride < 1:
        raise ValueError(f"sample_stride must be >= 1: {sample_stride}")
    if on_opaque not in ("error", "skip"):
        raise ValueError(f"on_opaque must be error|skip: {on_opaque}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AVI_FRAME_SCHEMA.fields]
        for pdf in batches:
            out: list[list[int]] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                v = _avi_gate(bytes(p) if p is not None else b"", on_opaque)
                if v is None:
                    continue
                upf = v["us_per_frame"]
                for i, (off, sz, ck) in enumerate(v["frames"]):
                    out.append(
                        [
                            int(mid),
                            i,
                            off,
                            sz,
                            i * upf // 1000,
                            ck,
                            int(i % sample_stride == 0),
                        ]
                    )
            yield pd.DataFrame(out, columns=cols, dtype="int64")

    return df.mapInPandas(run, AVI_FRAME_SCHEMA)


def documents_as_avi_media(df: DataFrame) -> DataFrame:
    """Synthesize REAL RIFF-AVI containers from the documents table,
    entirely JVM-side (the video twin of documents_as_wav_media),
    byte-identical to ``encode_avi`` for the same parameters (pinned
    by test): doc d carries n = 2 + n_chars % 6 frames of
    width = 16*(1 + d%3) x height = 8*(1 + n_chars%4) at
    us_per_frame = 20000 + 5000*(d%5); frame i is
    16 + 2*((d*7 + 13*i) % 16) bytes, byte j of frame i =
    (d*31 + 17*i + j) % 256 — every container statistic,
    frame offset and checksum is recomputable closed-form by a SQL
    oracle. Hex assembly + unhex, as the WAV/PPM synthesizers do."""
    d = F.col("doc_id").cast("long")
    n = (F.lit(2) + F.col("n_chars") % 6).cast("long")
    upf = (F.lit(20000) + 5000 * (d % 5)).cast("long")
    width = (16 * (1 + d % 3)).cast("long")
    height = (8 * (1 + F.col("n_chars") % 4)).cast("long")
    word = lambda v: F.concat(  # noqa: E731 — LE u16 hex of v < 65536
        F.lpad(F.hex(v % 256), 2, "0"),
        F.lpad(F.hex((v / 256).cast("long") % 256), 2, "0"),
    )
    dword = lambda v: F.concat(word(v % 65536), word((v / 65536).cast("long")))  # noqa: E731
    idx = F.sequence(F.lit(0), (n - 1).cast("int"))
    szs = F.transform(
        idx, lambda i: (F.lit(16) + 2 * ((d * 7 + 13 * i.cast("long")) % 16))
    )
    s_total = F.aggregate(szs, F.lit(0).cast("long"), lambda a, x: a + x)
    max_sz = F.array_max(szs).cast("long")
    zero4 = F.lit("00000000")
    avih_hex = F.concat(
        dword(upf), zero4, zero4, F.lit("10000000"),  # flags HASINDEX
        dword(n), zero4, F.lit("01000000"), dword(max_sz),
        dword(width), dword(height), zero4, zero4, zero4, zero4,
    )
    strh_hex = F.concat(
        F.lit("76696473"), F.lit("4D4A5047"), zero4,  # vids MJPG flags
        F.lit("00000000"),                            # prio u16 + lang u16
        zero4, dword(upf), F.lit("40420F00"),         # init, scale, rate=1e6
        zero4, dword(n), dword(max_sz), zero4, zero4,
        F.lit("00000000"), word(width), word(height),  # rcFrame
    )
    strf_hex = F.concat(
        F.lit("28000000"), dword(width), dword(height),
        F.lit("01001800"), F.lit("4D4A5047"),  # planes 1, 24bpp, MJPG
        dword(width * height * 3), zero4, zero4, zero4, zero4,
    )
    hdrl_hex = F.concat(
        F.lit("4C495354"), F.lit("C0000000"), F.lit("6864726C"),  # LIST 192 hdrl
        F.lit("61766968"), F.lit("38000000"), avih_hex,           # avih 56
        F.lit("4C495354"), F.lit("74000000"), F.lit("7374726C"),  # LIST 116 strl
        F.lit("73747268"), F.lit("38000000"), strh_hex,           # strh 56
        F.lit("73747266"), F.lit("28000000"), strf_hex,           # strf 40
    )
    prefix = lambda i: F.coalesce(  # noqa: E731 — sum of szs[0..i-1]
        F.aggregate(
            F.slice(szs, F.lit(1), i), F.lit(0).cast("long"), lambda a, x: a + x
        ),
        F.lit(0).cast("long"),
    )
    chunks_hex = F.concat_ws(
        "",
        F.transform(
            idx,
            lambda i: F.concat(
                F.lit("30306463"),  # '00dc'
                dword(F.element_at(szs, i + 1).cast("long")),
                F.concat_ws(
                    "",
                    F.transform(
                        F.sequence(
                            F.lit(0),
                            (F.element_at(szs, i + 1) - 1).cast("int"),
                        ),
                        lambda j: F.lpad(
                            F.hex(
                                (d * 31 + 17 * i.cast("long") + j.cast("long"))
                                % 256
                            ),
                            2,
                            "0",
                        ),
                    ),
                ),
            ),
        ),
    )
    idx1_hex = F.concat_ws(
        "",
        F.transform(
            idx,
            lambda i: F.concat(
                F.lit("30306463"), F.lit("10000000"),  # '00dc', AVIIF_KEYFRAME
                dword(F.lit(4).cast("long") + 8 * i.cast("long") + prefix(i)),
                dword(F.element_at(szs, i + 1).cast("long")),
            ),
        ),
    )
    movi_sz = (F.lit(4) + 8 * n + s_total).cast("long")
    riff_sz = (F.lit(224) + 24 * n + s_total).cast("long")
    payload_hex = F.concat(
        F.lit("52494646"), dword(riff_sz), F.lit("41564920"),  # RIFF .. 'AVI '
        hdrl_hex,
        F.lit("4C495354"), dword(movi_sz), F.lit("6D6F7669"),  # LIST .. movi
        chunks_hex,
        F.lit("69647831"), dword(16 * n), idx1_hex,            # idx1
    )
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("media_type"),
        F.lit("video/x-msvideo").alias("mime"),
        F.unhex(payload_hex).alias("payload"),
        width.alias("width"),
        height.alias("height"),
        (n * upf / 1000).cast("long").alias("duration_ms"),
    )


def scene_cut_candidates(
    frames: DataFrame, threshold_permille: int = 300
) -> DataFrame:
    """Shot-boundary CANDIDATES from compressed-frame size spikes — the
    classic decode-free MJPEG heuristic: intra-coded frame size tracks
    visual complexity, so a large relative jump against the previous
    frame flags a likely scene change worth sending to the (expensive)
    pixel-level verifier. Input is the avi_frame_plan manifest; the
    window shuffles MANIFEST rows only (~30 bytes/frame), never
    payloads. All-integer: a frame is a candidate when
    abs(sz - prev) * 1000 >= threshold_permille * prev (prev > 0).
    abs_delta_permille uses abs-first floor-div so Spark and SQL
    oracles agree on every row (signed floor-vs-trunc never enters)."""
    from pyspark.sql import Window

    if threshold_permille < 1:
        raise ValueError(
            f"threshold_permille must be >= 1: {threshold_permille}"
        )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    delta = F.abs(F.col("n_bytes") - F.col("prev_bytes"))
    return (
        frames.select("media_id", "frame_idx", "pts_ms", "n_bytes")
        .withColumn("prev_bytes", F.lag("n_bytes").over(w))
        .where(
            F.col("prev_bytes").isNotNull()
            & (F.col("prev_bytes") > 0)
            & (delta * 1000 >= threshold_permille * F.col("prev_bytes"))
        )
        .select(
            "media_id",
            "frame_idx",
            "pts_ms",
            "prev_bytes",
            "n_bytes",
            F.expr(
                "div(abs(n_bytes - prev_bytes) * 1000, prev_bytes)"
            ).alias("abs_delta_permille"),
        )
    )


AV_DEMUX_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_video_frames", LongType(), True),
        StructField("n_audio_chunks", LongType(), True),
        StructField("video_bytes", LongType(), True),
        StructField("audio_bytes", LongType(), True),
        StructField("video_checksum", LongType(), True),
        StructField("audio_checksum", LongType(), True),
        StructField("interleave_ok", LongType(), True),
        StructField("idx1_ok", LongType(), True),
    ]
)


def avi_av_demux(df: DataFrame, on_opaque: str = "error") -> DataFrame:
    """Per-STREAM accounting over interleaved A/V containers — the
    demux audit a multimodal ingest runs before splitting modalities
    into their own pipelines: video and audio chunk counts/bytes/
    checksums from one container walk, plus an interleave verdict
    (1 = strict v,a,v,a alternation with equal counts — the layout a
    well-muxed file has and a seek-friendly consumer expects; 0 =
    present but irregular; -1 = no audio stream) and the idx1 verdict
    (the index must cover EVERY stream chunk in container order).
    Byte totals are what the per-modality extraction jobs get sized
    by; checksums prove both streams' bytes were actually addressed."""
    if on_opaque not in ("error", "skip"):
        raise ValueError(f"on_opaque must be error|skip: {on_opaque}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AV_DEMUX_SCHEMA.fields]
        for pdf in batches:
            out: list[list[int]] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                v = _avi_gate(bytes(p) if p is not None else b"", on_opaque)
                if v is None:
                    continue
                nv, na = len(v["frames"]), len(v["audio"])
                if na == 0:
                    inter = -1
                else:
                    inter = int(v["kinds"] == b"va" * nv and nv == na)
                out.append(
                    [
                        int(mid),
                        nv,
                        na,
                        sum(sz for _, sz, _ in v["frames"]),
                        sum(sz for _, sz, _ in v["audio"]),
                        sum(ck for _, _, ck in v["frames"]),
                        sum(ck for _, _, ck in v["audio"]),
                        inter,
                        v["idx1_ok"] if v["idx1_ok"] is not None else -1,
                    ]
                )
            yield pd.DataFrame(out, columns=cols, dtype="int64")

    return df.mapInPandas(run, AV_DEMUX_SCHEMA)


def documents_as_av_media(df: DataFrame) -> DataFrame:
    """Synthesize REAL two-stream RIFF-AVI containers (MJPG video +
    PCM audio, '00dc'/'01wb' chunks interleaved 1:1) from documents,
    JVM-side, byte-identical to ``encode_avi(..., audio=...)`` for the
    same parameters (pinned by test). Video formulas are identical to
    documents_as_avi_media; audio chunk i of doc d is
    8 + 2*((d*3 + 7*i) % 8) bytes with byte j = (d*13 + 5*i + j) % 256
    — every demux statistic is SQL-recomputable closed-form."""
    d = F.col("doc_id").cast("long")
    n = (F.lit(2) + F.col("n_chars") % 6).cast("long")
    upf = (F.lit(20000) + 5000 * (d % 5)).cast("long")
    width = (16 * (1 + d % 3)).cast("long")
    height = (8 * (1 + F.col("n_chars") % 4)).cast("long")
    word = lambda v: F.concat(  # noqa: E731
        F.lpad(F.hex(v % 256), 2, "0"),
        F.lpad(F.hex((v / 256).cast("long") % 256), 2, "0"),
    )
    dword = lambda v: F.concat(word(v % 65536), word((v / 65536).cast("long")))  # noqa: E731
    idx = F.sequence(F.lit(0), (n - 1).cast("int"))
    szs = F.transform(
        idx, lambda i: (F.lit(16) + 2 * ((d * 7 + 13 * i.cast("long")) % 16))
    )
    aszs = F.transform(
        idx, lambda i: (F.lit(8) + 2 * ((d * 3 + 7 * i.cast("long")) % 8))
    )
    s_total = F.aggregate(szs, F.lit(0).cast("long"), lambda a, x: a + x)
    a_total = F.aggregate(aszs, F.lit(0).cast("long"), lambda a, x: a + x)
    max_sz = F.array_max(szs).cast("long")
    max_asz = F.array_max(aszs).cast("long")
    zero4 = F.lit("00000000")
    avih_hex = F.concat(
        dword(upf), zero4, zero4, F.lit("10000000"),
        dword(n), zero4, F.lit("02000000"), dword(max_sz),  # 2 streams
        dword(width), dword(height), zero4, zero4, zero4, zero4,
    )
    strh_hex = F.concat(
        F.lit("76696473"), F.lit("4D4A5047"), zero4,
        F.lit("00000000"),
        zero4, dword(upf), F.lit("40420F00"),
        zero4, dword(n), dword(max_sz), zero4, zero4,
        F.lit("00000000"), word(width), word(height),
    )
    strf_hex = F.concat(
        F.lit("28000000"), dword(width), dword(height),
        F.lit("01001800"), F.lit("4D4A5047"),
        dword(width * height * 3), zero4, zero4, zero4, zero4,
    )
    a_strh_hex = F.concat(
        F.lit("61756473"), zero4, zero4,            # 'auds', handler, flags
        F.lit("00000000"),                          # prio + lang
        zero4, F.lit("01000000"), F.lit("401F0000"),  # init, scale 1, rate 8k
        zero4, dword((a_total / 2).cast("long")),   # start, length (samples)
        dword(max_asz), zero4, F.lit("02000000"),   # sugbuf, quality, ssize
        F.lit("0000000000000000"),                  # rcFrame
    )
    a_strf_hex = F.lit("01000100401F0000803E000002001000")  # PCM16 mono 8k
    hdrl_hex = F.concat(
        F.lit("4C495354"), F.lit("24010000"), F.lit("6864726C"),  # LIST 292
        F.lit("61766968"), F.lit("38000000"), avih_hex,
        F.lit("4C495354"), F.lit("74000000"), F.lit("7374726C"),  # strl 116
        F.lit("73747268"), F.lit("38000000"), strh_hex,
        F.lit("73747266"), F.lit("28000000"), strf_hex,
        F.lit("4C495354"), F.lit("5C000000"), F.lit("7374726C"),  # strl 92
        F.lit("73747268"), F.lit("38000000"), a_strh_hex,
        F.lit("73747266"), F.lit("10000000"), a_strf_hex,
    )
    # combined prefix: sum over j < i of (16 + sz_j + asz_j)
    prefix = lambda i: F.coalesce(  # noqa: E731
        F.aggregate(
            F.slice(F.zip_with(szs, aszs, lambda a, b: a + b + 16), F.lit(1), i),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
        F.lit(0).cast("long"),
    )
    byte_hex = lambda base, i, j: F.lpad(F.hex((base + j.cast("long")) % 256), 2, "0")  # noqa: E731
    chunks_hex = F.concat_ws(
        "",
        F.transform(
            idx,
            lambda i: F.concat(
                F.lit("30306463"),
                dword(F.element_at(szs, i + 1).cast("long")),
                F.concat_ws(
                    "",
                    F.transform(
                        F.sequence(
                            F.lit(0), (F.element_at(szs, i + 1) - 1).cast("int")
                        ),
                        lambda j: byte_hex(
                            d * 31 + 17 * i.cast("long"), i, j
                        ),
                    ),
                ),
                F.lit("30317762"),  # '01wb'
                dword(F.element_at(aszs, i + 1).cast("long")),
                F.concat_ws(
                    "",
                    F.transform(
                        F.sequence(
                            F.lit(0),
                            (F.element_at(aszs, i + 1) - 1).cast("int"),
                        ),
                        lambda j: byte_hex(
                            d * 13 + 5 * i.cast("long"), i, j
                        ),
                    ),
                ),
            ),
        ),
    )
    idx1_hex = F.concat_ws(
        "",
        F.transform(
            idx,
            lambda i: F.concat(
                F.lit("30306463"), F.lit("10000000"),
                dword(F.lit(4).cast("long") + prefix(i)),
                dword(F.element_at(szs, i + 1).cast("long")),
                F.lit("30317762"), F.lit("10000000"),
                dword(
                    F.lit(12).cast("long")
                    + prefix(i)
                    + F.element_at(szs, i + 1).cast("long")
                ),
                dword(F.element_at(aszs, i + 1).cast("long")),
            ),
        ),
    )
    movi_sz = (F.lit(4) + 16 * n + s_total + a_total).cast("long")
    riff_sz = (F.lit(324) + 48 * n + s_total + a_total).cast("long")
    payload_hex = F.concat(
        F.lit("52494646"), dword(riff_sz), F.lit("41564920"),
        hdrl_hex,
        F.lit("4C495354"), dword(movi_sz), F.lit("6D6F7669"),
        chunks_hex,
        F.lit("69647831"), dword(32 * n), idx1_hex,
    )
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("media_type"),
        F.lit("video/x-msvideo").alias("mime"),
        F.unhex(payload_hex).alias("payload"),
        width.alias("width"),
        height.alias("height"),
        (n * upf / 1000).cast("long").alias("duration_ms"),
    )
