"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side design is the real thing — explicit schemas, Arrow-batched
`mapInPandas` operators, partition-friendly shapes. The codec layer ships a
pure-stdlib PNG decoder (`_decode_png_stdlib`: zlib inflate, all five PNG
filters, color types 0/2/3/4/6), so `decode_image` executes with zero
third-party image libraries; when Pillow IS installed it is preferred and
the two paths are byte-identical (fixed-point ITU-R 601-2 luma). The
feature/resize/frame ops additionally accept DETERMINISTIC FAKE RASTERS
decoded from raw payload bytes (payload byte i = pixel i of a row-major
grayscale grid, sized by the metadata) for codec-free pipeline tests.

Scale notes:
  - Payload bytes never pass through the JVM<->Python boundary row-by-row:
    mapInPandas moves whole Arrow record batches, and each batch is
    processed as one numpy block operation.
  - Media rows are heavy; `target_batch_rows` documents the knob
    (spark.sql.execution.arrow.maxRecordsPerBatch) a deployment sizes so a
    batch of decoded rasters fits executor memory.
  - Feature extraction projects only (media_id, payload, metadata) — wide
    media tables prune to exactly these columns at the scan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
            False,
        ),
    ]
)


def _deterministic_bytes(seed: str, n: int) -> bytes:
    """Seeded pseudo-random bytes via an md5 chain (no RNG state, fully
    reproducible across processes)."""
    out = bytearray()
    block = seed.encode()
    while len(out) < n:
        block = hashlib.md5(block).digest()
        out.extend(block)
    return bytes(out[:n])


def synthesize_media(
    spark: SparkSession, n_images: int = 8, n_videos: int = 2, w: int = 16, h: int = 12
) -> DataFrame:
    """Deterministic fake media table for tests/demos (stands in for a real
    parquet-with-binary source)."""
    rows = []
    for i in range(n_images):
        payload = _deterministic_bytes(f"img-{i}", w * h)
        rows.append((i, "image", bytearray(payload), (w, h, 1, None, None)))
    for j in range(n_videos):
        frames = 6
        payload = _deterministic_bytes(f"vid-{j}", w * h * frames)
        rows.append(
            (1000 + j, "video", bytearray(payload), (w, h, 1, None, frames))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def have_image_codec() -> bool:
    try:  # pragma: no cover - environment-dependent
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


_DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, "
    "raster binary"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_to_gray(rgb):
    """PIL-parity RGB->L luma: the exact fixed-point ITU-R 601-2 formula
    Pillow's convert("L") uses — (R*19595 + G*38470 + B*7471 + 0x8000)
    >> 16 — so the stdlib and PIL decode paths produce identical bytes."""
    import numpy as np

    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def _decode_png_stdlib(data: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG decoder (zlib + struct + numpy): critical chunks,
    scanline unfiltering (all five filter types), 8-bit depth, color
    types 0/2/3/4/6, grayscale output. Returns (width, height, raster).
    Adam7 interlacing and sub-byte depths are out of scope (raise);
    non-PNG payloads raise ValueError. Filters 1/3/4 carry a serial
    data dependency along x, so those scanlines decode in a per-pixel
    loop — acceptable because decode cost is per-BLOB and the operator
    batches blobs through Arrow, same as every other multimodal op."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != _PNG_SIG:
        raise ValueError("payload is not a PNG (and no PIL codec installed)")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + payload + CRC
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IDAT":
            idat.extend(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR chunk")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    rp = 0
    for y in range(h):
        f = raw[rp]
        line = np.frombuffer(raw, np.uint8, stride, rp + 1).astype(np.int32)
        rp += stride + 1
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: serial in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + ((a + b) >> 1)
                else:  # Paeth predictor
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    v = line[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, channels)
    if ctype == 0:
        gray = px[:, :, 0]
    elif ctype == 4:  # gray+alpha: PIL's LA->L keeps the luminance plane
        gray = px[:, :, 0]
    elif ctype == 3:  # palette: expand indices, then luma
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        gray = _png_to_gray(pal[px[:, :, 0]])
    else:  # RGB / RGBA
        gray = _png_to_gray(px[:, :, :3])
    return w, h, gray.tobytes()


def decode_image(df: DataFrame) -> DataFrame:
    """REAL decode path: each payload blob decodes to a row-major
    grayscale uint8 raster via an Arrow-batched mapInPandas (per-blob
    work like every other multimodal op). Dispatches to PIL when
    importable (any format Pillow reads); otherwise the pure-stdlib PNG
    decoder above handles PNG payloads — so the operator is executable,
    and tested, with zero codec libraries installed. Both paths emit
    byte-identical rasters for PNG (the stdlib luma is PIL's exact
    fixed-point formula)."""
    use_pil = have_image_codec()

    def compute(batches):
        import io

        import pandas as pd

        if use_pil:
            from PIL import Image

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                if use_pil:
                    img = Image.open(io.BytesIO(payload)).convert("L")
                    w, h, raster = img.width, img.height, img.tobytes()
                else:
                    w, h, raster = _decode_png_stdlib(payload)
                out.append(
                    (
                        row["media_id"],
                        row["kind"],
                        w,
                        h,
                        1,
                        bytearray(raster),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "kind",
                    "width",
                    "height",
                    "channels",
                    "raster",
                ],
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        compute, _DECODED_SCHEMA
    )


_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, mean_intensity double, "
    "std_intensity double, min_intensity int, max_intensity int"
)


def image_features(df: DataFrame) -> DataFrame:
    """Per-image statistics over the decoded raster (fake decode: payload
    bytes ARE the row-major grayscale raster). Batches cross the JVM
    boundary as Arrow blocks; within a batch the loop is per-IMAGE (each
    iteration is one numpy pass over a whole payload blob — the per-row
    overhead is negligible against the per-blob work, unlike scalar
    row-at-a-time UDFs)."""

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                raster = np.frombuffer(row["payload"], dtype=np.uint8)
                feats.append(
                    (
                        row["media_id"],
                        row["kind"],
                        len(row["payload"]),
                        float(raster.mean()),
                        float(raster.std()),
                        int(raster.min()),
                        int(raster.max()),
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "mean_intensity",
                    "std_intensity",
                    "min_intensity",
                    "max_intensity",
                ],
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        compute, _FEATURE_SCHEMA
    )


def resize_image(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize of the fake raster; payload out is the
    resized raster, metadata updated — the exact shape a real resize UDF
    has (binary in, binary out, metadata rewrite)."""

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                w, h = row["meta"]["width"], row["meta"]["height"]
                raster = np.frombuffer(row["payload"], dtype=np.uint8)[: w * h]
                img = raster.reshape(h, w)
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = img[np.ix_(yi, xi)]
                out_rows.append(
                    (row["media_id"], bytearray(resized.tobytes()), out_w, out_h)
                )
            yield pd.DataFrame(
                out_rows, columns=["media_id", "payload", "width", "height"]
            )

    out = df.filter(F.col("kind") == "image").select("media_id", "payload", "meta")
    return out.mapInPandas(
        compute, "media_id long, payload binary, width int, height int"
    )


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video payloads: split the byte stream into
    n_frames equal chunks, keep every `every_n`-th — one output row per
    kept frame (posexplode shape)."""

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                n_frames = row["meta"]["n_frames"]
                frame_len = len(row["payload"]) // n_frames
                for f in range(0, n_frames, every_n):
                    rows.append(
                        (
                            row["media_id"],
                            f,
                            bytearray(
                                row["payload"][f * frame_len : (f + 1) * frame_len]
                            ),
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    vids = df.filter(F.col("kind") == "video").select("media_id", "payload", "meta")
    return vids.mapInPandas(compute, "media_id long, frame_idx int, frame binary")


def audio_window_energy(df: DataFrame, window_samples: int = 256) -> DataFrame:
    """Audio windowing for payloads of uint8 PCM-ish samples (fake decode:
    payload bytes ARE the samples): fixed-size sample windows, per window
    the RMS energy, peak amplitude, and midpoint-crossing count — the
    framing/VAD-feature shape every speech pipeline starts from. One
    output row per (media_id, window_idx); the tail window may be short.
    All window math is one vectorized numpy reshape pass per blob."""

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                samples = np.frombuffer(row["payload"], dtype=np.uint8)
                for w0 in range(0, len(samples), window_samples):
                    win = samples[w0 : w0 + window_samples].astype(np.float64)
                    centered = win - 128.0
                    crossings = int(
                        np.count_nonzero(np.diff(np.sign(centered)) != 0)
                    )
                    rows.append(
                        (
                            row["media_id"],
                            w0 // window_samples,
                            len(win),
                            float(np.sqrt(np.mean(centered**2))),
                            int(np.abs(centered).max()),
                            crossings,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "window_idx",
                    "n_samples",
                    "rms",
                    "peak",
                    "crossings",
                ],
            )

    aud = df.filter(F.col("kind") == "audio").select("media_id", "payload")
    return aud.mapInPandas(
        compute,
        "media_id long, window_idx int, n_samples int, rms double, "
        "peak int, crossings int",
    )


DHASH_BITS = 32


def content_dhash(df: DataFrame) -> DataFrame:
    """Perceptual-style difference hash (dHash) over the media payload:
    bit j of the 32-bit fingerprint is 1 iff byte j > byte j+1 of the
    first 33 payload bytes (shorter payloads pad with 0) — the
    adjacent-intensity gradient sign that makes dHash robust to uniform
    brightness shifts on real rasters. Pure byte arithmetic on the
    UNDECODED payload, so it needs no codec and is exactly reproducible
    in SQL (the workload oracle re-derives every byte from hex(payload)).
    One Arrow batch in, one numpy vectorized pass over the batch's
    padded byte matrix — no per-row Python work at all.
    Returns (media_id, dhash)."""

    def compute(batches):
        import numpy as np
        import pandas as pd

        n = DHASH_BITS + 1
        weights = (1 << np.arange(DHASH_BITS, dtype=np.int64))
        for pdf in batches:
            mat = np.zeros((len(pdf), n), dtype=np.int64)
            for i, payload in enumerate(pdf["payload"]):
                head = np.frombuffer(payload[:n], dtype=np.uint8)
                mat[i, : len(head)] = head
            bits = mat[:, :-1] > mat[:, 1:]
            fps = (bits * weights).sum(axis=1)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "dhash": fps}
            )

    return df.select("media_id", "payload").mapInPandas(
        compute, "media_id long, dhash long"
    )


def patch_token_stats(
    df: DataFrame, patch_w: int = 8, patch_h: int = 8
) -> DataFrame:
    """ViT-style PATCH TOKENIZATION plumbing: map each payload's byte
    raster (row-major, width from meta.width) onto a (patch_row,
    patch_col) grid and emit per-patch exact-integer statistics — byte
    count and byte sum, plus the mean as one final IEEE division. Byte
    index i (0-based) belongs to patch_row = i // (width*patch_h),
    patch_col = (i % width) // patch_w; trailing partial patches keep
    their true n_bytes, so the mapping is total (every byte lands in
    exactly one patch — the invariant tests pin). This is the schema /
    batch-shape / partitioning skeleton a real vision pipeline drops a
    decoded raster into; the arithmetic is codec-free byte math, so the
    workload over it carries a FULL value-hash oracle (the dHash
    precedent). One vectorized np.bincount pass per blob, Arrow-batched."""

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "patch_row": [],
                "patch_col": [],
                "n_bytes": [],
                "byte_sum": [],
            }
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["payload"], dtype=np.uint8)
                width = int(row["width"])
                if len(arr) == 0 or width <= 0:
                    continue
                idx = np.arange(len(arr))
                pr = idx // (width * patch_h)
                pc = (idx % width) // patch_w
                ncols = (width + patch_w - 1) // patch_w
                key = pr * ncols + pc
                sums = np.bincount(key, weights=arr.astype(np.int64))
                cnts = np.bincount(key)
                present = np.nonzero(cnts)[0]
                out["media_id"].extend(
                    [row["media_id"]] * len(present)
                )
                out["patch_row"].extend((present // ncols).tolist())
                out["patch_col"].extend((present % ncols).tolist())
                out["n_bytes"].extend(cnts[present].tolist())
                out["byte_sum"].extend(
                    sums[present].astype(np.int64).tolist()
                )
            yield pd.DataFrame(out)

    flat = df.select(
        "media_id", "payload", F.col("meta.width").alias("width")
    )
    stats = flat.mapInPandas(
        compute,
        "media_id long, patch_row long, patch_col long, n_bytes long, "
        "byte_sum long",
    )
    return stats.withColumn(
        "byte_mean",
        F.col("byte_sum").cast("double") / F.col("n_bytes").cast("double"),
    )


def audio_waveform_stats(df: DataFrame) -> DataFrame:
    """Exact-integer waveform statistics over an undecoded PCM16 payload:
    the payload's bytes are parsed as little-endian int16 samples (the
    WAV/PCM wire format — byte 2i is the low byte, 2i+1 the high byte; a
    trailing odd byte is ignored), and per blob we emit n_samples,
    peak_abs = max |s|, sum_sq = sum s^2 (int64-exact: <= n * 2^30), and
    zero_crossings = #{i : sign(s_i) != sign(s_{i-1})} with
    sign(s) := (s >= 0). All-integer outputs, so a SQL oracle can
    re-derive every sample from hex(payload) and value-hash the full row
    — the audio twin of content_dhash/patch_token_stats' byte-exact
    certification (audio_window_energy covers the windowed-energy shape
    with an invariant oracle). One vectorized numpy pass per blob inside
    an Arrow-batched mapInPandas; per-blob work, media_id-partitionable
    at any scale."""

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, ns, peaks, sumsqs, zcs = [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                usable = len(payload) - (len(payload) % 2)
                s = np.frombuffer(payload[:usable], dtype="<i2").astype(np.int64)
                ids.append(media_id)
                ns.append(s.size)
                peaks.append(int(np.abs(s).max()) if s.size else 0)
                sumsqs.append(int((s * s).sum()) if s.size else 0)
                if s.size >= 2:
                    nonneg = s >= 0
                    zcs.append(int((nonneg[1:] != nonneg[:-1]).sum()))
                else:
                    zcs.append(0)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": ns,
                    "peak_abs": peaks,
                    "sum_sq": sumsqs,
                    "zero_crossings": zcs,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        compute,
        "media_id long, n_samples long, peak_abs long, sum_sq long,"
        " zero_crossings long",
    )
