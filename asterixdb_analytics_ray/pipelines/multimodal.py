"""Multimodal columns — binary media payloads through actor-pool stages.

Images/audio/video are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as stateful ``map_batches``
stages (codec/model loaded once per actor in ``__init__``). The decode
libraries (PIL / cv2 / torchaudio) are NOT in this container, so the codec
itself is STUBBED behind an import-try with a deterministic fake — the
Ray-side plumbing (schema, batch sizing, actor signature, output layout) is
real and tested, and swapping the stub for a real codec touches only
``_decode_payload``.

Schema:
    media(item_id: int64, media_type: string, payload: binary, meta: string)
Feature output:
    (item_id: int64, width: int32, height: int32,
     features: fixed_size_list<float>[FEATURE_DIM])
Frame-sample output (video): one row per sampled frame
    (item_id, frame_idx: int32, payload: binary)

Binary columns must stay in ``batch_format="pyarrow"`` end to end (pandas
would object-box them); large payloads want a SMALL ``batch_size`` so
batch × concurrency fits worker heaps.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 32

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
        ("meta", pa.string()),
    ]
)


def synthetic_media(n_items: int, seed: int = 9) -> pa.Table:
    """Deterministic fake media blobs (seeded pseudo-random bytes + metadata)."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n_items, dtype=np.int64)
    types = np.where(ids % 3 == 0, "video", np.where(ids % 3 == 1, "image", "audio"))
    payloads = [rng.integers(0, 256, size=256 + 16 * int(i), dtype=np.uint8).tobytes() for i in ids]
    metas = [
        json.dumps({"width": 64 + int(i) % 64, "height": 48 + int(i) % 48, "frames": 8})
        for i in ids
    ]
    return pa.table(
        {
            "item_id": pa.array(ids),
            "media_type": pa.array(types.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_decode_gray(payload: bytes) -> np.ndarray:
    """Minimal stdlib PNG decoder → grayscale uint8 (H, W).

    zlib inflate + per-row unfilter (all five PNG filter types), 8-bit
    depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no
    interlace. Color is collapsed with PIL's exact ITU-R 601-2 integer
    transform ((19595·R + 38470·G + 7471·B + 0x8000) >> 16) so features
    are bit-identical whether this or ``PIL.Image.convert("L")`` decoded
    the payload. Exists so the REAL-codec path of ``_decode_payload`` runs
    in codec-less containers (this one) — PIL, when present, still handles
    every other format."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = bd = ct = interlace = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, bd, ct, _, _, interlace = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or bd != 8 or interlace:
        raise NotImplementedError(
            f"png_decode_gray handles 8-bit non-interlaced PNGs only "
            f"(bit_depth={bd}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            rec = row
        elif f == 2:  # Up — fully vectorized
            rec = (row + prev) & 0xFF
        elif f == 1:
            # Sub: rec[x] = (row[x] + rec[x-ch]) mod 256, a per-lane prefix
            # sum — mod distributes over +, so one cumsum per lane then mask
            # (17-29× the per-byte loop; timing note in BASELINE.md)
            rec = (np.cumsum(row.reshape(w, ch), axis=0) & 0xFF).reshape(-1)
        else:
            # Average/Paeth carry a true byte-serial left recurrence (the
            # //2 and the predictor select are non-linear, so no prefix-sum
            # closed form, and numpy per-element indexing costs more than
            # plain ints) — run the scan over PYTHON ints in lists with
            # branch-free-ish locals: measured ~3× the numpy-scalar loop on
            # Paeth-heavy rows. Per-image parallelism comes from the actor
            # pool, not from within the scan.
            pl = prev.tolist()
            rl = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
            rc = list(rl)
            if f == 3:  # Average; x < ch has a=0 → pred = b>>1
                for x in range(ch):
                    rc[x] = (rc[x] + (pl[x] >> 1)) & 0xFF
                for x in range(ch, stride):
                    rc[x] = (rc[x] + ((rc[x - ch] + pl[x]) >> 1)) & 0xFF
            else:  # 4 = Paeth; x < ch (a=c=0) always selects b (Up)
                for x in range(ch):
                    rc[x] = (rc[x] + pl[x]) & 0xFF
                for x in range(ch, stride):
                    a = rc[x - ch]
                    b = pl[x]
                    c = pl[x - ch]
                    p = a + b - c
                    pa_ = p - a if p >= a else a - p
                    pb_ = p - b if p >= b else b - p
                    pc_ = p - c if p >= c else c - p
                    if pa_ <= pb_ and pa_ <= pc_:
                        pred = a
                    elif pb_ <= pc_:
                        pred = b
                    else:
                        pred = c
                    rc[x] = (rc[x] + pred) & 0xFF
            rec = np.array(rc, dtype=np.int64)
        img[y] = rec.astype(np.uint8)
        prev = rec
    px = img.reshape(h, w, ch).astype(np.int64)
    if ct == 0:
        gray = px[:, :, 0]
    elif ct == 4:
        gray = px[:, :, 0]  # PIL LA→L keeps the luma channel
    else:  # RGB / RGBA → PIL's exact L transform
        gray = (
            19595 * px[:, :, 0] + 38470 * px[:, :, 1] + 7471 * px[:, :, 2] + 0x8000
        ) >> 16
    return gray.astype(np.uint8)


def png_encode_gray(img: np.ndarray) -> bytes:
    """Minimal stdlib grayscale PNG encoder (filter 0 rows) — the test/
    generator counterpart of ``png_decode_gray``; round-trips through PIL."""
    import struct
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_payload(payload: bytes, meta: dict) -> np.ndarray:
    """Decode one payload → FEATURE_DIM feature vector.

    REAL-codec path: rows whose ``meta.codec`` names an encoded image
    format are decoded — PNG with the stdlib decoder above (runs HERE, in
    this codec-less container), everything else with PIL (imported lazily;
    absent in this container, so those formats raise NotImplementedError
    but activate unchanged wherever PIL exists). Pixels are
    grayscale-normalized and mean-pooled into FEATURE_DIM buckets.

    FAKE path (synthetic media, no ``codec`` key): a deterministic md5
    chain over the payload's lowercase hex — chosen (over shake_256) so an
    independent SQL oracle can recompute the exact same features with
    DuckDB's VARCHAR-only ``md5`` (``sql_oracle.media_features_sql``):
    block j = md5(hex(payload) + chr(49+j)), each block → 4 little-endian
    uint32s scaled to [0, 1).
    """
    codec = (meta or {}).get("codec")
    if codec in ("png", "jpeg", "bmp", "gif"):
        if codec == "png":
            gray = png_decode_gray(payload)
        else:
            try:
                import io

                from PIL import Image
            except ImportError as e:  # pragma: no cover - PIL absent here
                raise NotImplementedError(
                    f"payload codec {codec!r} needs PIL, not present in this "
                    "container; png decodes via the stdlib path"
                ) from e
            gray = np.asarray(
                Image.open(io.BytesIO(payload)).convert("L"), dtype=np.uint8
            )
        px = gray.astype(np.float64).ravel() / 255.0
        pad = (-len(px)) % FEATURE_DIM
        if pad:
            px = np.concatenate([px, np.zeros(pad)])
        return px.reshape(FEATURE_DIM, -1).mean(axis=1)
    hexs = payload.hex().encode()
    out = np.empty(FEATURE_DIM, dtype=np.float64)
    for j in range(FEATURE_DIM * 4 // 16):  # md5 = 16 bytes = 4 floats
        d = hashlib.md5(hexs + bytes([49 + j])).digest()
        out[j * 4 : (j + 1) * 4] = np.frombuffer(d, dtype="<u4")
    return out / float(2**32)


class FeatureExtract:
    """Actor-pool stage: decode → fixed-size feature vector per item.

    ``__init__`` is the once-per-actor model/codec load point (here it only
    precomputes the stub's normalization constants).
    """

    def __init__(self):
        self.dim = FEATURE_DIM

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = np.empty((t.num_rows, self.dim), dtype=np.float64)
        widths = np.empty(t.num_rows, dtype=np.int32)
        heights = np.empty(t.num_rows, dtype=np.int32)
        payloads = t["payload"].to_pylist()
        metas = t["meta"].to_pylist()
        for i, (p, m) in enumerate(zip(payloads, metas)):
            meta = json.loads(m) if m else {}
            feats[i] = _decode_payload(p, meta)
            widths[i] = meta.get("width", 0)
            heights[i] = meta.get("height", 0)
        return pa.table(
            {
                "item_id": t["item_id"],
                "width": pa.array(widths),
                "height": pa.array(heights),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.dim
                ),
            }
        )


def extract_features(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 64
) -> ray.data.Dataset:
    """media table → feature table via the actor pool (small batches: binary
    payloads are large; batch × concurrency must fit worker heaps)."""
    return media.map_batches(
        FeatureExtract,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeImages:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode PNG.

    A REAL pixel transform that runs in this codec-less container: PNG rows
    decode through the stdlib codec (``png_decode_gray``), resize with exact
    integer nearest-neighbor index math (``(i·in_dim)//out_dim`` — fully
    deterministic, no float rounding), and re-encode with
    ``png_encode_gray``. Non-PNG image codecs decode via PIL where present
    and raise ``NotImplementedError`` loudly where not (the same codec seam
    as ``_decode_payload`` — never a silent fake). ``__init__`` precomputes
    nothing heavy here, but is the once-per-actor codec/model load point.

    The output is a valid MEDIA_SCHEMA table (item_id, media_type, payload,
    meta): resized rows get ``meta`` rewritten with the new width/height and
    ``codec='png'``, so the stage chains into ``extract_features`` /
    ``sample_frames``. Rows whose ``media_type != 'image'`` (audio/video)
    pass through UNCHANGED instead of hitting the codec seam.
    """

    def __init__(self, width: int, height: int):
        self.w, self.h = int(width), int(height)

    def _resize(self, gray: np.ndarray) -> np.ndarray:
        ih, iw = gray.shape
        ys = (np.arange(self.h, dtype=np.int64) * ih) // self.h
        xs = (np.arange(self.w, dtype=np.int64) * iw) // self.w
        return gray[np.ix_(ys, xs)]

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        metas = t["meta"].to_pylist()
        mtypes = t["media_type"].to_pylist()
        out_payload, out_meta = [], []
        for p, m, mt in zip(payloads, metas, mtypes):
            if mt != "image":
                out_payload.append(p)
                out_meta.append(m)
                continue
            meta = json.loads(m) if m else {}
            codec = meta.get("codec")
            if codec == "png":
                gray = png_decode_gray(p)
            else:
                try:
                    import io

                    from PIL import Image
                except ImportError as e:
                    raise NotImplementedError(
                        f"resize for codec {codec!r} needs PIL, not present "
                        "in this container; png resizes via the stdlib path"
                    ) from e
                gray = np.asarray(
                    Image.open(io.BytesIO(p)).convert("L"), dtype=np.uint8
                )
            out_payload.append(png_encode_gray(self._resize(gray)))
            meta.update(width=self.w, height=self.h, codec="png")
            out_meta.append(json.dumps(meta))
        return pa.table(
            {
                "item_id": t["item_id"],
                "media_type": t["media_type"],
                "payload": pa.array(out_payload, pa.binary()),
                "meta": pa.array(out_meta, pa.string()),
            }
        )


def resize_images(
    media: ray.data.Dataset,
    width: int,
    height: int,
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """media table → resized-PNG table via the actor pool (small batches:
    decoded pixel buffers are w·h bytes per row; batch × concurrency must
    fit worker heaps)."""
    return media.map_batches(
        ResizeImages,
        fn_constructor_args=(width, height),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    media: ray.data.Dataset, every: int = 4, batch_size: int = 64
) -> ray.data.Dataset:
    """Video rows → one row per sampled frame (stub slices the payload; a real
    codec would seek keyframes). Non-video rows are dropped."""
    import pyarrow.compute as pc

    def frames(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["media_type"], "video"))
        ids, idxs, chunks = [], [], []
        for i in range(t.num_rows):
            meta = json.loads(t["meta"][i].as_py() or "{}")
            payload = t["payload"][i].as_py()
            n_frames = int(meta.get("frames", 1))
            size = max(1, len(payload) // max(1, n_frames))
            for f in range(0, n_frames, every):
                ids.append(t["item_id"][i].as_py())
                idxs.append(f)
                chunks.append(payload[f * size : (f + 1) * size])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "payload": pa.array(chunks, pa.binary()),
            }
        )

    return media.map_batches(frames, batch_format="pyarrow", batch_size=batch_size)
