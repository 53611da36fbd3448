"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension scope (BASELINE.json): image/audio/video handled as ``binary``
columns with a typed metadata struct, processed by Arrow-batched pandas
functions via ``mapInPandas``.  The actual codec work (JPEG decode, resample,
frame extraction) needs libraries this container doesn't ship, so the codec
boundary is STUBBED — but everything Spark-side is real and tested: the
schema contract, the mapInPandas batch iteration, the output schema, and the
deterministic fallback "decoder" (byte-level features) that stands in for
pixels.

Design for 100 TB of media:
- payloads stay opaque bytes end-to-end (no JVM<->Python per-row chatter;
  Arrow moves whole batches);
- decode parallelism is row-group parallelism: media tables are written with
  small ``parquet.block.size`` so a 256 MB task holds a handful of videos;
- feature extraction emits SMALL typed rows (drop the payload as early as
  possible — the classic projection-pushdown argument applied to bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-table schema: payload + typed metadata columns
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha1_prefix", StringType(), False),
        StructField("byte_entropy_q", LongType(), False),
    ]
)


def _byte_features(data: bytes, n_bytes: int) -> dict:
    """Deterministic features over a byte string: sha1 prefix + a quantized
    collision-mass entropy proxy (integer arithmetic only, reproducible on
    any platform).  ``n_bytes`` is reported separately so decoders can
    report the PAYLOAD size while featurizing decoded content."""
    from collections import Counter

    n = len(data)
    # Counter's C fast path over the bytes object — a pure-Python per-byte
    # loop costs ~100ns/byte, which dominates on the multi-MB payloads this
    # module is sized around (same counts, 10-50x faster)
    counts = Counter(data)
    coll = sum(c * c for c in counts.values())
    return {
        "n_bytes": n_bytes,
        "sha1_prefix": hashlib.sha1(data).hexdigest()[:12],
        "byte_entropy_q": (coll * 1000) // (n * n) if n else -1,
    }


def fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a decoder: features over the RAW payload
    bytes — reproducible everywhere, no codec libraries."""
    return _byte_features(payload, len(payload))


def pillow_decode(payload: bytes, kind: str) -> dict:
    """Real image decode via Pillow (when installed): features over the
    DECODED grayscale pixels rather than the compressed payload.  Same
    output contract as fake_decode, so the two are drop-in swappable at the
    decode_media call site."""
    import io

    from PIL import Image  # gated import: raises where Pillow is absent

    if kind != "image":
        raise NotImplementedError(f"pillow_decode handles images, not {kind}")
    img = Image.open(io.BytesIO(payload))
    pixels = img.convert("L").tobytes()
    return _byte_features(pixels, len(payload))


def real_decode(payload: bytes, kind: str) -> dict:
    """The LOUD codec boundary: Pillow for images when importable;
    audio/video codecs (torchaudio/pyav) are not shipped in this container
    and stay stubbed — asking for a real decode of those kinds raises
    rather than silently featurizing compressed bytes.  For mixed-kind
    media tables use ``best_decoder()``, whose per-row dispatcher falls
    back deterministically instead of killing the task."""
    if kind == "image":
        return pillow_decode(payload, kind)
    raise NotImplementedError(
        f"no codec for kind={kind!r} in this environment; "
        "use fake_decode (deterministic byte-level features) instead"
    )


def dispatch_decode(payload: bytes, kind: str) -> dict:
    """Per-row codec selection for mixed-kind tables: the real codec for
    kinds this environment supports, the deterministic fallback for the
    rest — one audio/video row (or one CORRUPT image payload) in a batch
    must not kill the task.  The loud variant is real_decode."""
    if kind == "image":
        try:
            return pillow_decode(payload, kind)
        except ImportError:  # missing codec library stays LOUD —
            raise  # best_decoder gates availability; don't mask it here
        except Exception:  # corrupt/undecodable payload -> byte features
            return fake_decode(payload, kind)
    return fake_decode(payload, kind)


def best_decoder(kind: str = "image"):
    """Runtime codec selection: the per-row dispatcher (real codec where
    supported, deterministic fallback elsewhere) when the real library
    imports, else the deterministic byte-feature fallback for everything.
    Safe on mixed-kind tables either way.  Tests pin fake_decode
    explicitly so results stay environment-independent."""
    if kind == "image":
        try:
            import PIL  # noqa: F401

            return dispatch_decode
        except ImportError:
            return fake_decode
    return fake_decode


def fake_resize(payload: bytes, kind: str, width: int, height: int) -> bytes:
    """Deterministic library-free 'resize': tile or truncate the payload to
    exactly ``width * height`` bytes (zero-fill when empty)."""
    target = width * height
    b = payload or b""
    if not b:
        return b"\x00" * target
    reps = -(-target // len(b))  # ceil division
    return (b * reps)[:target]


def pillow_resize(payload: bytes, kind: str, width: int, height: int) -> bytes:
    """Real image resize via Pillow (when installed): decode, bilinear
    resize to (width, height), re-encode as PNG (deterministic encoder
    settings).  Same bytes-in/bytes-out contract as fake_resize, so the
    two are drop-in swappable at the resize_media call site."""
    import io

    from PIL import Image  # gated import: raises where Pillow is absent

    if kind != "image":
        raise NotImplementedError(f"pillow_resize handles images, not {kind}")
    img = Image.open(io.BytesIO(payload))
    out = io.BytesIO()
    img.resize((width, height), Image.BILINEAR).save(out, format="PNG")
    return out.getvalue()


def best_resizer(kind: str = "image"):
    """Runtime codec selection for the resize path, mirroring
    best_decoder: Pillow-backed real resize when the library imports, the
    deterministic tiling fallback otherwise.  Tests pin fake_resize
    explicitly so results stay environment-independent."""
    if kind == "image":
        try:
            import PIL  # noqa: F401

            return dispatch_resize
        except ImportError:
            return fake_resize
    return fake_resize


def dispatch_resize(payload: bytes, kind: str, width: int, height: int) -> bytes:
    """Per-row resize dispatcher, mirroring dispatch_decode: Pillow for
    image rows, the deterministic tiling fallback for kinds this
    environment has no codec for — one non-image row (or one corrupt
    image payload) in a batch must not kill the task."""
    if kind == "image":
        try:
            return pillow_resize(payload, kind, width, height)
        except ImportError:  # missing codec library stays LOUD
            raise
        except Exception:  # corrupt/undecodable payload -> tiling fallback
            return fake_resize(payload, kind, width, height)
    return fake_resize(payload, kind, width, height)


def decode_media(df: DataFrame, decoder=fake_decode) -> DataFrame:
    """mapInPandas decode: Arrow batches in, small typed feature rows out.

    The payload column dies here — downstream stages shuffle features,
    never bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decoder(bytes(p) if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a real binary media table from the documents fixture (payload =
    utf-8 bytes of the text) so the plumbing runs on actual data: binary
    column, metadata struct columns, realistic sizes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        # octet_length = the payload's BYTE count (text length would be the
        # CHARACTER count, which undercounts multibyte UTF-8 and breaks the
        # stub's width-equals-payload-extent convention resize_media keeps)
        F.octet_length("text").cast("int").alias("width"),
        F.lit(1).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the opaque payload: emit one row per sampled
    offset (for video this is 1-per-N-frames; here 1-per-N-bytes on the
    stub).  Pure Spark: posexplode over a computed offset sequence — shows
    the explode-and-carry-metadata shape a real frame sampler uses."""
    # F.length on a BINARY column is the byte count (casting to string
    # would count UTF-8 CHARACTERS of an arbitrary-bytes reinterpretation —
    # wrong for any real media payload); empty/NULL payloads sample zero
    # frames rather than a phantom offset-0 row
    n_bytes = F.length("payload")
    offsets = F.when(
        n_bytes > 0,
        F.sequence(F.lit(0), n_bytes - 1, F.lit(every_n_bytes)),
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        "media_id",
        "kind",
        F.posexplode(offsets).alias("frame_no", "byte_offset"),
    )


def resize_media(
    df: DataFrame,
    target_width: int,
    target_height: int = 1,
    resizer=fake_resize,
) -> DataFrame:
    """'Resize' on the opaque payload — the bytes-in/bytes-out mapInPandas
    shape (decode_media is bytes-in/features-out; this one must RETURN a
    payload, which is the expensive half of a real thumbnailing pipeline).

    ``resizer`` is the codec boundary, same shape as decode_media's
    ``decoder``: the default fake_resize tiles or truncates the payload to
    exactly ``target_width * target_height`` bytes (deterministic,
    library-free); pass ``best_resizer()`` to use Pillow's real
    decode-resize-encode where the library is installed.  Either way the
    Spark contract — Arrow batching, schema preservation, metadata
    consistency — is identical.

    Input must carry the full media schema (the output IS MEDIA_SCHEMA and
    rows are built by batch copy, and the resizer dispatches on ``kind``);
    checked here at construction so a missing column is an immediate
    ValueError, not a KeyError inside a Python worker at execution time.
    """
    missing = [f.name for f in MEDIA_SCHEMA.fields if f.name not in df.columns]
    if missing:
        raise ValueError(
            f"resize_media input is missing media columns {missing}; "
            "build the frame with media_from_documents (or match "
            "MEDIA_SCHEMA)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [
                resizer(
                    bytes(p) if p is not None else b"",
                    k,
                    target_width,
                    target_height,
                )
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out["width"] = target_width
            out["height"] = target_height
            yield out

    return df.mapInPandas(batches, schema=MEDIA_SCHEMA)
