"""Multimodal column support (SURVEY.md §2.I, prompt requirement).

Design: media travel as opaque `binary` columns with a typed metadata
struct beside them — the 100 TB layout is (metadata columns + binary
payload) in the same parquet row-group so predicate pushdown on
metadata prunes payload IO. Decode / feature-extraction runs as
Arrow-batched `mapInPandas` (the only sane place for codec libraries).

The container has no image/audio codecs, so the decode step runs a
deterministic fake header parse by default — but `_decode_image` now
auto-detects PIL at import time and uses it when present (round-2
seam, VERDICT r01 item 6): drop Pillow into the environment and the
operator upgrades itself, no code change. Forcing the real path
without a codec (`fake=False`) still raises NotImplementedError so the
stub stays honest. The Spark-side plumbing — schema, batching,
partitioning, UDF signatures — is real and tested either way.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkml_spark.registry import query
from sparkml_spark.sources.loader import load_table


@query(
    "multimodal_binary_meta",
    section="2.I",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       CASE WHEN octet_length(encode(text)) > 300 THEN 'blob/large' ELSE 'blob/small' END AS mime_class
FROM documents
""",
)
def multimodal_binary_meta(spark, sf_dir):
    """Binary payload + typed metadata: text bytes stand in for media
    payloads (same plumbing). Metadata (size, digest, mime class) is
    computed JVM-side so filters on it push down without touching
    payload bytes."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
        F.when(F.octet_length(payload) > 300, "blob/large")
        .otherwise("blob/small")
        .alias("mime_class"),
    )


try:  # real-codec seam: self-upgrades the moment the env has PIL
    from PIL import Image as _PILImage  # noqa: N814
except ImportError:  # container has no codecs — deterministic fake below
    _PILImage = None


def _decode_image(payload: bytes, fake: bool | None = None):
    """Decoder seam. If PIL is importable (checked once at module
    load), real payloads are decoded with it — executors hit the same
    import, so the upgrade is cluster-wide and automatic. Otherwise a
    deterministic pseudo-decode derives (width, height, channels) from
    the payload header bytes so downstream plumbing stays testable.
    `fake=True/False` forces a path (False without PIL raises, keeping
    the stub honest); default auto-detects."""
    use_real = (_PILImage is not None) if fake is None else not fake
    if use_real:
        if _PILImage is None:
            raise NotImplementedError(
                "image codec not available in this environment — install "
                "PIL/turbojpeg; the mapInPandas plumbing is codec-agnostic"
            )
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return im.width, im.height, len(im.getbands())
        except Exception:
            pass  # not a decodable image — fall through to the fake parse
    h = payload[:8].ljust(8, b"\0")
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 3
    return width, height, channels


@query(
    "multimodal_decode_stub",
    section="2.I",
    oracle="""
WITH h AS (
  SELECT doc_id,
         64 + ascii(substr(text, 1, 1)) % 192 AS width,
         64 + (CASE WHEN len(text) >= 2 THEN ascii(substr(text, 2, 1)) ELSE 0 END) % 192 AS height,
         1 + (CASE WHEN len(text) >= 3 THEN ascii(substr(text, 3, 1)) ELSE 0 END) % 3 AS channels
  FROM documents
)
SELECT doc_id, CAST(width AS INTEGER) AS width,
       CAST(height AS INTEGER) AS height,
       CAST(channels AS INTEGER) AS channels,
       CAST(floor(CAST(width AS DOUBLE) / height * 10000 + 0.5) AS BIGINT) AS aspect_e4
FROM h
""",
)
def multimodal_decode_stub(spark, sf_dir):
    """Decode + feature-extract over binary payloads via mapInPandas:
    Arrow batches of (id, payload) → (id, width, height, channels,
    aspect). Decode itself is the stub above; everything around it
    (schema, batch shape, vectorized loop) is the production path.

    ORACLE-tier (r6): the pseudo-decode derives dimensions from the
    payload header BYTES, and fixture text is pure ASCII (canary-
    pinned) so byte k == ascii(char k) — the header math is
    SQL-expressible. Aspect is fixed-point 1e-4 units
    (floor(w/h*1e4+0.5)): w/h with small integer denominators lands
    exactly on 4-dp rounding ties (e.g. w ≡ 4 mod 8 over h=128 gives
    w*78.125 = k+0.5 exactly), where numpy half-even and DuckDB
    half-away would diverge. The REGISTERED query forces the fake
    path (`fake=True`): the oracle pins the byte-math contract, and a
    PIL auto-upgrade must not silently flip results for payloads PIL
    happens to header-parse (ASCII starting with a PNM magic like
    'P6 2 2 255' IS lazily decodable — code-review r6). Production
    callers use `_decode_image`'s auto-detect default and get real
    decoding the moment a codec is installed."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def decode(batches):
        import numpy as np

        for pdf in batches:
            dims = [_decode_image(p, fake=True) for p in pdf["payload"]]
            out = pd.DataFrame(dims, columns=["width", "height", "channels"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["aspect_e4"] = np.floor(
                out.width / out.height * 10000 + 0.5
            ).astype("int64")
            yield out

    return blobs.mapInPandas(
        decode,
        "doc_id BIGINT, width INT, height INT, channels INT, aspect_e4 BIGINT",
    )


@query(
    "multimodal_frame_sample",
    section="2.I",
    oracle="""
SELECT doc_id,
       CAST(idx AS INT) AS frame_idx,
       md5(substring(text, idx * 32 + 1, 32)) AS frame_md5
FROM documents,
     LATERAL unnest(range(0, greatest(len(text) // 32, 1), 4)) AS t(idx)
""",
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling for video-like payloads: payload → every-k-th
    frame index + per-frame byte slice digest, exploded to one row per
    sampled frame (mapInPandas; frame decode is the same stub seam).

    Oracle-able because the fixture text is ASCII (byte slice == char
    substring) and md5 is engine-identical — the twin proves the
    Arrow-batched mapInPandas plumbing by VALUE, not just row count."""
    import hashlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    frame_bytes, stride = 32, 4  # fake fixed-size frames, sample every 4th

    def sample(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(payload) // frame_bytes, 1)
                for idx in range(0, n_frames, stride):
                    chunk = bytes(payload[idx * frame_bytes : (idx + 1) * frame_bytes])
                    rows.append(
                        (int(doc_id), idx, hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return blobs.mapInPandas(sample, "doc_id BIGINT, frame_idx INT, frame_md5 STRING")


@query(
    "multimodal_audio_features_stub",
    section="2.I",
    oracle="""
WITH b AS (
  SELECT doc_id, len(text) AS n,
         CAST(list_sum(list_transform(range(1, len(text) + 1),
             i -> CAST((ascii(substr(text, i, 1)) - 128)
                       * (ascii(substr(text, i, 1)) - 128) AS BIGINT)))
              AS BIGINT) AS ss
  FROM documents
)
SELECT doc_id,
       CAST(floor(n / 16000.0 * 1000000 + 0.5) AS BIGINT) AS duration_us,
       CASE WHEN n = 0 THEN 0
            ELSE CAST(floor(sqrt(ss / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
       END AS rms_e6
FROM b
""",
)
def multimodal_audio_features_stub(spark, sf_dir):
    """Audio feature extraction seam: payload → (duration, rms)
    pseudo-features from byte stats (deterministic stand-ins for a
    real DSP lib), Arrow-batched.

    ORACLE-tier (r6): outputs are fixed-point (microseconds; rms in
    1e-6 units) because the old `round(len/16000, 6)` hit an EXACT
    decimal tie on every odd byte length (len*62.5 = k+0.5), where
    numpy's half-even and DuckDB's half-away rounding disagree on
    ~half the corpus. The sum of squared byte deviations is exact
    int64 on both engines (ASCII text ⇒ byte == ascii(char),
    canary-pinned), so sqrt/divide see identical doubles."""
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    blobs = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def feats(batches):
        import math

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype("int64")
                n = len(arr)
                ss = int(((arr - 128) ** 2).sum())
                # empty payload -> rms 0 (mirrors the oracle's CASE;
                # a bare division would abort the whole task)
                rms = (
                    0
                    if n == 0
                    else math.floor(math.sqrt(ss / float(n)) * 1000000 + 0.5)
                )
                rows.append(
                    (
                        int(doc_id),
                        math.floor(n / 16000.0 * 1000000 + 0.5),
                        rms,
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "duration_us", "rms_e6"])

    return blobs.mapInPandas(
        feats, "doc_id BIGINT, duration_us BIGINT, rms_e6 BIGINT"
    )


@query(
    "multimodal_shard_manifest",
    section="2.I",
    oracle="""
WITH ordered AS (
  SELECT doc_id, n_chars,
         SUM(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_bytes
  FROM documents
), assigned AS (
  SELECT doc_id, n_chars, CAST((cum_bytes - 1) // 20000 AS BIGINT) AS shard_id
  FROM ordered
)
SELECT shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM assigned GROUP BY shard_id
""",
)
def multimodal_shard_manifest(spark, sf_dir):
    """WebDataset-style shard packing manifest: documents packed in
    doc_id order into ~20 KB shards by cumulative payload size
    (`(cum_bytes-1) DIV shard_size`), manifest = one row per shard
    with doc span and byte count — what a training-data loader needs
    to address tar shards.

    The global prefix sum is TWO-PHASE (the scalable form): coarse
    doc_id buckets get per-bucket byte totals (one small aggregate),
    bucket offsets come from a window over the BUCKET table (1000x
    smaller — the only single-partition step), and the within-bucket
    running sum is a window PARTITIONED by bucket. A naive
    Window.orderBy with no partition key funnels the whole table
    through Exchange SinglePartition (verified in the plan) — that
    form is the anti-pattern this op replaces. Exact integer
    arithmetic throughout, so the two-phase result is bit-identical
    to the oracle's one-shot cumsum."""
    d = load_table(spark, sf_dir, "documents")
    bucketed = d.select(
        "doc_id", "n_chars", F.expr("doc_id DIV 1000").alias("bucket")
    )
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("n_chars").alias("b_bytes"))
        .select(
            "bucket",
            (F.sum("b_bytes").over(w_off) - F.col("b_bytes")).alias("offset"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    assigned = (
        bucketed.withColumn("run_in", F.sum("n_chars").over(w_in))
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_chars",
            F.expr("(offset + run_in - 1) DIV 20000").alias("shard_id"),
        )
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
