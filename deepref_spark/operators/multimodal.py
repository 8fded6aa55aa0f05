"""Multimodal span handling: media spans as opaque binary/ref columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked stub (NotImplementedError) with a deterministic fake
behind a flag — but the Spark-side plumbing is real and tested: schema,
partition-preserving batch iteration, UDF signature, fixed-width
feature output, and the invariant that media spans re-enter the doc
span sequence untouched.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_DIM = 16
MEDIA_FEATURES_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, media_kind string, "
    "n_bytes long, features array<float>"
)


def decode_media(payload: bytes) -> np.ndarray:
    """Real decode hook (image/audio/video -> feature vector). Not
    implementable in this container — swap in PIL/torchaudio/decord
    here; the pipeline around it is production-shaped."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use fake_decode "
        "or plug a real decoder into extract_media_features(decoder=...)"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: FEATURE_DIM floats in [0,1), feature i =
    portable md5_mod(payload || ':' || i, 2^20) / 2^20 — the exact
    formula a DuckDB oracle evaluates (kg_media_features), so the fake
    keeps batch shapes/dtypes real AND the lane oracle-checkable."""
    return _fake_decode_batch([payload])[0]


def _fake_decode_batch(payloads: list[bytes]) -> np.ndarray:
    """[B, FEATURE_DIM] float32 for a whole batch: one flat comprehension
    over the (payload, i) grid — the per-element md5 is the stand-in for
    a codec's C decode call; everything around it is numpy. Batch
    decoders with this signature slot into the ``decoder_batch`` hooks."""
    from deepref_spark.refsem import md5_mod_py

    scale = 1.0 / float(1 << 20)
    strs = [p.decode("utf-8", errors="replace") for p in payloads]
    flat = np.fromiter(
        (md5_mod_py(f"{s}:{i}", 1 << 20) for s in strs for i in range(FEATURE_DIM)),
        dtype=np.float64, count=len(strs) * FEATURE_DIM,
    )
    return (flat * scale).astype(np.float32).reshape(len(strs), FEATURE_DIM)


def _batch_of(decoder):
    """Adapt a per-payload decoder to the batch signature (identity for
    the default fake: it already has a vectorized twin)."""
    if decoder is fake_decode:
        return _fake_decode_batch
    return lambda payloads: np.stack([np.asarray(decoder(p)) for p in payloads])


def _kinds_of(refs: pd.Series) -> np.ndarray:
    """Vectorized media_kind_of over a ref column (same rules)."""
    r = refs.astype(str)
    return np.select(
        [
            r.str.contains("/img/", regex=False) | r.str.endswith((".png", ".jpg")),
            r.str.contains("/aud/", regex=False) | r.str.endswith((".wav", ".mp3")),
            r.str.contains("/vid/", regex=False) | r.str.endswith(".mp4"),
        ],
        ["image", "audio", "video"],
        default="blob",
    )


def media_kind_of(ref: str) -> str:
    if "/img/" in ref or ref.endswith((".png", ".jpg")):
        return "image"
    if "/aud/" in ref or ref.endswith((".wav", ".mp3")):
        return "audio"
    if "/vid/" in ref or ref.endswith((".mp4",)):
        return "video"
    return "blob"


def extract_media_features(media: DataFrame, decoder=fake_decode) -> DataFrame:
    """media spans (doc_id, span_idx, media_ref) -> per-span feature
    rows. The payload fetch is modeled as ref->bytes (here the ref
    string itself stands in for the blob; production: a ranged object
    read per batch). One Arrow batch per crossing, numpy stacking
    inside."""

    decode_batch = _batch_of(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [r.encode("utf-8") for r in pdf["media_ref"]]
            feats = decode_batch(payloads)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"],
                "media_ref": pdf["media_ref"],
                "media_kind": _kinds_of(pdf["media_ref"]),
                "n_bytes": np.fromiter(
                    (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
                ),
                "features": list(feats),
            })

    return media.select("doc_id", "span_idx", "media_ref").mapInPandas(
        run, schema=MEDIA_FEATURES_SCHEMA
    )


def media_stats(media_features: DataFrame) -> DataFrame:
    """Per-kind rollup of the extracted features."""
    return (
        media_features.groupBy("media_kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
            F.round(F.avg(F.expr("element_at(features, 1)")), 6).alias("avg_f0"),
        )
    )


RESIZED_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, media_kind string, "
    "width int, height int, resized_n_bytes long, features array<float>"
)


def fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decoded media dimensions."""
    from deepref_spark.refsem import md5_mod_py

    s = payload.decode("utf-8", errors="replace")
    return 64 + md5_mod_py(s + ":w", 1920), 64 + md5_mod_py(s + ":h", 1080)


def resize_media(media: DataFrame, target_w: int = 224, target_h: int = 224,
                 decoder=fake_decode) -> DataFrame:
    """Resize stage plumbing (decode -> scale -> re-encode): one Arrow
    crossing, per-row output (shape-preserving). The decode/scale kernel
    is the declared stub (PIL/opencv slot in via ``decoder`` and a real
    resize in place of the deterministic byte-count model); the schema,
    batching, and metadata flow are production-real."""

    decode_batch = _batch_of(decoder)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = len(pdf)
            refs = pdf["media_ref"]
            payloads = [r.encode("utf-8") for r in refs]
            # dims come from fake_dims itself (single source of truth
            # with the SQL oracle's formula), batched via fromiter
            dims = np.fromiter(
                (d for p in payloads for d in fake_dims(p)),
                dtype=np.int64, count=2 * B,
            ).reshape(B, 2)
            # deterministic byte model: area ratio scales the payload
            scale = (target_w * target_h) / (dims[:, 0] * dims[:, 1]).astype(np.float64)
            n_bytes = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=B
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"].astype(np.int32),
                "media_ref": refs,
                "media_kind": _kinds_of(refs),
                "width": np.full(B, target_w, dtype=np.int32),
                "height": np.full(B, target_h, dtype=np.int32),
                "resized_n_bytes": np.maximum(
                    1, (n_bytes * scale).astype(np.int64)
                ),
                "features": list(decode_batch(payloads)),
            })

    return media.select("doc_id", "span_idx", "media_ref").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, frame_idx int, "
    "frame_ts double, features array<float>"
)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  decoder=fake_decode) -> DataFrame:
    """Frame-sampling plumbing for video spans: ONE input row fans out
    to ``n_frames`` output rows (uniform timestamps over a deterministic
    fake duration), each with its own feature vector — the 1->N batch
    shape a real decord/ffmpeg sampler produces. Non-video spans pass
    through with a single frame."""

    decode_batch = _batch_of(decoder)

    def run(batches):
        from deepref_spark.refsem import md5_mod_py

        for pdf in batches:
            if not len(pdf):
                continue
            B = len(pdf)
            refs = pdf["media_ref"]
            k = np.where(_kinds_of(refs) == "video", n_frames, 1).astype(np.int64)
            dur = 1.0 + np.fromiter(
                (md5_mod_py(r + ":dur", 600) for r in refs),
                dtype=np.float64, count=B,
            )
            # 1 -> N fan-out as repeat + within-group arange
            total = int(k.sum())
            if not total:
                continue
            frame_idx = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(k) - k, k
            )
            frame_ts = np.round(
                np.repeat(dur, k) * frame_idx / np.repeat(np.maximum(k, 1), k), 6
            )
            payloads = [
                r.encode("utf-8") + b":%d" % i
                for r, kk in zip(refs, k) for i in range(kk)
            ]
            yield pd.DataFrame({
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), k),
                "span_idx": np.repeat(pdf["span_idx"].to_numpy(), k).astype(np.int32),
                "media_ref": np.repeat(refs.to_numpy(), k),
                "frame_idx": frame_idx.astype(np.int32),
                "frame_ts": frame_ts,
                "features": list(decode_batch(payloads)),
            })

    return media.select("doc_id", "span_idx", "media_ref").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def media_context(spans_df: DataFrame) -> DataFrame:
    """Caption-candidate pairing over interleaved documents: for every
    MEDIA span, the nearest preceding and following TEXT spans by
    offset — the alignment read a multimodal training pipeline serves
    (image+caption pairs from interleaved web documents, cf. the
    interleaved-corpus format of Flamingo/OBELICS-style datasets).
    Media spans flow through untouched (the north-rule invariant);
    only their textual neighborhood is attached.

    Input: (doc_id, spans array<struct<kind,text,media_ref,offset>>).
    One explode + two IGNORE NULLS window functions PER DOCUMENT
    (ordered by offset) — the window is bounded by the document's span
    count, never the corpus; the shuffle key is doc_id, the same
    distribution every per-doc stage uses.
    """
    from pyspark.sql import Window

    ex = spans_df.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id", F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    txt = F.when(F.col("kind") == "text", F.col("text"))
    w_prev = Window.partitionBy("doc_id").orderBy("offset") \
        .rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.partitionBy("doc_id").orderBy("offset") \
        .rowsBetween(1, Window.unboundedFollowing)
    ctx = ex.withColumn(
        "prev_text", F.last(txt, ignorenulls=True).over(w_prev)
    ).withColumn(
        "next_text", F.first(txt, ignorenulls=True).over(w_next)
    )
    return (
        ctx.where(F.col("kind") == "media")
        .select("doc_id", F.col("offset").cast("int").alias("offset"),
                "media_ref", "prev_text", "next_text")
    )


def phash16(features: F.Column) -> F.Column:
    """16-bit perceptual hash of a FEATURE_DIM feature vector: bit i is
    set iff feature i >= 0.5. Pure JVM expression (transform +
    aggregate) over the decoder's output — with the deterministic fake
    decoder every feature is an exactly-representable v/2^20 float32,
    so the >= 0.5 threshold is bit-identical to the SQL oracle's
    integer comparison (v >= 524288)."""
    bits = F.expr(
        "aggregate(transform(features, (f, i) -> "
        "IF(f >= CAST(0.5 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), "
        "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, v) -> a + v)"
    )
    return bits


def media_dedup_groups(media_features: DataFrame,
                       min_copies: int = 2) -> DataFrame:
    """Exact perceptual dedup of media assets: group occurrences by
    their 16-bit phash and report groups with >= min_copies members as
    (phash, n_copies, keep_doc_id, exemplar_ref) — keep the
    numerically-smallest doc, drop the rest (the media twin of
    dedup_exact's hash-groupBy keep rule).

    Scale shape: ONE map-side-combinable groupBy on a 16-bit key whose
    distinct support is bounded at 65,536 regardless of corpus size —
    no pairwise join anywhere, so a 100 TB media lane reduces to a
    bounded-cardinality rollup (near-dup banding, if needed, runs on
    the DISTINCT-phash table, which this bound keeps trivially small;
    see phash_near_pairs). The phash itself is computed inside the
    feature-extract projection — no extra pass over the decoded
    features."""
    return (
        media_features
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                "media_ref", phash16(F.col("features")).alias("phash"))
        .groupBy("phash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_copies"),
             F.min("doc_id").alias("keep_doc_id"),
             F.min("media_ref").alias("exemplar_ref"))
        .where(F.col("n_copies") >= min_copies)
    )


def phash_near_pairs(media_features: DataFrame,
                     max_hamming: int = 2) -> DataFrame:
    """Near-dup phash pairs (phash_a < phash_b, hamming <= max_hamming)
    with per-side occurrence counts — the banded NEAR variant next to
    media_dedup_groups' exact grouping. The pair join runs on the
    DISTINCT phash table (<= 65,536 rows by construction, independent
    of corpus size), banded on the four 4-bit sub-bands so a pair is
    only compared when at least one band agrees (hamming <= 3 pairs
    always share a band by pigeonhole; max_hamming <= 3 keeps the
    guarantee exact)."""
    if max_hamming > 3:
        raise ValueError("4-band/4-bit blocking is exact only for hamming <= 3")
    ph = (
        media_features
        .select(phash16(F.col("features")).alias("phash"))
        .groupBy("phash").agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .localCheckpoint(eager=False)  # bounded table, feeds both join sides
    )
    banded = ph.select(
        "phash", "n_occ",
        F.explode(F.array(*[
            F.concat(F.lit(f"{b}:"),
                     F.shiftright(F.col("phash"), 4 * b).bitwiseAND(F.lit(15))
                     .cast("string"))
            for b in range(4)
        ])).alias("band_key"),
    )
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"),
              (F.col("x.band_key") == F.col("y.band_key"))
              & (F.col("x.phash") < F.col("y.phash")))
        .select(F.col("x.phash").alias("phash_a"),
                F.col("y.phash").alias("phash_b"),
                F.col("x.n_occ").alias("n_occ_a"),
                F.col("y.n_occ").alias("n_occ_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b")))
    return (
        pairs.select("phash_a", "phash_b", "n_occ_a", "n_occ_b",
                     ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# magic-byte MIME table: the first bytes a container format pins.
# PNG \x89PNG, RIFF (WAV/AVI outer), ISO-BMFF 'ftyp' at byte offset 4.
_MAGIC_PNG = "89504E47"
_MAGIC_RIFF = "52494646"
_MAGIC_FTYP = "66747970"


def mime_audit(media: DataFrame) -> DataFrame:
    """Magic-byte MIME audit over a binary media column — the ingest
    gate every multimodal pipeline runs BEFORE the (expensive, often
    crash-prone) decoder: sniff the container format from the payload's
    first bytes (PNG / RIFF / ISO-BMFF 'ftyp'), compare against the
    kind the file EXTENSION declares, and roll up per
    (declared, sniffed) cell with byte-size stats — the off-diagonal
    cells are the mislabeled or corrupted payloads to quarantine
    instead of handing to the decode stub.

    ``media``: (media_ref string, content binary). Pure JVM: the sniff
    is hex(substring(content, ...)) CASE dispatch — no Python crossing,
    no decode; length(binary) is the exact byte size. One map-side
    combined groupBy on the tiny (declared, sniffed) key space.
    """
    sniffed = (
        F.when(F.expr("hex(substring(content, 1, 4))") == _MAGIC_PNG,
               "image")
        .when(F.expr("hex(substring(content, 1, 4))") == _MAGIC_RIFF,
              "audio")
        .when(F.expr("hex(substring(content, 5, 4))") == _MAGIC_FTYP,
              "video")
        .otherwise("unknown")
    )
    declared = (
        F.when(F.col("media_ref").rlike("\\.png$"), "image")
        .when(F.col("media_ref").rlike("\\.wav$"), "audio")
        .when(F.col("media_ref").rlike("\\.mp4$"), "video")
        .otherwise("unknown")
    )
    return (
        media.select(declared.alias("declared_kind"),
                     sniffed.alias("sniffed_kind"),
                     F.length("content").cast("long").alias("n_bytes"))
        .groupBy("declared_kind", "sniffed_kind")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("n_bytes").cast("long").alias("total_bytes"),
             F.min("n_bytes").cast("long").alias("min_bytes"),
             F.max("n_bytes").cast("long").alias("max_bytes"))
        .withColumn("is_mismatch",
                    (F.col("declared_kind") != F.col("sniffed_kind"))
                    .cast("int"))
    )
