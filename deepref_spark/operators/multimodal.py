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
    from deepref_spark.refsem import md5_mod_py

    s = payload.decode("utf-8", errors="replace")
    out = np.empty(FEATURE_DIM, dtype=np.float32)
    for i in range(FEATURE_DIM):
        out[i] = md5_mod_py(f"{s}:{i}", 1 << 20) / float(1 << 20)
    return out


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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [r.encode("utf-8") for r in pdf["media_ref"]]
            feats = [decoder(p).tolist() for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"],
                "media_ref": pdf["media_ref"],
                "media_kind": [media_kind_of(r) for r in pdf["media_ref"]],
                "n_bytes": [len(p) for p in payloads],
                "features": feats,
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

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {k: [] for k in ("doc_id", "span_idx", "media_ref", "media_kind",
                                    "width", "height", "resized_n_bytes", "features")}
            for r in pdf.itertuples(index=False):
                payload = r.media_ref.encode("utf-8")
                w, h = fake_dims(payload)
                # deterministic byte model: area ratio scales the payload
                scale = (target_w * target_h) / float(w * h)
                rows["doc_id"].append(r.doc_id)
                rows["span_idx"].append(int(r.span_idx))
                rows["media_ref"].append(r.media_ref)
                rows["media_kind"].append(media_kind_of(r.media_ref))
                rows["width"].append(target_w)
                rows["height"].append(target_h)
                rows["resized_n_bytes"].append(max(1, int(len(payload) * scale)))
                rows["features"].append(decoder(payload).tolist())
            yield pd.DataFrame(rows)

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

    def run(batches):
        from deepref_spark.refsem import md5_mod_py

        for pdf in batches:
            if not len(pdf):
                continue
            rows = {k: [] for k in ("doc_id", "span_idx", "media_ref",
                                    "frame_idx", "frame_ts", "features")}
            for r in pdf.itertuples(index=False):
                payload = r.media_ref.encode("utf-8")
                kind = media_kind_of(r.media_ref)
                k = n_frames if kind == "video" else 1
                duration = 1.0 + md5_mod_py(r.media_ref + ":dur", 600)
                for i in range(k):
                    rows["doc_id"].append(r.doc_id)
                    rows["span_idx"].append(int(r.span_idx))
                    rows["media_ref"].append(r.media_ref)
                    rows["frame_idx"].append(i)
                    rows["frame_ts"].append(round(duration * i / max(k, 1), 6))
                    rows["features"].append(decoder(payload + b":%d" % i).tolist())
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return media.select("doc_id", "span_idx", "media_ref").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )
