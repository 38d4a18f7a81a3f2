"""Multimodal asset plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The real decoders (PIL / torchaudio / pyav) are NOT in this container, so
the decode step is stubbed: if the library import fails, a clearly-marked
deterministic fake derives pseudo-metadata from the bytes (so the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested end-to-end, and swapping in the actual decoder is a one-function
change).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_FIELDS = (
    "asset_id long, kind string, width int, height int, "
    "n_frames int, duration_ms long, content_sha string"
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the real decoder (STUB — see module
    docstring). Pseudo-dimensions derive from the content hash so tests are
    stable and collisions meaningful."""
    h = hashlib.sha256(payload or b"").digest()
    w = 64 + h[0] % 192
    return {
        "width": w,
        "height": 64 + h[1] % 192,
        "n_frames": 1 if kind == "image" else 1 + h[2] % 120,
        "duration_ms": 0 if kind == "image" else (1 + h[3]) * 250,
        "content_sha": hashlib.sha256(payload or b"").hexdigest(),
    }


def decode_assets(df: DataFrame) -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one metadata batch out.
    Payload bytes never round-trip through the driver."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_decode(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return df.mapInPandas(op, schema=DECODED_FIELDS)


def resize_and_featurize(
    df: DataFrame, max_side: int = 128, feat_dim: int = 8
) -> DataFrame:
    """Resize planning + feature extraction in one Arrow pass (the brief's
    remaining two multimodal ops). Target dims preserve aspect ratio with
    pure integer arithmetic — ``t = side * max_side // max(w, h)`` — so
    the contract is engine-exact; the feature vector is the STUBBED
    extractor's output (first ``feat_dim`` bytes of the content sha as
    ints — a real model swaps in at the marked line, same schema:
    ``array<bigint>`` is exactly how the embeddings table stores real
    vectors).

    One mapInPandas over the asset batch: the payload is read once for
    decode + features and never leaves the executor."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                m = _fake_decode(payload, kind)
                w, h = m["width"], m["height"]
                s = max(w, h)
                digest = hashlib.sha256(payload or b"").digest()
                rows.append(
                    {
                        "asset_id": aid,
                        "width": w,
                        "height": h,
                        "target_w": w * max_side // s,
                        "target_h": h * max_side // s,
                        # STUB feature extractor — replace with the real
                        # model forward pass; schema stays array<bigint>
                        "feat": [int(b) for b in digest[:feat_dim]],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height",
                    "target_w", "target_h", "feat",
                ],
            )

    return df.mapInPandas(
        op,
        schema=(
            "asset_id long, width int, height int, "
            "target_w int, target_h int, feat array<bigint>"
        ),
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plan for video assets: one output row per sampled
    frame index (the decode of the actual frame bytes is the stubbed step).
    Demonstrates the explode-shaped mapInPandas contract at scale: output
    row count differs from input row count."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                n = _fake_decode(payload, kind)["n_frames"]
                rows.extend(
                    {"asset_id": aid, "frame_idx": i}
                    for i in range(0, n, every_n)
                )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx"])

    return df.mapInPandas(op, schema="asset_id long, frame_idx int")
