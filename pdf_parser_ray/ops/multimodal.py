"""Multimodal column plumbing: opaque binary/media columns with typed
metadata, decoded by an actor-pool stage.

The sandbox has no image/audio codecs, so the decode kernel is STUBBED: by
default :class:`MediaDecoder` raises ``NotImplementedError`` at first use;
with ``fake=True`` it produces deterministic fake features (seeded on the
media_ref) so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested. Swapping in PIL/ffmpeg is a one-method
change inside the actor.

Memory shape: media payloads are large binary cells, so the stage runs with
a small ``batch_size`` and Arrow batches end-to-end (binary columns do not
survive pandas round-trips intact — see ray_guide.md pitfalls).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
    ]
)

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("feature", pa.list_(pa.float32())),
        ("decode_ok", pa.bool_()),
    ]
)


class MediaDecoder:
    """Actor-pool decode/feature-extract stage over MEDIA_SCHEMA batches.

    ``__init__`` is where a real deployment loads codecs/models once per
    actor; here it just checks availability.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim
        try:
            import PIL.Image  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def _decode(self, media_ref: str, payload: bytes) -> dict:
        if self.fake:
            # deterministic fake: dimensions + feature vector from the ref hash
            digest = hashlib.md5((media_ref or "").encode()).digest()
            width = 64 + digest[0]
            height = 64 + digest[1]
            rng = np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32)
            feature = np.resize(rng / 255.0, self.feature_dim)
            return {
                "width": width,
                "height": height,
                "feature": feature.tolist(),
                "decode_ok": True,
            }
        if not self.has_pil:
            raise NotImplementedError(
                "media decode requires an image codec (PIL) which is not "
                "available in this environment; construct MediaDecoder with "
                "fake=True for the deterministic stub"
            )
        raise NotImplementedError("real decode path not implemented in sandbox")

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            payload = row.get("payload") or b""
            decoded = self._decode(row.get("media_ref", ""), payload)
            rows.append(
                {
                    "doc_id": row.get("doc_id", ""),
                    "media_ref": row.get("media_ref", ""),
                    "media_type": row.get("media_type", "image"),
                    "width": decoded["width"],
                    "height": decoded["height"],
                    "n_bytes": len(payload),
                    "feature": decoded["feature"],
                    "decode_ok": decoded["decode_ok"],
                }
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_FEATURES_SCHEMA)


def media_features(
    media_ds: ray.data.Dataset,
    fake: bool = True,
    feature_dim: int = 8,
    batch_size: int = 16,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """Decode/feature stage: small batches (large binary payloads), Arrow
    batches end-to-end, actor pool for warm codec state."""
    return media_ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake, "feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_inventory(doc_results: ray.data.Dataset) -> ray.data.Dataset:
    """Media table from flagship extraction output: one row per image span
    with an empty payload (refs only in this corpus)."""

    def explode(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            for span in spans or []:
                if span["kind"] == "image":
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_ref": span["media_ref"],
                            "media_type": "image",
                            "payload": b"",
                        }
                    )
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return doc_results.map_batches(explode, batch_format="pyarrow")


class ImageResizer:
    """Actor-pool resize stage (STUB kernel): real deployments decode +
    resample in `_resize`; the stub deterministically computes the target
    geometry (aspect-preserving fit into ``max_side``) from the fake
    decoder's dimensions so the schema/batching plumbing is exercised."""

    def __init__(self, max_side: int = 256, fake: bool = True):
        self.max_side = max_side
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real resize needs an image codec")
        rows = []
        for row in batch.to_pylist():
            w, h = int(row["width"]), int(row["height"])
            scale = min(1.0, self.max_side / max(w, h, 1))
            rows.append(
                {
                    **{k: row[k] for k in ("doc_id", "media_ref", "media_type")},
                    "width": max(1, round(w * scale)),
                    "height": max(1, round(h * scale)),
                    "n_bytes": row["n_bytes"],
                    "feature": row["feature"],
                    "decode_ok": row["decode_ok"],
                }
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_FEATURES_SCHEMA)


def resize_media(
    features_ds: ray.data.Dataset,
    max_side: int = 256,
    batch_size: int = 16,
    fake: bool = True,
) -> ray.data.Dataset:
    return features_ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_side": max_side, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


def sample_frames(
    media_ds: ray.data.Dataset, every_n: int = 10, max_frames: int = 8
) -> ray.data.Dataset:
    """Frame-sampling plumbing for video refs (STUB): emits deterministic
    frame refs ``<media_ref>#f<i>`` for i in 0, n, 2n, ... — the real kernel
    would demux the container; the fan-out shape (one media row -> K frame
    rows, small batches) is what matters for the pipeline."""

    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("media_ref", pa.string()),
            ("frame_index", pa.int32()),
            ("frame_ref", pa.string()),
        ]
    )

    def fan_out(batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            if row.get("media_type") != "video":
                continue
            for k in range(max_frames):
                idx = k * every_n
                rows.append(
                    {
                        "doc_id": row["doc_id"],
                        "media_ref": row["media_ref"],
                        "frame_index": idx,
                        "frame_ref": f"{row['media_ref']}#f{idx}",
                    }
                )
        return pa.Table.from_pylist(rows, schema=schema)

    return media_ds.map_batches(fan_out, batch_format="pyarrow", batch_size=16)
