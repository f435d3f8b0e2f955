"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads ride Parquet as ``binary`` columns with a
``media_type`` tag.  Decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages (model/codec loaded once per actor in
``__init__``).  The codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode step is stubbed: ``DecodeMedia`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
CRC-derived pseudo-decode stands in so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested.

Scale notes: payloads are MB-scale ⇒ small ``batch_size`` (default 16) so
batch × concurrency fits worker heaps; outputs drop the payload column
immediately (project-away, like the html column in the index build).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from searchengine_ray.functions import hashing

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta", pa.string()),         # JSON sidecar (dims, codec, ...)
    ]
)

FEATURE_DIM = 16


class DecodeMedia:
    """Actor-pool stage: payload → fixed-dim feature vector.

    ``__init__`` is where a real build loads the codec + model once per
    actor; here it precomputes the projection table for the fake decode.
    """

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake
        # stand-in for model weights: deterministic projection seeds,
        # masked to 63 bits so the SQL replay's h*s stays inside HUGEINT
        self._seeds = np.array(
            [
                hashing.crc64(f"media-feat-{i}".encode()) & 0x7FFFFFFFFFFFFFFF
                for i in range(FEATURE_DIM)
            ],
            dtype=np.uint64,
        )

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        raise NotImplementedError(
            "real decode needs PIL/ffmpeg which are not in this container; "
            "construct DecodeMedia(fake=True) for the deterministic stub"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        """Deterministic pseudo-features: md5-64 of the payload mixed with
        the per-dimension seeds, scaled to [0, 1).

        The md5 family (not CRC) is deliberate: DuckDB computes the same
        64-bit payload hash, the seed mix is mod-2^64 integer arithmetic,
        and the final value is an exact power-of-two division — so the
        whole feature vector is bit-exactly SQL-replayable
        (``oracle_sql()["media_features"]``)."""
        import hashlib

        h = np.uint64(
            int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
        )
        with np.errstate(over="ignore"):
            mixed = (h * self._seeds + np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(11)
        return (mixed % np.uint64(1 << 32)).astype(np.float64) / float(1 << 32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, nbytes = [], []
        for payload, mtype in zip(
            batch["payload"].to_pylist(), batch["media_type"].to_pylist()
        ):
            vec = (
                self._decode_fake(payload)
                if self.fake
                else self._decode_real(payload, mtype)
            )
            feats.append(vec.tolist())
            nbytes.append(len(payload or b""))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array(nbytes, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def media_features(ds, concurrency=(1, 8), batch_size: int = 16):
    """Decode+featurize pipeline over a MEDIA_SCHEMA dataset (fake decode)."""
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_from_documents(sf_dir: str):
    """Adapt documents into a media table (payload = utf-8 text bytes) so
    the multimodal plumbing runs on driver testdata."""
    import ray.data

    def to_media(batch: pa.Table) -> pa.Table:
        payloads = [(t or "").encode("utf-8") for t in batch["text"].to_pylist()]
        kinds = ["image", "audio", "video"]
        return pa.Table.from_pydict(
            {
                "media_id": batch["doc_id"],
                "media_type": pa.array(
                    [kinds[i % 3] for i in batch["doc_id"].to_pylist()], pa.string()
                ),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(["{}"] * batch.num_rows, pa.string()),
            },
            schema=MEDIA_SCHEMA,
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(to_media, batch_format="pyarrow")
