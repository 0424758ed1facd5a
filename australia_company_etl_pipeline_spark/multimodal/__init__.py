"""Multimodal column support (training-data pipeline extension).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages. The actual codec calls are stubbed
(no image/audio libraries in this environment) behind
``NotImplementedError`` with a deterministic fake featurizer, but the
Spark-side plumbing — schema, partition sizing, UDF signature, batch
shape — is real and oracle/test-covered.
"""

from .media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_features,
    frame_offsets,
    media_dup_pairs,
    pack_documents_as_media,
    perceptual_hash,
    resize_plan,
)
