from legalchatbot_vectordb_exp_spark.multimodal.binary import (
    binary_metadata,
    decode_image_stub,
    frame_sample_stub,
    resize_image_stub,
    sniff_mime,
)

__all__ = [
    "binary_metadata",
    "decode_image_stub",
    "frame_sample_stub",
    "resize_image_stub",
    "sniff_mime",
]
