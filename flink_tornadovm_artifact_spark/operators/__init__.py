"""Operator facade mirroring the reference's DataSet API semantics on
DataFrames (SURVEY.md §2.B-§2.E), plus multimodal column operators."""

from .dataset import Dataset, Grouping
from .multimodal import (
    audio_features,
    decode_image_features,
    modality,
    resize_images,
    sample_video_frames,
    with_metadata,
)

__all__ = [
    "Dataset",
    "Grouping",
    "audio_features",
    "decode_image_features",
    "modality",
    "resize_images",
    "sample_video_frames",
    "with_metadata",
]
