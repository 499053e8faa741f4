from .hostops import (
    one_hot_to_dist,
    signed_distance_maps,
    boundary_weights,
    pad_to_size,
    standardize,
)
from .sample import assemble_sample, Sample, SAMPLE_KEYS
from .synthetic import SyntheticEyeDataset, render_eye
from .h5dataset import H5EyeDataset, write_h5_archive
from .pipeline import DataPipeline, collate, Subset, ListDataset, ConcatDataset
from .realframes import decode_eye_crops, decode_gray_frames, eyes_from_frames

__all__ = [
    "one_hot_to_dist",
    "signed_distance_maps",
    "boundary_weights",
    "pad_to_size",
    "standardize",
    "assemble_sample",
    "Sample",
    "SAMPLE_KEYS",
    "SyntheticEyeDataset",
    "render_eye",
    "H5EyeDataset",
    "write_h5_archive",
    "DataPipeline",
    "collate",
    "Subset",
    "ListDataset",
    "ConcatDataset",
    "decode_eye_crops",
    "decode_gray_frames",
    "eyes_from_frames",
]
