"""Data layer: COLMAP parsing, world normalization, camera trajectories."""

from tdgs.datasets.colmap import Parser, Dataset
from tdgs.datasets.normalize import (
    similarity_from_cameras,
    align_principal_axes,
    transform_cameras,
    transform_points,
)

__all__ = [
    "Parser",
    "Dataset",
    "similarity_from_cameras",
    "align_principal_axes",
    "transform_cameras",
    "transform_points",
]
