"""Utilities: splat file IO, depth/normal helpers, profiling."""

from tdgs.utils.ply import load_ply, save_ply, export_splats

__all__ = ["load_ply", "save_ply", "export_splats"]
