"""Operator facade mirroring the reference's DataSet API semantics on
DataFrames (SURVEY.md §2.B-§2.E), plus multimodal column operators."""

from .dataset import Dataset, Grouping

__all__ = ["Dataset", "Grouping"]
