"""Shared utilities: testing helpers, naming, small numerics."""

from ..dataframe import DataFrame, Series, assert_frame_equal  # noqa: F401
from ..entity import to_snake_case  # noqa: F401
