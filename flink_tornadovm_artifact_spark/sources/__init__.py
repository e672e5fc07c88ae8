"""Source/sink surface (SURVEY.md §2.A)."""

from .custom import (
    SequenceDataSource,
    read_sequence,
    register_sequence_source,
)
from .jdbc import DERBY_DRIVER, derby_url, jdbc_read, jdbc_write
from .io import (
    from_collection,
    from_elements,
    generate_sequence,
    read_csv_file,
    read_file_of_primitives,
    read_text_file,
    write_as_csv,
    write_as_formatted_text,
    write_as_text,
)

__all__ = [
    "read_text_file",
    "read_csv_file",
    "read_file_of_primitives",
    "from_collection",
    "from_elements",
    "generate_sequence",
    "write_as_text",
    "write_as_formatted_text",
    "write_as_csv",
    "SequenceDataSource",
    "register_sequence_source",
    "read_sequence",
    "DERBY_DRIVER",
    "derby_url",
    "jdbc_read",
    "jdbc_write",
]
