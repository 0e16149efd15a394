from .binaryfile import (
    MEDIA_SCHEMA,
    media_from_binary_files,
    read_binary_dir,
    read_whole_text_files,
)
from .files import load_csv, load_jsonl, load_orc
from .tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "MEDIA_SCHEMA",
    "TABLES",
    "load_csv",
    "load_jsonl",
    "load_orc",
    "load_table",
    "load_tables",
    "media_from_binary_files",
    "read_binary_dir",
    "read_whole_text_files",
    "register_views",
]
