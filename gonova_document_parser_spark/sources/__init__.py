from .pages import read_pages, read_raw_files, write_pages

__all__ = ["read_pages", "write_pages", "read_raw_files"]
