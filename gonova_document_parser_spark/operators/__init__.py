from .extract import EXTRACTED_SCHEMA, extract_pages

__all__ = ["extract_pages", "EXTRACTED_SCHEMA"]
