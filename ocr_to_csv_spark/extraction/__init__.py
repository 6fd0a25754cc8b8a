"""Extraction layer: HTML/table harvesting, OCR lattices, dictionary
matchers, and the end-to-end Spark pipeline."""
