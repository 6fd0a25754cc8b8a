"""ocr_to_csv_spark — a from-scratch PySpark-native document-to-CSV extraction engine.

Re-expresses the capabilities of the reference desktop tool rad10/OCR-to-CSV
(see /root/reference, SURVEY.md) as an idiomatic Spark pipeline over tables of
interleaved text+media documents:

- ``imaging``    pure-numpy image ops (binarize / morphology / connected
                 components / table-grid recovery) — the native OCR path.
- ``extraction`` HTML boilerplate strip + table harvest, OCR lattices,
                 dictionary matchers, and the end-to-end DataFrame pipeline.
- ``relational`` the relational operator catalog exercised against TPC-H-ish
                 testdata (driver correctness contract).
- ``ops``        large-scale training-data pipeline operators (dedup,
                 similarity search, text analysis, multimodal plumbing).
- ``state``      resumable run_state checkpointing with per-partition lineage.
- ``datagen``    deterministic synthetic corpus generator (FIXTURES.md).

Everything DataFrame-first: vectorized pandas/Arrow UDFs only, never
per-row Python UDFs; no RDDs in the hot path.
"""

__version__ = "0.1.0"
