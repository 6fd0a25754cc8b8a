"""Pure-numpy imaging kernels for the native OCR path.

The reference (rad10/OCR-to-CSV) delegates image work to OpenCV/Tesseract
subprocesses; here every kernel is vectorized numpy executed inside
pandas/Arrow UDF batches — no native deps, fully deterministic.
"""
