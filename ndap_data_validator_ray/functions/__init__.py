"""Vectorized, stateless kernels: audio codecs, coercion, time formats,
sketches, text analysis, hashing. Pure numpy / pyarrow.compute / pandas —
no Ray imports here so every kernel is unit-testable without a cluster."""
