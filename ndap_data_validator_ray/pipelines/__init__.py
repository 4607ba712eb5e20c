"""End-to-end pipelines: flagship clip validation, reference-parity role
validation, profiling, dedup, text analysis, similarity search, and the
TPC-H-style query set used by the correctness oracle."""
