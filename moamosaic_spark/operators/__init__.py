"""Physical operators: the stitch kernel, stats finalize, and the
training-pipeline operator library (dedup, similarity, text, multimodal)."""
