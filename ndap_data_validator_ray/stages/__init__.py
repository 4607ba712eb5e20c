"""Ray Data stages: batch validators, actor-pool audio decoders, dedup,
similarity and multimodal transforms. Each stage is a function or callable
class intended for ``Dataset.map_batches`` with ``batch_format="pyarrow"``."""
