"""Hash-generation models: the single-video builder and the batched
device pipeline."""
