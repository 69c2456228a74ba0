"""Dataset registry: one module per dataset name, each exposing
``get(cfg) -> (train_batches, val_batches)`` (the reference's string-keyed
dynamic import scheme, datasets/__init__.py:14)."""
