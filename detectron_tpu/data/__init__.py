"""Data pipelines: dataset adapters, preprocessing, batching."""
