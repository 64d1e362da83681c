"""Checkpoint manifests, lineage and per-partition metrics."""

from pdf_parser_ray.state.checkpoint import (  # noqa: F401
    completed_buckets,
    read_extraction,
    read_metrics,
    run_extraction,
)
