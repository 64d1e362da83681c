"""Corpus sources/sinks (Lance-first with parquet fallback)."""

from pdf_parser_ray.sources.corpus import (  # noqa: F401
    corpus_from_documents,
    read_corpus,
    write_corpus,
)
