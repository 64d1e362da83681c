"""Pure per-document semantics of the reference extractor.

Everything in this package is plain Python over plain data (no Ray): these
functions are the single source of truth for per-document behavior, called
both by the Ray Data stages (inside ``map_batches`` / ``map_groups``) and by
the single-process oracle in tests. Module-level compiled regex banks mean
each Ray worker process pays compilation exactly once (the reference instead
keeps a per-instance FIFO cache, utils/text_utils.py:10-12).
"""

from pdf_parser_ray.doclogic.pipeline import run_document  # noqa: F401
