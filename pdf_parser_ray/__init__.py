"""pdf_parser_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild of the capabilities of the reference repo
``kavinsagar532/PDF_PARSER`` (read-only at /root/reference), re-expressed
Ray-Data-first: the corpus is a table of interleaved text+media documents
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
processed as a streaming ``ray.data.Dataset`` pipeline —

    read (lance|parquet) -> flat_map(doc -> page chunks)
      -> map_batches(ChunkRenderer actor pool)      # per-page parse, warm regex banks
      -> groupby(doc_id).map_groups(DocAssembler)   # THE shuffle: ordered reassembly
      -> write partitioned parquet (per-bucket checkpoints + lineage/metrics)

Per-document semantics (page render, metadata regexes, 3-pass TOC parse,
heading strategies, section assembly) live in :mod:`pdf_parser_ray.doclogic`
as pure functions shared by the Ray stages and the single-process oracle used
in tests, so distributed output is span-sequence-equal to the reference
semantics by construction and verified by pytest golden fixtures.
"""

__version__ = "0.1.0"
