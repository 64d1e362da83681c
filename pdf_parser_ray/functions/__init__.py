"""User-facing scalar/vector function library (SURVEY.md §2.7).

Pure scalar functions re-exported from doclogic plus their vectorized
Ray/Arrow counterparts. Everything here is safe inside ``map_batches``.
"""

from pdf_parser_ray.doclogic.headings import (  # noqa: F401
    allcaps_heading_confidence,
    detect_heading,
    mixedcap_heading_confidence,
    numbered_heading_confidence,
)
from pdf_parser_ray.doclogic.textproc import (  # noqa: F401
    clean_text,
    extract_field_with_regex,
    extract_numbers,
    find_content_start,
    split_into_lines,
)
from pdf_parser_ray.doclogic.toc import (  # noqa: F401
    clean_title,
    entry_level,
    generate_entry_tags,
    looks_like_genuine_toc_entry,
    looks_like_technical_data,
    match_primary,
    parent_id_of,
    parse_page_number,
    toc_confidence,
)
from pdf_parser_ray.functions.search import (  # noqa: F401
    search_term_in_line,
    term_search,
)
