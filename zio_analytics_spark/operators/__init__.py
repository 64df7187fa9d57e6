"""Operators beyond the thin DataFrame passthroughs.

- :mod:`accumulate` — reference ``MapAccumulate`` (stateful ordered scan).
- :mod:`asof` — [EXT] as-of / range joins.
- :mod:`topk` — [EXT] top-k and per-group top-k.
- :mod:`dedup` — [EXT] exact + near-duplicate detection (LLM pipelines).
- :mod:`similarity` — [EXT] embedding similarity search.
- :mod:`text` — [EXT] text analysis (tokens, quality, lang-id, fingerprints).
- :mod:`multimodal` — [EXT] opaque binary columns + decode plumbing.
"""
