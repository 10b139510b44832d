"""Scale extensions (north star, BASELINE.json): dedup, similarity search,
text analysis, multimodal column plumbing. Importing registers their queries."""

from . import curation, dedup, graph, multimodal, sampling, similarity, sketches, textanalysis  # noqa: F401
