"""Large-scale training-data pipeline operators (beyond-reference).

Dedup families, similarity search, text analysis, and multimodal column
handling over the ``documents`` / ``embeddings`` tables — first-class
components designed for 100 TB-scale partitioning (BASELINE.json
north-star).
"""
