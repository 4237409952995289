"""Ingestion dataflow: the batch re-expression of the reference's
curator loop (movie_generator.py) — parse → clean → validate → dedup →
derive → embed → merge."""
