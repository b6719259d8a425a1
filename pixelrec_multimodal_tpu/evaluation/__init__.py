"""Evaluation layer: metric functions, retrieval/ranking evaluators,
novelty/diversity, advanced metrics."""
