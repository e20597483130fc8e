"""Operator layer: each module builds DataFrame plans for one family of
SURVEY §2's inventory (relational core, dedup, similarity, text
analysis, document pipeline, multimodal)."""
