"""Operator library: ingest dataflow (tier A), relational surface (tier B),
and scale analytics — dedup / similarity / text / multimodal (tier C)."""
