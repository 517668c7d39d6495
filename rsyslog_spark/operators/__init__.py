"""Operators: lookup-table enrichment, message-modification stages,
stateful/windowed aggregations, dedup, similarity, text analysis."""
