"""CDC core: LWW dedupe, schema evolution, skew handling, batch apply, lineage."""
