"""Distributed layer: mesh construction, all-to-all exchange, skew handling,
multi-chip sort/shuffle via shard_map over ICI/DCN collectives."""
