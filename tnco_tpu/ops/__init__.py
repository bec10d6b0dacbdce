"""Device-side primitive ops (bitset lanes, log2-domain costs)."""
