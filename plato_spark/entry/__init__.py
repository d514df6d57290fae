"""Per-domain entry-registry modules (round-5 manifest-ization)."""
