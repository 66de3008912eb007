"""Data layer: BOP test sets, template banks, training shards, synthetic fixtures."""
