"""Batch operators — callable classes / functions for ``Dataset.map_batches``."""
