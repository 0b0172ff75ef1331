"""Pure-Python per-document core: parsing, rule sieves, features, inference.
Everything here runs partition-locally inside vectorized Spark UDFs."""
