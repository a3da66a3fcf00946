"""Device-mesh parallelism for the pair axis."""
