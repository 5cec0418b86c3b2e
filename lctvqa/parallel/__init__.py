"""Device-mesh parallelism: DP sharding over ICI."""
