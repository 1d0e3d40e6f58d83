"""Device-mesh parallelism: source sharding (phase 1), domain decomposition."""
