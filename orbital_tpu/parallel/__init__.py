"""Multi-chip and ensemble parallelism: device meshes, shard_map ring
forces over ICI, and vmapped Monte-Carlo ensembles."""
