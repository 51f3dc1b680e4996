"""Ray Data stages: stateless map_batches transforms and stateful actor-pool classes."""
