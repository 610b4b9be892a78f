from fastpasta_ray.state.checkpoint import CheckpointStore  # noqa: F401
