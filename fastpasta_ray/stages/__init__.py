from fastpasta_ray.stages.validate import CheckConfig, ValidateFiles  # noqa: F401
