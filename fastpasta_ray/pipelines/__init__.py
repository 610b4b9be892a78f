from fastpasta_ray.pipelines.check import CheckResult, run_check  # noqa: F401
