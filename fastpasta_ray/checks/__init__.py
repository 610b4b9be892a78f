from fastpasta_ray.checks.row_checks import run_row_checks  # noqa: F401
from fastpasta_ray.checks.running_checks import RunningState  # noqa: F401
