from .runner import FixpointRunner, IterationMetrics  # noqa: F401
